"""Benchmark n-gram decontamination (``dedup.ref_shingle_overlap``):
both membership routes (broadcast vs bucketed co-group) against a
brute-force shingle-overlap reference and each other.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.functions import textfn
from opengauss_tools_datachecker_performance_ray.stages.dedup import (
    ref_shingle_overlap,
)

BENCH = pd.DataFrame({
    "doc_id": np.array([1000, 1001], np.int64),
    "text": ["the quick brown fox jumps over the lazy dog tonight",
             "pack my box with five dozen liquor jugs now"],
})
CORPUS = pd.DataFrame({
    "doc_id": np.array([0, 1, 2, 3], np.int64),
    "text": [
        # contains a benchmark 5-gram ("quick brown fox jumps over")
        "she said the quick brown fox jumps over everything it sees",
        # contains one from the second benchmark doc
        "please pack my box with five dozen eggs instead",
        # no overlap
        "completely unrelated words about parquet shuffles and actors",
        # short doc (< 5 tokens -> single whole-text shingle, no match)
        "tiny doc here",
    ],
})


def _brute(corpus: pd.DataFrame, bench: pd.DataFrame, k: int = 5):
    def shingles(t):
        di, sh = textfn.shingle_hashes(pd.Series([t]), k=k)
        return set(sh.tolist())

    ref = set()
    for t in bench["text"]:
        ref |= shingles(t)
    rows = []
    for _, r in corpus.iterrows():
        sh = shingles(r["text"])
        hit = len(sh & ref)
        if hit:
            rows.append((r["doc_id"], len(sh), hit))
    return pd.DataFrame(rows, columns=["doc_id", "n_shingles",
                                       "n_ref_shingles"]).astype(np.int64)


@pytest.mark.parametrize("broadcast_max", [10**6, 0])
def test_ref_shingle_overlap_both_routes(ray_session, broadcast_max):
    got = ref_shingle_overlap(
        rd.from_pandas(CORPUS).repartition(3), rd.from_pandas(BENCH),
        "doc_id", "text", k=5, broadcast_max=broadcast_max) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True) \
        .astype(np.int64)
    want = _brute(CORPUS, BENCH)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["doc_id"]) == {0, 1}


def test_ref_shingle_overlap_empty_reference(ray_session):
    empty = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype=np.int64),
         "text": pd.Series(dtype=object)}))
    got = ref_shingle_overlap(rd.from_pandas(CORPUS), empty,
                              "doc_id", "text", k=5).to_pandas()
    assert len(got) == 0
