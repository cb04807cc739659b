"""Per-group cap (hot-domain limit) and sequence packing (distributed
prefix sum): determinism across partitionings, exactness vs brute
force, and edge cases (groups under the cap, zero-weight rows, sparse
non-contiguous ids across range buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.stages import (packing,
                                                                sampling)


def _brute_cap(df, group_col, key_col, k):
    u = sampling.knuth_u32(df[key_col].to_numpy()).astype(np.int64)
    return df.assign(_u=u).sort_values(["_u", key_col]) \
        .groupby(group_col, sort=False).head(k).drop(columns=["_u"])


def test_cap_per_group_exact_and_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "key": np.arange(400, dtype=np.int64) * 13 + 5,
        "grp": rng.choice(list("abcde"), 400),
        "payload": rng.integers(0, 1000, 400),
    })
    want = _brute_cap(df, "grp", "key", 20)
    for parts in (1, 3, 17):
        got = sampling.cap_per_group(
            rd.from_pandas(df).repartition(parts), "grp", "key", 20) \
            .to_pandas()
        assert len(got) == len(want)
        a = got.sort_values("key").reset_index(drop=True)
        b = want.sort_values("key").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns])


def test_cap_per_group_under_cap_keeps_all(ray_session):
    df = pd.DataFrame({"key": np.arange(6, dtype=np.int64),
                       "grp": ["x"] * 3 + ["y"] * 3})
    got = sampling.cap_per_group(rd.from_pandas(df), "grp", "key", 10) \
        .to_pandas()
    assert sorted(got["key"]) == list(range(6))


def test_cap_per_group_null_and_integer_groups(ray_session):
    # integer-typed groups exercise the dictionary-encode path; NaN
    # rows must form their own capped group (index -1), not vanish
    rng = np.random.default_rng(5)
    grp = rng.integers(0, 4, 60).astype("float64")
    grp[::7] = np.nan
    df = pd.DataFrame({"key": np.arange(60, dtype=np.int64) * 7 + 1,
                       "grp": grp})
    u = sampling.knuth_u32(df["key"].to_numpy()).astype(np.int64)
    want = df.assign(_u=u).sort_values(["_u", "key"]) \
        .groupby("grp", sort=False, dropna=False).head(5) \
        .drop(columns=["_u"])
    for parts in (1, 4):
        got = sampling.cap_per_group(
            rd.from_pandas(df).repartition(parts), "grp", "key", 5) \
            .to_pandas()
        a = got.sort_values("key").reset_index(drop=True)
        b = want.sort_values("key").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns])


def test_pack_chunks_matches_brute_force(ray_session):
    rng = np.random.default_rng(11)
    # sparse, shuffled, non-contiguous ids spanning many range buckets
    ids = np.sort(rng.choice(100_000, 700, replace=False)).astype(np.int64)
    w = rng.integers(0, 300, 700).astype(np.int64)
    w[::50] = 0  # zero-weight rows pin to the boundary chunk
    df = pd.DataFrame({"doc_id": ids, "n_tokens": w})
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    got = packing.pack_chunks(
        rd.from_pandas(shuffled).repartition(9), "doc_id", "n_tokens",
        chunk_size=256, bucket_width=128).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    off = np.concatenate([[0], np.cumsum(w)[:-1]])
    first = off // 256
    last = np.where(w > 0, (off + w - 1) // 256, first)
    assert (got["offset"].to_numpy() == off).all()
    assert (got["chunk_first"].to_numpy() == first).all()
    assert (got["chunk_last"].to_numpy() == last).all()
    # chunk spans tile the stream: total tokens == stream length
    assert off[-1] + w[-1] == w.sum()


def test_pack_chunks_single_bucket_and_empty(ray_session):
    df = pd.DataFrame({"doc_id": np.array([5, 6], np.int64),
                       "n_tokens": np.array([10, 10], np.int64)})
    got = packing.pack_chunks(rd.from_pandas(df), "doc_id", "n_tokens",
                              chunk_size=8).to_pandas() \
        .sort_values("doc_id")
    assert got["offset"].tolist() == [0, 10]
    assert got["chunk_first"].tolist() == [0, 1]
    assert got["chunk_last"].tolist() == [1, 2]
