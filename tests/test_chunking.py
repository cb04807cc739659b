"""Sliding-window token chunking (stages/chunking.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.stages.chunking import (
    window_chunks)


def _chunks(texts, window, stride=None):
    t = pa.table({"id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return window_chunks(rd.from_arrow(t), "id", "text",
                         window, stride).to_pandas() \
        .sort_values(["id", "win_no"]).reset_index(drop=True)


def test_exact_decomposition_with_overlap(ray_session):
    toks = [f"t{i}" for i in range(10)]
    out = _chunks([" ".join(toks)], window=4, stride=3)
    # n=10, w=4, s=3 -> c = (10-4+2)//3 + 1 = 3 windows
    assert out["win_no"].tolist() == [0, 1, 2]
    assert out["n_tok"].tolist() == [4, 4, 4]
    assert out["win_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]


def test_short_tail_window(ray_session):
    toks = [f"t{i}" for i in range(11)]
    out = _chunks([" ".join(toks)], window=4, stride=3)
    # c = (11-4+2)//3 + 1 = 4; final window holds the 2-token tail
    assert out["n_tok"].tolist() == [4, 4, 4, 2]
    assert out["win_text"].iloc[-1] == "t9 t10"


def test_short_doc_single_window(ray_session):
    out = _chunks(["a b"], window=5, stride=2)
    assert len(out) == 1
    assert out["n_tok"].iloc[0] == 2 and out["win_text"].iloc[0] == "a b"


def test_null_and_empty_no_windows(ray_session):
    out = _chunks(["a b c", None, ""], window=2)
    assert set(out["id"]) == {0}


def test_default_stride_non_overlapping(ray_session):
    toks = [f"t{i}" for i in range(7)]
    out = _chunks([" ".join(toks)], window=3)
    assert out["win_text"].tolist() == ["t0 t1 t2", "t3 t4 t5", "t6"]
    # every token appears exactly once when stride == window
    seen = " ".join(out["win_text"]).split(" ")
    assert seen == toks


def test_coverage_property(ray_session):
    """Every token index of every doc is covered by >= 1 window."""
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{j}" for j in range(n))
             for n in rng.integers(1, 60, size=20)]
    out = _chunks(texts, window=8, stride=5)
    for i, txt in enumerate(texts):
        n = len(txt.split(" "))
        covered = set()
        sub = out[out["id"] == i]
        for _, r in sub.iterrows():
            covered |= set(range(r["win_no"] * 5,
                                 r["win_no"] * 5 + r["n_tok"]))
        assert covered == set(range(n))


def test_bad_params(ray_session):
    ds = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64()),
                                 "text": ["a"]}))
    with pytest.raises(ValueError):
        window_chunks(ds, "id", "text", 0)
    with pytest.raises(ValueError):
        window_chunks(ds, "id", "text", 4, 0)


def test_carry_cols_replicated(ray_session):
    t = pa.table({"id": pa.array([7, 8], pa.int64()),
                  "src": ["a", "b"],
                  "text": ["x y z w v", "p q"]})
    out = window_chunks(rd.from_arrow(t), "id", "text", 2,
                        carry_cols=["src"]).to_pandas()
    assert set(zip(out["id"], out["src"])) == {(7, "a"), (8, "b")}
    assert (out[out["id"] == 7]["src"] == "a").all()


def test_stride_beyond_window_rejected(ray_session):
    ds = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64()),
                                 "text": ["a b c"]}))
    with pytest.raises(ValueError, match="stride must be <= window"):
        window_chunks(ds, "id", "text", 2, 5)
