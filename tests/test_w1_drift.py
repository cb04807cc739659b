"""Exact grouped Wasserstein-1 drift (`checks.w1_exact_by_group`):
known values, an independent naive reference, hypothesis fuzz, and the
loud guards (float rejection, int64 envelope)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.pipelines import checks


def _naive_w1_num(a: list[int], b: list[int]) -> int:
    """Independent O(V) reference: sum |ca*n_b - cb*n_a| * gap over
    the merged sorted distinct-value axis, pure-python ints."""
    axis = sorted(set(a) | set(b))
    n_a, n_b = len(a), len(b)
    total = 0
    for lo, hi in zip(axis, axis[1:]):
        ca = sum(1 for x in a if x <= lo)
        cb = sum(1 for x in b if x <= lo)
        total += abs(ca * n_b - cb * n_a) * (hi - lo)
    return total


def _run(df: pd.DataFrame) -> pd.DataFrame:
    return checks.w1_exact_by_group(rd.from_pandas(df), "g", "v")


class TestW1ExactByGroup:
    def test_identical_distributions_zero(self, ray_session):
        df = pd.DataFrame({"g": ["a"] * 3 + ["b"] * 3,
                           "v": [1, 2, 3, 1, 2, 3]})
        out = _run(df)
        assert out["w1_num"].tolist() == [0, 0]

    def test_known_shift(self, ray_session):
        # a = {0, 0}, b = {10, 10}: ECDFs differ by n_a*n_b over the
        # whole [0, 10) gap -> w1_num = 2*2*10 = 40, W1 = 10
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [0, 0, 10, 10]})
        out = _run(df).set_index("g")
        assert int(out.loc["a", "w1_num"]) == 40
        assert int(out.loc["b", "w1_num"]) == 40
        assert out.loc["a", "w1_num"] / (
            out.loc["a", "n_a"] * out.loc["a", "n_b"]) == 10.0

    def test_matches_naive_reference(self, ray_session):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 50, 40).tolist()
        b = rng.integers(10, 90, 60).tolist()
        df = pd.DataFrame({"g": ["a"] * len(a) + ["b"] * len(b),
                           "v": a + b})
        out = _run(df).set_index("g")
        assert int(out.loc["a", "w1_num"]) == _naive_w1_num(a, b)
        # symmetric: each group vs the rest is the same two-sample pair
        assert int(out.loc["b", "w1_num"]) == _naive_w1_num(b, a)

    def test_null_values_and_groups_excluded(self, ray_session):
        df = pd.DataFrame({
            "g": ["a", "a", None, "b", "b"],
            "v": pd.array([0, None, 5, 10, 10], dtype="Int64")})
        out = _run(df).set_index("g")
        # effective samples: a={0}, b={10,10}
        assert int(out.loc["a", "w1_num"]) == _naive_w1_num([0], [10, 10])
        assert out.loc["a", "n_a"] == 1 and out.loc["a", "n_b"] == 2

    def test_float_column_rejected(self, ray_session):
        df = pd.DataFrame({"g": ["a", "b"], "v": [1.5, 2.5]})
        with pytest.raises(Exception) as e:
            _run(df)
        assert "integer" in str(e.value)

    def test_envelope_guard_raises(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "v": [0, 0, 2 ** 61, 2 ** 61]})
        with pytest.raises(Exception) as e:
            _run(df)
        assert "envelope" in str(e.value)

    def test_hypothesis_fuzz_vs_naive(self, ray_session):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        vals = st.integers(min_value=-100, max_value=100)

        @settings(max_examples=15, deadline=None)
        @given(st.lists(vals, min_size=1, max_size=20),
               st.lists(vals, min_size=1, max_size=20))
        def check(a, b):
            df = pd.DataFrame({"g": ["a"] * len(a) + ["b"] * len(b),
                               "v": a + b})
            out = _run(df).set_index("g")
            assert int(out.loc["a", "w1_num"]) == _naive_w1_num(a, b)

        check()


class TestW1Metamorphic:
    """Metamorphic invariances of the exact W1 statistic."""

    def test_shift_invariance(self, ray_session):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 40, 30).tolist()
        b = rng.integers(20, 60, 50).tolist()
        df = pd.DataFrame({"g": ["a"] * 30 + ["b"] * 50, "v": a + b})
        base = _run(df).set_index("g")["w1_num"]
        shifted = df.assign(v=df["v"] + 1000)
        out = _run(shifted).set_index("g")["w1_num"]
        assert out.equals(base)

    def test_integer_scale_scales_w1(self, ray_session):
        df = pd.DataFrame({"g": ["a", "a", "b", "b", "b"],
                           "v": [1, 5, 2, 7, 9]})
        base = _run(df).set_index("g")["w1_num"]
        out = _run(df.assign(v=df["v"] * 7)).set_index("g")["w1_num"]
        assert (out == base * 7).all()


def test_w1_empty_input(ray_session):
    df = pd.DataFrame({"g": pd.Series(dtype=object),
                       "v": pd.Series(dtype="Int64")})
    out = _run(df)
    assert len(out) == 0
    assert list(out.columns) == ["g", "w1_num", "n_a", "n_b"]


def test_w1_partition_invariance(ray_session):
    """Block structure must not change the exact statistic (the
    partial fold is associative)."""
    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 500),
        "v": rng.integers(0, 200, 500)})
    one = _run(df)
    import ray.data as rd
    many = checks.w1_exact_by_group(
        rd.from_pandas(df).repartition(16), "g", "v")
    pd.testing.assert_frame_equal(one, many)
