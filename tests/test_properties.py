"""Property-based tests (hypothesis) for the core invariants.

The reference has no randomized testing (SURVEY.md §5); these pin the
engine's contracts under arbitrary inputs:

- row-hash equality <=> row equality (per-column typed semantics)
- XOR signatures are order-independent and mutation-sensitive
- Merkle diff localization finds exactly the mutated buckets
- t-digest quantiles stay within rank-error bounds
- HLL merge == union
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_tools_datachecker_performance_ray.functions import (
    hashing, merkle, sketches,
)

settings.register_profile("ci", deadline=None, max_examples=50)
settings.load_profile("ci")


row_values = st.tuples(
    st.integers(min_value=-2**62, max_value=2**62),
    st.one_of(st.none(), st.text(max_size=20)),
    st.one_of(st.none(),
              st.floats(allow_nan=False, allow_infinity=True, width=64)),
)


def _table(rows):
    return pa.table({
        "i": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.string()),
        "f": pa.array([r[2] for r in rows], pa.float64()),
    })


class TestRowHashProperties:
    @given(st.lists(row_values, min_size=1, max_size=60))
    def test_equal_rows_equal_hashes(self, rows):
        t = _table(rows)
        h1 = hashing.row_hash(t)
        h2 = hashing.row_hash(_table(rows))
        np.testing.assert_array_equal(h1, h2)
        # identical row tuples must collide; distinct tuples must not
        # (2^-64 accident probability — treat as impossible at n<=60)
        idx = {}
        for i, r in enumerate(rows):
            key = r
            if key in idx:
                assert h1[i] == h1[idx[key]]
            else:
                for j, r2 in enumerate(rows[:i]):
                    if r2 != r:
                        assert h1[i] != h1[j], (r, r2)
                idx[key] = i

    @given(st.lists(row_values, min_size=2, max_size=40), st.data())
    def test_single_field_mutation_changes_hash(self, rows, data):
        t = _table(rows)
        h = hashing.row_hash(t)
        i = data.draw(st.integers(0, len(rows) - 1))
        mutated = list(rows)
        r = mutated[i]
        mutated[i] = (r[0] + 1, r[1], r[2])
        h2 = hashing.row_hash(_table(mutated))
        assert h2[i] != h[i]
        for j in range(len(rows)):
            if j != i:
                assert h2[j] == h[j]


class TestHashKernelPaths:
    """Round-2 kernel rewrite: every encoding of the same logical
    values must hash identically."""

    @given(st.lists(st.one_of(st.none(), st.text(max_size=30)),
                    min_size=1, max_size=60))
    def test_dictionary_matches_decoded(self, vals):
        arr = pa.array(vals, pa.string())
        h_plain = hashing.column_hash(arr)
        h_dict = hashing.column_hash(arr.dictionary_encode())
        assert (h_plain == h_dict).all()

    @given(st.lists(st.text(max_size=30), min_size=1, max_size=60))
    def test_arrow_and_object_paths_agree(self, vals):
        h_arrow = hashing.hash64(pa.array(vals, pa.large_string()))
        h_obj = hashing.hash64(np.array(vals, dtype=object))
        assert (h_arrow == h_obj).all()

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=60))
    def test_uint64_full_range_no_crash_and_injective_bits(self, vals):
        arr = pa.array(vals, pa.uint64())
        h = hashing.column_hash(arr)
        # equal values hash equal; sub-2^63 values match int64 hashes
        small = [v for v in vals if v < 2**63]
        if small:
            hi = hashing.column_hash(pa.array(small, pa.int64()))
            hs = hashing.column_hash(pa.array(small, pa.uint64()))
            assert (hi == hs).all()
        assert len(h) == len(vals)

    @given(st.lists(st.one_of(st.none(),
                              st.lists(st.floats(allow_nan=False,
                                                 width=32),
                                       max_size=8)),
                    min_size=1, max_size=40))
    def test_list_column_hash_value_semantics(self, vals):
        """Nested fast path: equal lists hash equal, a single element
        change changes the hash, null rows take the sentinel."""
        arr = pa.array(vals, pa.list_(pa.float32()))
        h = hashing.column_hash(arr)
        assert len(h) == len(vals)
        import numpy as np  # noqa: F811
        for i, v in enumerate(vals):
            if v is None:
                assert h[i] == hashing._NULL_SENTINEL
        # duplicate the array: identical values -> identical hashes
        h2 = hashing.column_hash(pa.array(vals, pa.list_(pa.float32())))
        assert (h == h2).all()

    @given(st.lists(st.one_of(st.none(),
                              st.integers(-2**31, 2**31 - 1)),
                    min_size=1, max_size=60))
    def test_chunked_layout_invariant(self, vals):
        arr = pa.array(vals, pa.int64())
        whole = hashing.column_hash(arr)
        if len(vals) > 1:
            cut = len(vals) // 2
            chunked = pa.chunked_array([arr.slice(0, cut), arr.slice(cut)])
            assert (hashing.column_hash(chunked) == whole).all()


class TestSignatureProperties:
    @given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200),
           st.randoms())
    def test_xor_order_independent(self, vals, rnd):
        v = np.array(vals, dtype=np.uint64)
        shuffled = v.copy()
        rnd.shuffle(shuffled)
        assert hashing.xor_reduce(v) == hashing.xor_reduce(shuffled)

    @given(st.integers(1, 6), st.data())
    def test_merkle_diff_localizes_mutations(self, log_b, data):
        b = 1 << log_b
        rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
        leaves = rng.integers(1, 2**63, size=b, dtype=np.uint64)
        k = data.draw(st.integers(0, b))
        mut_idx = sorted(rng.choice(b, size=k, replace=False)) if k else []
        other = leaves.copy()
        for i in mut_idx:
            other[i] ^= np.uint64(rng.integers(1, 2**63))
        diff = merkle.diff_buckets(leaves, other)
        assert sorted(diff) == list(mut_idx)


class TestSketchProperties:
    @given(st.lists(st.floats(-1e6, 1e6), min_size=50, max_size=2000))
    def test_tdigest_quantile_within_range_and_monotone(self, vals):
        td = sketches.TDigest()
        td.add(np.array(vals))
        qs = [td.quantile(q) for q in (0.1, 0.25, 0.5, 0.75, 0.9)]
        assert all(min(vals) <= q <= max(vals) for q in qs)
        assert qs == sorted(qs)

    @given(st.lists(st.text(min_size=1, max_size=8), min_size=1,
                    max_size=500),
           st.lists(st.text(min_size=1, max_size=8), min_size=1,
                    max_size=500))
    def test_hll_merge_equals_union(self, a_vals, b_vals):
        ha = hashing.hash64(np.array(a_vals, dtype=object))
        hb = hashing.hash64(np.array(b_vals, dtype=object))
        a, b = sketches.HLL(), sketches.HLL()
        a.add_hashes(ha)
        b.add_hashes(hb)
        u = sketches.HLL()
        u.add_hashes(np.concatenate([ha, hb]))
        assert a.merge(b).estimate() == u.estimate()

    @given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=300))
    def test_uniqueness_partials_match_pandas(self, keys):
        """The bucketed-partial counting scheme (value_counts per chunk
        + re-aggregation) must agree with a plain pandas groupby."""
        s = pd.Series(keys)
        want = s.value_counts()
        want = want[want > 1].sort_index()
        # simulate per-batch partials over random chunking
        chunks = [s.iloc[i:i + 7] for i in range(0, len(s), 7)]
        partial = pd.concat([c.value_counts() for c in chunks if len(c)])
        got = partial.groupby(partial.index).sum()
        got = got[got > 1].sort_index()
        assert got.to_dict() == want.to_dict()


class TestMetamorphicCompare:
    """Randomized end-to-end metamorphic property: for ANY table and
    ANY disjoint injected insert/update/delete sets, the compare
    pipeline must report exactly those keys with exactly those kinds
    (SliceCheckWorker classification semantics under fuzzing)."""

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def test_random_injected_diffs_exact(self, ray_session_holder, data):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import (
            compare as cmp,
        )
        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        n = data.draw(st.integers(10, 80))
        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        src = pd.DataFrame({
            "k": [f"k{i:04d}" for i in range(n)],
            "a": rng.integers(-1000, 1000, n),
            "b": [f"v{rng.integers(0, 50)}" for _ in range(n)],
        })
        idx = rng.permutation(n)
        k_ins = data.draw(st.integers(0, min(5, n // 3)))
        k_upd = data.draw(st.integers(0, min(5, n // 3)))
        k_del = data.draw(st.integers(0, 5))
        ins_rows = idx[:k_ins]
        upd_rows = idx[k_ins:k_ins + k_upd]
        snk = src.drop(index=ins_rows).copy()
        snk.loc[upd_rows, "a"] = snk.loc[upd_rows, "a"] + 1_000_000
        extra = pd.DataFrame({
            "k": [f"extra{i:04d}" for i in range(k_del)],
            "a": rng.integers(-1000, 1000, k_del),
            "b": ["x"] * k_del,
        })
        snk = pd.concat([snk, extra], ignore_index=True)
        cfg = DigestConfig(key_columns=("k",), num_partitions=3,
                           buckets_per_partition=8)
        res = cmp.compare_tables(rd.from_pandas(src), rd.from_pandas(snk),
                                 cfg, table="fuzz")
        v = res.violations
        assert sorted(v.loc[v["kind"] == "insert", "key"]) == \
            sorted(src.loc[ins_rows, "k"])
        assert sorted(v.loc[v["kind"] == "update", "key"]) == \
            sorted(src.loc[upd_rows, "k"])
        assert sorted(v.loc[v["kind"] == "delete", "key"]) == \
            sorted(extra["k"])
        assert res.summary["result"] == (
            "success" if k_ins + k_upd + k_del == 0 else "failed")
