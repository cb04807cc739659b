"""Unit tests for the pure primitives (no Ray needed)."""

from decimal import Decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opengauss_tools_datachecker_performance_ray.functions import (
    canonical, hashing, merkle, sketches, textfn,
)


def _typed_table():
    return pa.table({
        "id": pa.array([1, 2, 3], type=pa.int64()),
        "c_varchar": pa.array(["a", None, "c"]),
        "c_float": pa.array([1.5, None, 3.25], type=pa.float64()),
        "c_bool": pa.array([True, False, None]),
        "c_ts": pa.array([1_600_000_000_000_000, None, 0], type=pa.timestamp("us")),
        "c_bin": pa.array([b"\x00\xff", None, b""], type=pa.binary()),
        "c_dec": pa.array([None, Decimal("12345"), Decimal("-1")],
                          type=pa.decimal128(20, 6)),
    })


class TestCanonical:
    def test_nulls_become_empty(self):
        t = _typed_table()
        for name in t.column_names:
            arr = canonical.canonicalize_column(t.column(name))
            assert arr.null_count == 0
            assert arr.type == pa.large_binary()

    def test_golden_values(self):
        t = _typed_table()
        assert canonical.canonicalize_column(t["id"]).to_pylist() == [b"1", b"2", b"3"]
        assert canonical.canonicalize_column(t["c_bool"]).to_pylist() == [
            b"true", b"false", b""]
        assert canonical.canonicalize_column(t["c_ts"]).to_pylist() == [
            b"1600000000000000", b"", b"0"]
        assert canonical.canonicalize_column(t["c_bin"]).to_pylist() == [
            b"\x00\xff", b"", b""]
        assert canonical.canonicalize_column(t["c_dec"]).to_pylist() == [
            b"", b"12345.000000", b"-1.000000"]

    def test_row_concat_equality_invariant(self):
        # byte-identical canonical concat <=> equal rows
        t = _typed_table()
        c1 = canonical.canonical_row_concat(t)
        c2 = canonical.canonical_row_concat(t)
        assert c1.to_pylist() == c2.to_pylist()
        t2 = t.set_column(1, "c_varchar", pa.array(["a", None, "C"]))
        c3 = canonical.canonical_row_concat(t2)
        assert c1.to_pylist()[:2] == c3.to_pylist()[:2]
        assert c1.to_pylist()[2] != c3.to_pylist()[2]

    def test_separator_prevents_boundary_collisions(self):
        a = pa.table({"x": pa.array(["ab"]), "y": pa.array(["c"])})
        b = pa.table({"x": pa.array(["a"]), "y": pa.array(["bc"])})
        assert (canonical.canonical_row_concat(a).to_pylist()
                != canonical.canonical_row_concat(b).to_pylist())

    def test_composite_key(self):
        t = pa.table({"a": pa.array([1, 2], type=pa.int64()),
                      "b": pa.array(["x", "y"])})
        keys = canonical.key_column(t, ["a", "b"]).to_pylist()
        assert keys == ["1_#_x", "2_#_y"]


class TestHashing:
    def test_hash64_deterministic_and_distinct(self):
        vals = np.array(["a", "b", "a", ""], dtype=object)
        h = hashing.hash64(vals)
        assert h.dtype == np.uint64
        assert h[0] == h[2] and h[0] != h[1]
        # golden pin (stable across processes in this environment)
        h2 = hashing.hash64(pa.array(["a", "b", "a", ""]))
        np.testing.assert_array_equal(h, h2)

    def test_bucket_count(self):
        assert hashing.bucket_count_for(0) == 1
        assert hashing.bucket_count_for(64, 64) == 1
        assert hashing.bucket_count_for(65, 64) == 1
        assert hashing.bucket_count_for(129, 64) == 2
        assert hashing.bucket_count_for(10**12, 1) == hashing.MAX_BUCKETS_PER_PARTITION

    def test_assign_buckets_co_partitioning(self):
        kh = hashing.hash64(np.array([f"url{i}" for i in range(1000)], dtype=object))
        p1, b1 = hashing.assign_buckets(kh, 8, 256)
        p2, b2 = hashing.assign_buckets(kh, 8, 256)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(b1, b2)
        assert p1.min() >= 0 and p1.max() < 8
        assert b1.min() >= 0 and b1.max() < 256

    def test_xor_signature_order_independent(self):
        v = hashing.hash64(np.array([f"t{i}" for i in range(100)], dtype=object))
        rng = np.random.default_rng(0)
        assert hashing.xor_reduce(v) == hashing.xor_reduce(rng.permutation(v))

    def test_xor_by_bucket_matches_reduce(self):
        v = hashing.hash64(np.array([f"t{i}" for i in range(100)], dtype=object))
        bucket = (v % np.uint64(4)).astype(np.int64)
        sig, cnt = hashing.xor_by_bucket(bucket, v, 4)
        for b in range(4):
            assert sig[b] == hashing.xor_reduce(v[bucket == b])
            assert cnt[b] == (bucket == b).sum()


class TestMerkle:
    def test_equal_trees_no_diff(self):
        leaves = hashing.hash64(np.array([f"s{i}" for i in range(16)], dtype=object))
        assert len(merkle.diff_buckets(leaves, leaves.copy())) == 0
        assert merkle.merkle_root(leaves) == merkle.merkle_root(leaves.copy())

    def test_single_leaf_diff_located(self):
        leaves = hashing.hash64(np.array([f"s{i}" for i in range(32)], dtype=object))
        other = leaves.copy()
        other[7] ^= np.uint64(0xDEAD)
        d = merkle.diff_buckets(leaves, other)
        assert list(d) == [7]
        assert merkle.merkle_root(leaves) != merkle.merkle_root(other)

    def test_pad_leaves(self):
        dense = merkle.pad_leaves(np.array([1, 3]), np.array([5, 9], dtype=np.uint64), 4)
        assert list(dense) == [0, 5, 0, 9]

    def test_power_of_two_required(self):
        with pytest.raises(AssertionError):
            merkle.build_levels(np.zeros(3, dtype=np.uint64))

    def test_merkle_root_many_matches_scalar(self):
        # the vectorized multi-tree root must be bit-identical to the
        # per-tree zlib.adler32 reference for every row
        rng = np.random.default_rng(7)
        for B in (1, 2, 4, 64, 1024):
            trees = rng.integers(0, 2**64, size=(13, B), dtype=np.uint64)
            trees[0] = 0                          # all-zero tree
            trees[1, : B // 2 or 1] = 2**64 - 1   # max-valued bytes
            many = merkle.merkle_root_many(trees)
            for i in range(trees.shape[0]):
                assert many[i] == merkle.merkle_root(trees[i]), (B, i)

    def test_merkle_root_many_counts_view(self):
        # croot path: int64 counts viewed as uint64, as compare.py does
        cnt = np.arange(8, dtype=np.int64)
        assert merkle.merkle_root_many(cnt.view(np.uint64)[None, :])[0] \
            == merkle.merkle_root(cnt.view(np.uint64))


class TestXorCountByGid:
    def _cases(self):
        rng = np.random.default_rng(3)
        n = 5000
        gid = rng.integers(0, 97, size=n).astype(np.int64)
        vhash = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        cnt = rng.integers(1, 9, size=n).astype(np.int64)
        return gid, vhash, cnt

    def _reference(self, gid, vhash, cnt):
        out = {}
        for g, v, c in zip(gid, vhash, cnt if cnt is not None
                           else np.ones(len(gid), np.int64)):
            s, t = out.get(g, (np.uint64(0), 0))
            out[g] = (s ^ v, t + int(c))
        keys = sorted(out)
        return (np.array(keys, np.int64),
                np.array([out[k][0] for k in keys], np.uint64),
                np.array([out[k][1] for k in keys], np.int64))

    @pytest.mark.parametrize("with_cnt", [False, True])
    def test_matches_reference(self, with_cnt):
        from opengauss_tools_datachecker_performance_ray.stages.compare import (
            _xor_count_by_gid,
        )

        gid, vhash, cnt = self._cases()
        g, s, c = _xor_count_by_gid(gid, vhash, cnt if with_cnt else None)
        order = np.argsort(g)
        g, s, c = g[order], s[order], c[order]
        rg, rs, rc = self._reference(gid, vhash, cnt if with_cnt else None)
        assert np.array_equal(g, rg)
        assert np.array_equal(s, rs)
        assert np.array_equal(c, rc)

    def test_numpy_fallback_matches_polars(self, monkeypatch):
        import builtins

        from opengauss_tools_datachecker_performance_ray.stages import compare

        gid, vhash, cnt = self._cases()
        with_pl = compare._xor_count_by_gid(gid, vhash, cnt)

        real_import = builtins.__import__

        def no_polars(name, *a, **k):
            if name == "polars":
                raise ImportError("forced for test")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_polars)
        without = compare._xor_count_by_gid(gid, vhash, cnt)
        # polars group order is hash-dependent; compare as sorted triples
        za = sorted(zip(*map(list, with_pl)))
        zb = sorted(zip(*map(list, without)))
        assert za == zb


class TestSketches:
    def test_hll_accuracy(self):
        h = sketches.HLL(p=14)
        vals = hashing.hash64(np.array([f"v{i}" for i in range(50000)], dtype=object))
        h.add_hashes(vals)
        est = h.estimate()
        assert abs(est - 50000) / 50000 < 0.05

    def test_hll_merge_equals_union(self):
        a, b = sketches.HLL(), sketches.HLL()
        va = hashing.hash64(np.array([f"a{i}" for i in range(1000)], dtype=object))
        vb = hashing.hash64(np.array([f"b{i}" for i in range(1000)], dtype=object))
        a.add_hashes(va); b.add_hashes(vb)
        u = sketches.HLL(); u.add_hashes(np.concatenate([va, vb]))
        assert a.merge(b).estimate() == u.estimate()

    def test_tdigest_quantiles(self):
        rng = np.random.default_rng(42)
        data = rng.normal(0, 1, 100_000)
        td = sketches.TDigest()
        for chunk in np.array_split(data, 20):
            td.add(chunk)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert abs(td.quantile(q) - np.quantile(data, q)) < 0.05

    def test_tdigest_merge(self):
        rng = np.random.default_rng(1)
        d1, d2 = rng.uniform(0, 1, 10000), rng.uniform(1, 2, 10000)
        t1, t2 = sketches.TDigest(), sketches.TDigest()
        t1.add(d1); t2.add(d2)
        m = t1.merge(t2)
        assert abs(m.quantile(0.5) - 1.0) < 0.05
        assert m.n == 20000

    def test_top_counter(self):
        c = sketches.TopCounter(cap=2)
        c.add(np.array(["a", "b", "c"]), np.array([5, 3, 2]))
        assert c.counts == {"a": 5, "b": 3} and c.other == 2
        d = sketches.TopCounter(cap=2)
        d.add(np.array(["a"]), np.array([1]))
        m = c.merge(d)
        assert m.counts["a"] == 6


class TestTextFn:
    def test_token_counts(self):
        s = pd.Series(["hello world", "", None, "one"])
        np.testing.assert_array_equal(textfn.token_counts(s), [2, 0, 0, 1])

    def test_lang_id(self):
        s = pd.Series([
            "the cat and the dog sat in a box for it is that",
            "der hund und die katze ist nicht ein problem mit den",
            "xyzzy 12345",
        ])
        out = textfn.lang_id(s)
        assert list(out) == ["en", "de", "und"]

    def test_minhash_similarity_tracks_jaccard(self):
        base = " ".join(f"w{i}" for i in range(200))
        near = " ".join(f"w{i}" for i in range(190)) + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
        far = " ".join(f"z{i}" for i in range(200))
        s = pd.Series([base, near, far])
        di, sh = textfn.shingle_hashes(s, k=3)
        sig = textfn.minhash_signatures(di, sh, 3, num_perm=128)
        sim_near = (sig[0] == sig[1]).mean()
        sim_far = (sig[0] == sig[2]).mean()
        assert sim_near > 0.7 and sim_far < 0.1

    def test_lsh_band_keys_match_for_identical(self):
        s = pd.Series(["a b c d e f g h", "a b c d e f g h"])
        di, sh = textfn.shingle_hashes(s, k=3)
        sig = textfn.minhash_signatures(di, sh, 2, num_perm=64)
        keys = textfn.lsh_band_keys(sig, bands=16)
        np.testing.assert_array_equal(keys[0], keys[1])

    def test_simhash_near_duplicates_close(self):
        base = " ".join(f"w{i}" for i in range(100))
        near = base + " extra"
        far = " ".join(f"z{i}" for i in range(100))
        sh = textfn.simhash(pd.Series([base, near, far]))
        d_near = textfn.hamming_distance(sh[:1], sh[1:2])[0]
        d_far = textfn.hamming_distance(sh[:1], sh[2:3])[0]
        assert d_near < d_far

    def test_jaccard_ngrams(self):
        assert textfn.jaccard_ngrams("abcdef", "abcdef") == 1.0
        assert textfn.jaccard_ngrams("abcdef", "uvwxyz") == 0.0

    def test_quality_score_orders_sensibly(self):
        good = "The quick brown fox jumps over the lazy dog and it is a fine day " * 20
        bad = "!!! ??? ### $$$ %%%"
        qs = textfn.quality_score(pd.Series([good, bad]))
        assert qs[0] > qs[1]


class TestRowHash:
    def test_fast_path_matches_across_loads(self):
        import pyarrow.parquet as pq

        t1 = pq.read_table("/root/testdata/sf0.001/orders.parquet")
        t2 = pq.read_table("/root/testdata/sf0.001/orders.parquet")
        np.testing.assert_array_equal(hashing.row_hash(t1),
                                      hashing.row_hash(t2))

    def test_column_order_dependent(self):
        a = pa.table({"x": pa.array([1], pa.int64()),
                      "y": pa.array([2], pa.int64())})
        h_xy = hashing.row_hash(a, ["x", "y"])
        h_yx = hashing.row_hash(a, ["y", "x"])
        assert h_xy[0] != h_yx[0]

    def test_null_semantics(self):
        t = pa.table({"x": pa.array([None, 0, None], pa.int64())})
        h = hashing.row_hash(t)
        assert h[0] == h[2]          # null == null
        assert h[0] != h[1]          # null != 0

    def test_single_value_change_changes_hash(self):
        base = pa.table({"i": pa.array([7], pa.int64()),
                         "f": pa.array([1.5], pa.float64()),
                         "s": pa.array(["abc"]),
                         "ts": pa.array([123456], pa.timestamp("us")),
                         "b": pa.array([True])})
        h0 = hashing.row_hash(base)[0]
        for col, newval, typ in [("i", 8, pa.int64()),
                                 ("f", 1.5000001, pa.float64()),
                                 ("s", "abd", pa.string()),
                                 ("ts", 123457, pa.timestamp("us")),
                                 ("b", False, pa.bool_())]:
            mut = base.set_column(base.schema.get_field_index(col), col,
                                  pa.array([newval], typ))
            assert hashing.row_hash(mut)[0] != h0, col

    def test_mixed_types_same_numeric_value_distinct(self):
        # int 1 vs float 1.0 vs string "1" all hash differently
        a = hashing.row_hash(pa.table({"x": pa.array([1], pa.int64())}))[0]
        b = hashing.row_hash(pa.table({"x": pa.array([1.0], pa.float64())}))[0]
        c = hashing.row_hash(pa.table({"x": pa.array(["1"])}))[0]
        assert len({int(a), int(b), int(c)}) == 3

    def test_empty_table(self):
        t = pa.table({"x": pa.array([], pa.int64())})
        assert len(hashing.row_hash(t)) == 0


class TestGoldenDigests:
    """Pinned digest values (FIXTURES.md §3: canonical string per value,
    row digest per row, XOR bucket signature, Merkle root). Guards hash
    stability across refactors — a change here invalidates every
    checkpoint receipt and MUST bump hashing.DIGEST_VERSION."""

    TABLE = None

    @classmethod
    def _table(cls):
        return pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "s": pa.array(["alpha", None, "gamma"]),
            "f": pa.array([1.5, -0.0, None], pa.float64()),
            "ts": pa.array([1_600_000_000_000_000, None, 0],
                           pa.timestamp("us")),
        })

    def test_row_hash_pinned(self):
        # pinned for DIGEST_VERSION hv5-xxhash-nested (string columns
        # hash via polars xxHash; numeric fast path unchanged)
        h = hashing.row_hash(self._table())
        assert [int(x) for x in h] == [
            10869173578854890010, 15198598680309554260,
            6425373631674838630]

    def test_khash_pinned(self):
        k = hashing.hash64(pa.array(["1", "2", "3"]))
        assert [int(x) for x in k] == [
            7367496258380212974, 9383001862303268391,
            9641153390544606933]

    def test_xor_signature_and_merkle_root_pinned(self):
        h = hashing.row_hash(self._table())
        sig, cnt = hashing.xor_by_bucket(np.array([0, 1, 0]), h, 2)
        assert [int(x) for x in sig] == [
            14987008202444838012, 15198598680309554260]
        assert list(cnt) == [2, 1]
        leaves = merkle.pad_leaves(np.array([0, 1]), sig, 4)
        assert merkle.merkle_root(leaves) == 316146149
