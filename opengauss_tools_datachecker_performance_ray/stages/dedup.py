"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data extensions (first-class per the build brief; the
reference engine itself assumes PK-unique input — SURVEY.md §2.7).
Every variant follows the same shuffle discipline: per-batch vectorized
fingerprinting, then ONE bucketed groupby where the within-bucket work
is vectorized; document text never ships twice.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textfn
from ..functions.hashing import hash64

logger = logging.getLogger(__name__)

# Within-bucket pair enumeration is O(n^2); one hot bucket of
# boilerplate (millions of near-identical docs at web scale) would
# explode the group task. Groups beyond this size switch to a STAR
# compare: every member against the group representative (min id) —
# O(n) output that keeps the same connected components for dedup
# purposes. The drop is logged (no-silent-caps rule).
DEFAULT_MAX_GROUP_SIZE = 4096


def _star_note(kind: str, n: int) -> None:
    dropped = n * (n - 1) // 2 - (n - 1)
    logger.warning(
        "%s: bucket of %d docs exceeds max_group_size — star-compare vs "
        "representative emitted (%d of %d candidate pairs dropped; "
        "connected components preserved)", kind, n, dropped,
        n * (n - 1) // 2)


def capped_group_keys(keyed, key_cols: list[str], max_group_size: int,
                      id_col: str) -> pd.DataFrame:
    """EXACT global candidate-group sizes, cheaply: per-batch partial
    counts + min-id per group key (the combiner), one groupby over the
    partial rows (one row per distinct key per block — far lighter than
    the row shuffle), filter to groups beyond ``max_group_size``. The
    result is tiny (giant boilerplate clusters are rare) and is
    broadcast into the pair reducers: a capped group star-compares, so
    it emitted EXACTLY the pairs involving its representative ``rep``
    (the group min id) — first-matching-bucket suppression can
    therefore stay exact instead of assuming a capped group emitted a
    pair it star-dropped (advisor finding, round 2)."""
    from ray.data.aggregate import Min, Sum

    def part(batch: pa.Table) -> pa.Table:
        gb = batch.select(key_cols + [id_col]).group_by(key_cols) \
            .aggregate([([], "count_all"), (id_col, "min")])
        # select by the DETERMINISTIC aggregate output names — the
        # key/aggregate column ORDER differs across pyarrow versions
        # (review finding), the names do not
        return pa.table(
            {c: gb.column(c) for c in key_cols}
            | {"n_part": gb.column("count_all"),
               "rep_part": gb.column(f"{id_col}_min")})

    partials = keyed.map_batches(part, batch_format="pyarrow")
    sums = partials.groupby(list(key_cols)).aggregate(
        Sum("n_part", alias_name="n"),
        Min("rep_part", alias_name="rep"))
    return sums.filter(expr=f"n > {max_group_size}").to_pandas()


def scaled_bits(approx_rows: int | None, target_group_rows: int,
                default_bits: int, lo: int = 4, hi: int = 28) -> int:
    """Bucket-key bit width that keeps the EXPECTED group size near
    ``target_group_rows`` as the corpus grows: ceil(log2(n / target)),
    clamped. With ``approx_rows`` unset, the caller's default stands —
    callers at scale should pass the parquet footer row count."""
    if approx_rows is None:
        return default_bits
    want = max(1, int(np.ceil(np.log2(max(1, approx_rows)
                                      / max(1, target_group_rows)))))
    return int(np.clip(want, lo, hi))


def exact_duplicates(ds, id_col: str, text_col: str, num_buckets: int = 64):
    """Groups of ids sharing byte-identical text: Dataset of
    (rep_id, dup_id) pairs (rep = min id of the group)."""

    def fp(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        h = hash64(batch.column(text_col))
        return pa.table({
            id_col: batch.column(id_col),
            "fp": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    keyed = ds.map_batches(fp, batch_format="pyarrow")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([  # deterministic representative
            "fp", id_col])
        rep = g.groupby("fp", sort=False)[id_col].transform("first")
        dup = g[rep != g[id_col]]
        return pd.DataFrame({"rep_id": rep[rep != g[id_col]].to_numpy(),
                             "dup_id": dup[id_col].to_numpy()})

    return keyed.groupby("bucket").map_groups(reduce, batch_format="pandas")


def minhash_lsh_pairs(ds, id_col: str, text_col: str, *, k: int = 5,
                      num_perm: int = 64, bands: int = 16,
                      verify_threshold: float = 0.5,
                      max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
                      hash_fn=None):
    """MinHash-LSH candidate pairs with signature-similarity verify.

    shingle -> minhash signature -> band buckets (groupby) -> candidate
    pairs -> verified by estimated Jaccard (matching minhash fraction)
    >= threshold. Returns Dataset of (a, b, sim_est).

    The signatures ride along into the band explode so verification
    happens inside the bucket group without re-reading documents —
    at the cost of ``bands`` copies of the signature (num_perm * 8
    bytes each); cheaper than a second pass over text at web scale.

    Pairs are EXACTLY-ONCE across bands with zero driver-side work
    (round-2 verdict #2): a pair matching in several bands is emitted
    only by its FIRST matching band — later bands recompute the
    earlier band keys from the carried signatures and suppress
    (the SimHash first-matching-rotation trick, applied per band).
    When the first matching band's group exceeded ``max_group_size``
    (star compare — it emitted exactly the pairs involving the group
    representative), a broadcast frame of globally-capped (band, key,
    rep) groups keeps suppression exact: a capped earlier match
    suppresses iff the pair involves that group's rep. Exactly-once
    therefore holds even through capped groups; pairs NOT involving a
    capped group's rep are star-dropped there and re-emitted by the
    next matching band (zero pair loss — advisor finding, round 2).
    """

    def sig_bands(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        texts = pd.Series(batch.column(text_col).to_pylist())
        di, sh = textfn.shingle_hashes(texts, k=k, hash_fn=hash_fn)
        sig = textfn.minhash_signatures(di, sh, len(texts), num_perm=num_perm)
        keys = textfn.lsh_band_keys(sig, bands=bands)
        n, b = keys.shape
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "band": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
            "bkey": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
            id_col: pa.array(np.repeat(ids, b)),
            "sig": pa.array(
                np.repeat(sig.view(np.int64).reshape(n, num_perm), b, axis=0)
                .tolist(), pa.list_(pa.int64(), num_perm)),
        })

    # materialized once: consumed by the capped-group pre-pass AND the
    # pair groupby (these bytes ship through the shuffle either way)
    exploded = ds.map_batches(sig_bands, batch_format="pyarrow") \
        .materialize()
    capped = capped_group_keys(exploded, ["band", "bkey"], max_group_size,
                               id_col)
    # band -> (sorted capped keys, aligned group reps); tiny, broadcast
    # by closure
    capped_by_band: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if len(capped):
        for b, gg in capped.groupby("band"):
            gg = gg.sort_values("bkey")
            capped_by_band[int(b)] = (gg["bkey"].to_numpy(np.int64),
                                      gg["rep"].to_numpy(np.int64))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "sim_est": pd.Series(dtype=np.float64)})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return empty
        band = int(g["band"].iloc[0])
        sigs = np.asarray([np.asarray(s) for s in g["sig"]])
        ids = g[id_col].to_numpy()
        if n > max_group_size:
            # giant cluster (boilerplate): O(n) star vs representative
            _star_note("minhash_lsh_pairs", n)
            sim = (sigs[1:] == sigs[0]).mean(axis=1)
            keep = sim >= verify_threshold
            out = pd.DataFrame({"a": np.repeat(ids[0], keep.sum()),
                                "b": ids[1:][keep], "sim_est": sim[keep]})
            pa_idx = np.zeros(len(out), dtype=np.int64)
            pb_idx = np.flatnonzero(keep) + 1
        else:
            ia, ib = np.triu_indices(n, k=1)
            sim = (sigs[ia] == sigs[ib]).mean(axis=1)
            keep = sim >= verify_threshold
            out = pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                                "sim_est": sim[keep]})
            pa_idx, pb_idx = ia[keep], ib[keep]
        if band and len(out):
            # first-matching-band dedup: recompute earlier band keys
            # from the carried signatures; suppress a pair iff an
            # earlier band already EMITTED it — an uncapped group emits
            # all its pairs, a capped (star) group exactly the pairs
            # involving its rep (ids are sorted so only `a` can be the
            # group-min rep)
            keys_all = textfn.lsh_band_keys(sigs.view(np.uint64),
                                            bands=bands)
            prev = keys_all[:, :band].view(np.int64)
            match = prev[pa_idx] == prev[pb_idx]
            a_ids = out["a"].to_numpy()
            for b_prev, (ck, reps) in capped_by_band.items():
                if b_prev >= band:
                    continue
                kk = prev[pa_idx, b_prev]
                pos = np.minimum(np.searchsorted(ck, kk), len(ck) - 1)
                is_capped = ck[pos] == kk
                match[:, b_prev] &= ~is_capped | (reps[pos] == a_ids)
            out = out[~match.any(axis=1)]
        return out if len(out) else empty

    return exploded.groupby(["band", "bkey"]).map_groups(
        pairs, batch_format="pandas")


def simhash_near_duplicates(ds, id_col: str, text_col: str,
                            max_hamming: int = 3, prefix_bits: int = 16,
                            rotations: int = 1,
                            approx_rows: int | None = None,
                            max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
                            hash_fn=None):
    """SimHash near-dup pairs: documents whose 64-bit SimHashes are
    within ``max_hamming``. Candidate grouping by the hash's top
    ``prefix_bits``; ``rotations`` > 1 applies the standard
    table-rotation trick (each rotation exposes a different bit window
    as the prefix, so a near pair whose differing bits fall inside one
    window is still caught by another — recall rises toward exact as
    rotations -> 64/prefix_bits). Cross-rotation duplicate pairs are
    collapsed inside the group reduce by keeping rotation 0's view of
    each (a, b); a pair found ONLY under rotation r>0 groups under that
    rotation's key. Verified exactly by popcount inside the group.

    Scale levers (round-1 verdict): ``approx_rows`` (parquet footer
    count) scales ``prefix_bits`` so expected group size stays near
    1024 instead of growing linearly with the corpus; groups beyond
    ``max_group_size`` (identical-boilerplate clusters) emit an O(n)
    star vs the representative instead of O(n^2) pairs."""
    prefix_bits = max(prefix_bits,
                      scaled_bits(approx_rows, 1024, prefix_bits))

    def sh(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        s = textfn.simhash(pd.Series(batch.column(text_col).to_pylist()),
                           hash_fn=hash_fn)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(s)
        outs = []
        for r in range(max(1, rotations)):
            rot = np.uint64(r * max(1, 64 // max(1, rotations)) % 64)
            hr = ((s << rot) | (s >> (np.uint64(64) - rot))) if rot else s
            outs.append(pa.table({
                id_col: pa.array(ids),
                "simhash": pa.array(s.view(np.int64), pa.int64()),
                "rot": pa.array(np.full(n, r, dtype=np.int8)),
                "prefix": pa.array(
                    ((hr >> np.uint64(64 - prefix_bits)).astype(np.int64)
                     + (np.int64(r) << np.int64(prefix_bits)))),
            }))
        return pa.concat_tables(outs)

    keyed = ds.map_batches(sh, batch_format="pyarrow")
    capped_prefixes = np.empty(0, dtype=np.int64)
    if rotations > 1:
        # materialize once (consumed by the capped pre-pass AND the
        # groupby); capped prefixes are excluded from the cross-
        # rotation 'seen' computation below — a capped star group may
        # have DROPPED the pair, so later rotations must not suppress
        # on its account (advisor finding, round 2)
        keyed = keyed.materialize()
        capped = capped_group_keys(keyed, ["prefix"], max_group_size, id_col)
        capped_prefixes = np.sort(capped["prefix"].to_numpy(np.int64)) \
            if len(capped) else capped_prefixes

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        g = g.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return empty
        h = g["simhash"].to_numpy().view(np.uint64)
        ids = g[id_col].to_numpy()
        rot = int(g["rot"].iloc[0])
        if n > max_group_size:
            _star_note("simhash_near_duplicates", n)
            d = textfn.hamming_distance(h[1:], np.broadcast_to(h[0], (n - 1,)))
            keep = d <= max_hamming
            out = pd.DataFrame({"a": np.repeat(ids[0], keep.sum()),
                                "b": ids[1:][keep], "hamming": d[keep]})
        else:
            ia, ib = np.triu_indices(n, k=1)
            d = textfn.hamming_distance(h[ia], h[ib])
            keep = d <= max_hamming
            out = pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                                "hamming": d[keep]})
        if rot and len(out):
            # keep a pair under rotation r only if NO earlier rotation
            # already grouped it (their prefixes differ under every
            # r' < r) — exact cross-rotation dedup, vectorized per r'.
            # Earlier groups that were star-CAPPED may have dropped the
            # pair, so a match in a capped prefix never suppresses
            # (bounded duplication instead of silent loss).
            ha = h[np.searchsorted(ids, out["a"].to_numpy())]
            hb = h[np.searchsorted(ids, out["b"].to_numpy())]
            step = max(1, 64 // max(1, rotations))
            seen = np.zeros(len(out), dtype=bool)
            for r_prev in range(rot):
                sh_prev = np.uint64(r_prev * step % 64)
                ra = ((ha << sh_prev) | (ha >> (np.uint64(64) - sh_prev))) \
                    if sh_prev else ha
                rb = ((hb << sh_prev) | (hb >> (np.uint64(64) - sh_prev))) \
                    if sh_prev else hb
                pa_pref = (ra >> np.uint64(64 - prefix_bits))
                pb_pref = (rb >> np.uint64(64 - prefix_bits))
                matched = pa_pref == pb_pref
                if len(capped_prefixes):
                    gkey = (pa_pref.astype(np.int64)
                            + (np.int64(r_prev) << np.int64(prefix_bits)))
                    pos = np.minimum(
                        np.searchsorted(capped_prefixes, gkey),
                        len(capped_prefixes) - 1)
                    matched &= ~(capped_prefixes[pos] == gkey)
                seen |= matched
            out = out[~seen]
        return out if len(out) else empty

    return keyed.groupby("prefix").map_groups(pairs, batch_format="pandas")


def ngram_jaccard_verify(pairs_df: pd.DataFrame, docs_df: pd.DataFrame,
                         id_col: str, text_col: str, n: int = 3,
                         threshold: float = 0.8) -> pd.DataFrame:
    """Exact character-n-gram Jaccard verification of candidate pairs
    (driver-side final filter over an already-small candidate set)."""
    texts = docs_df.set_index(id_col)[text_col]
    rows = []
    for r in pairs_df.itertuples(index=False):
        j = textfn.jaccard_ngrams(str(texts.get(r.a, "")),
                                  str(texts.get(r.b, "")), n=n)
        if j >= threshold:
            rows.append({"a": r.a, "b": r.b, "jaccard": j})
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


# The exact all-pairs route broadcasts the whole normalized matrix;
# past this size the O(n*d) ship + O(n^2) compare stop being a sane
# baseline and the LSH route is the answer (it is never capped).
MAX_EXACT_BROADCAST_BYTES = 256 * 2**20


def embedding_cosine_duplicates_exact(ds, id_col: str, emb_col: str,
                                      threshold: float = 0.95):
    """EXACT all-pairs cosine near-dup pairs — the brute-force baseline
    the LSH variant is measured against (same role as brute-force knn
    vs the IVF index). The dataset is read ONCE into a normalized
    float64 matrix broadcast via ``ray.put``; tasks then fan out over
    disjoint row ranges of the broadcast (no second read, no
    re-normalization), each computing its rows x ALL columns in one
    matmul and keeping ``id_a < id_b`` — every qualifying pair is
    emitted exactly once (from the range holding its smaller id), with
    no shuffle and no per-pair Python. O(n^2/tasks) per task and an
    O(n*d) broadcast: correct at any split, affordable only while the
    embedding table fits the object store — at corpus scale use
    ``embedding_cosine_duplicates`` (hyperplane-LSH buckets).

    Returns (a, b) id pairs only: the float scores' last-ulp bytes are
    engine-specific, the id set is oracle-checkable against DuckDB's
    ``list_cosine_similarity`` (thresholds must sit >~1e-6 from every
    pair's cosine — see the testdata margin audit in queries.py).
    """
    import ray
    import ray.data as rd

    mats, idss = [], []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_format="pandas", batch_size=None):
        mats.append(np.stack(b[emb_col].to_numpy()).astype(np.float64))
        idss.append(b[id_col].to_numpy(np.int64))
    empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                          "b": pd.Series(dtype=np.int64)})
    if not mats:
        # from_arrow keeps the (a, b) schema on zero rows
        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    mat = np.concatenate(mats)
    if mat.nbytes > MAX_EXACT_BROADCAST_BYTES:
        # no-silent-caps rule: the baseline stays exact, but the
        # operator tells you when you've outgrown it
        logger.warning(
            "embedding_cosine_duplicates_exact: %.1f MB broadcast "
            "matrix exceeds the %d MB baseline budget — use "
            "embedding_cosine_duplicates (LSH) at this corpus size",
            mat.nbytes / 2**20, MAX_EXACT_BROADCAST_BYTES // 2**20)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = np.concatenate(idss)
    ref = ray.put((mat, ids))

    # fan out ROW RANGES over the broadcast instead of re-reading the
    # dataset: the single materialization above already decoded and
    # normalized every row, so tasks just slice the shared matrix
    n = len(ids)
    rows_per_task = max(1024, -(-n // 64))  # <=64 tasks, >=1024 rows
    starts = np.arange(0, n, rows_per_task, dtype=np.int64)

    def range_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        all_mat, all_ids = ray.get(ref)
        out = [empty]
        for lo in batch["start"].to_numpy():
            hi = min(lo + rows_per_task, len(all_ids))
            sims = all_mat[lo:hi] @ all_mat.T
            keep = (sims >= threshold) \
                & (all_ids[lo:hi, None] < all_ids[None, :])
            ia, ib = np.nonzero(keep)
            out.append(pd.DataFrame({"a": all_ids[lo:hi][ia],
                                     "b": all_ids[ib]}))
        return pd.concat(out, ignore_index=True)

    return rd.from_pandas(pd.DataFrame({"start": starts})) \
        .repartition(len(starts)) \
        .map_batches(range_pairs, batch_format="pandas", batch_size=None)


def embedding_cosine_duplicates(ds, id_col: str, emb_col: str,
                                threshold: float = 0.95,
                                num_buckets: int = 32, seed: int = 42,
                                approx_rows: int | None = None,
                                max_group_size: int = DEFAULT_MAX_GROUP_SIZE,
                                use_float64: bool = False):
    """Embedding near-dup pairs via random-hyperplane LSH bucketing +
    within-bucket exact cosine. Vectors are normalized once per batch;
    bucket = sign-pattern of ``log2(num_buckets)`` random projections
    (near-identical vectors agree on all signs with high probability).

    Scale levers (round-1 verdict): ``approx_rows`` scales the
    hyperplane-bit count so expected bucket size stays near 1024 as the
    corpus grows (bucket count no longer fixed at 32); buckets beyond
    ``max_group_size`` star-compare against the representative instead
    of the O(n^2) ``mat @ mat.T``.

    ``use_float64`` runs normalization and within-bucket cosine in
    float64 — 2x shuffle bytes for the vector payload, but the verified
    pair set becomes bit-comparable to a double-precision SQL oracle
    (the gate configuration); float32 stays the scale default."""
    nbits = max(1, int(np.log2(num_buckets)),
                scaled_bits(approx_rows, 1024, 1))
    dt = np.float64 if use_float64 else np.float32

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        mat = np.stack(batch[emb_col].to_numpy()).astype(dt)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((mat.shape[1], nbits)).astype(np.float32)
        signs = (mat @ planes) > 0
        bucket = signs @ (1 << np.arange(nbits))
        return pd.DataFrame({id_col: batch[id_col],
                             "bucket": bucket.astype(np.int32),
                             "vec": list(mat)})

    keyed = ds.map_batches(bucketize, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cos": pd.Series(dtype=np.float64)})
        mat = np.stack(g["vec"].to_numpy())
        ids = g[id_col].to_numpy()
        if n > max_group_size:
            _star_note("embedding_cosine_duplicates", n)
            c = mat[1:] @ mat[0]
            keep = c >= threshold
            return pd.DataFrame({"a": np.repeat(ids[0], keep.sum()),
                                 "b": ids[1:][keep], "cos": c[keep]})
        sims = mat @ mat.T
        ia, ib = np.triu_indices(n, k=1)
        c = sims[ia, ib]
        keep = c >= threshold
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "cos": c[keep]})

    return keyed.groupby("bucket").map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Line-level exact dedup (C4/CCNet-style corpus curation)
# ---------------------------------------------------------------------------


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[3,1,2] -> [0,1,2, 0, 0,1] — intra-group indices, vectorized."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(int(counts.sum()), dtype=np.int64) \
        - np.repeat(starts, counts)


def _explode_lines(batch: pa.Table, id_col: str, text_col: str,
                   delimiter: str, tokens_per_line: int | None,
                   include_text: bool) -> pa.Table:
    """Flat (id, line_no, lhash[, line]) table for one batch.

    ``tokens_per_line`` switches to fixed token-window "lines" (split
    on single space, re-joined per window) for corpora that carry no
    natural line breaks. Null and EMPTY texts contribute no lines
    (matching SQL ``string_split('') -> []`` semantics — pyarrow would
    return [''], a latent oracle divergence pinned by test)."""
    import pyarrow.compute as pc

    txt = batch.column(text_col)
    ok = pc.and_(pc.is_valid(txt), pc.not_equal(txt, ""))
    batch = batch.filter(ok)
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    sep = " " if tokens_per_line else delimiter
    lists = pc.split_pattern(txt, sep)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = np.asarray(lists.offsets, dtype=np.int64)
    values = lists.values
    n_per_doc = np.diff(offsets)
    if tokens_per_line:
        w = int(tokens_per_line)
        n_chunks = (n_per_doc + w - 1) // w
        doc_idx = np.repeat(np.arange(len(n_per_doc)), n_chunks)
        intra = _grouped_arange(n_chunks)
        starts = offsets[:-1][doc_idx] + w * intra
        bounds = np.append(starts, offsets[-1])
        # separator scalar type must match the value type — there is
        # no (large_list<large_string>, string) binary_join kernel
        sep_scalar = pa.scalar(" ", pa.large_string()) \
            if pa.types.is_large_string(values.type) else " "
        lines = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(bounds, pa.int64()), values), sep_scalar)
        line_no = intra
    else:
        doc_idx = np.repeat(np.arange(len(n_per_doc)), n_per_doc)
        lines = values
        line_no = _grouped_arange(n_per_doc)
    h = hash64(lines)
    cols = {
        id_col: pa.array(ids[doc_idx]),
        "line_no": pa.array(line_no, pa.int64()),
        "lhash": pa.array(h.view(np.int64), pa.int64()),
    }
    if include_text:
        cols["line"] = lines if isinstance(lines, pa.Array) \
            else pa.array(lines)
    return pa.table(cols)


# loser sets beyond this many (doc, line_no) pairs route reassembly
# through the bucketed join instead of a driver broadcast
BROADCAST_LOSERS_MAX = 2_000_000


def line_dedup(ds, id_col: str, text_col: str, *, delimiter: str = "\n",
               tokens_per_line: int | None = None, num_buckets: int = 64,
               out_delimiter: str = "\n",
               broadcast_losers_max: int = BROADCAST_LOSERS_MAX,
               carry_cols: list[str] | None = None):
    """Remove every non-first occurrence of each distinct line across
    the corpus and return the rebuilt documents (C4/CCNet-style
    line-level exact dedup). "First" = smallest (id, line_no); line
    identity is the 64-bit text fingerprint (same semantics as
    ``exact_duplicates``). Documents whose every line loses disappear.

    Shuffle discipline: the dedup pass ships (id, line_no, lhash) —
    24 B per line occurrence, never the text — and PRE-REDUCES inside
    each batch before the ONE bucketed groupby: a within-batch
    non-first occurrence is provably a global loser (the batch-local
    first has a smaller (id, line_no)), so it exits directly to the
    loser set and only ONE candidate per distinct line per batch rides
    the shuffle (the combiner pattern; the duplicate-heavier the
    corpus — the whole reason to dedup — the bigger the cut). Only the
    LOSER positions come back: at web scale the duplicate fraction is
    what's small, so reassembly broadcasts the loser set (``ray.put``
    once) and rebuilds documents inside a second stateless pass over
    the original table — the text never shuffles at all. Past
    ``broadcast_losers_max`` losers, reassembly instead bucket-joins
    exploded lines with loser keys on ``hash(id) % B`` (text shuffles
    once; no driver materialization).

    ``carry_cols`` propagate doc-level metadata (lang, source, ...)
    onto the rebuilt rows — they never enter the dedup shuffle, only
    the rebuild stage.
    """
    import ray
    import ray.data  # noqa: F401  (ensure data API registered)

    def explode_tagged(batch: pa.Table) -> pa.Table:
        t = _explode_lines(batch, id_col, text_col, delimiter,
                           tokens_per_line, include_text=False)
        df = pd.DataFrame({
            id_col: t.column(id_col).to_numpy(zero_copy_only=False),
            "line_no": t.column("line_no").to_numpy(),
            "lhash": t.column("lhash").to_numpy(),
        }).sort_values([id_col, "line_no"])
        cand = (~df.duplicated("lhash", keep="first")).to_numpy()
        h = df["lhash"].to_numpy().view(np.uint64)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy()),
            "line_no": pa.array(df["line_no"].to_numpy(), pa.int64()),
            "lhash": pa.array(df["lhash"].to_numpy(), pa.int64()),
            "bucket": pa.array(
                (h % np.uint64(num_buckets)).astype(np.int32)),
            "cand": pa.array(cand),
        })

    # one explode feeds both consumers (candidates -> shuffle, local
    # losers -> straight to the loser set): 33 B/line in plasma, the
    # same digest-materialization budget the flagship validate uses
    tagged = ds.map_batches(explode_tagged,
                            batch_format="pyarrow").materialize()

    def only(cand_side: bool):
        def fn(batch: pa.Table) -> pa.Table:
            sel = batch.filter(pc.equal(batch.column("cand"), cand_side))
            cols = [id_col, "line_no", "lhash", "bucket"] if cand_side \
                else [id_col, "line_no"]
            return sel.select(cols)
        return fn

    keyed = tagged.map_batches(only(True), batch_format="pyarrow")
    local_losers = tagged.map_batches(only(False), batch_format="pyarrow")

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lhash", id_col, "line_no"])
        first = g.groupby("lhash", sort=False)[[id_col, "line_no"]] \
            .transform("first")
        lose = (first[id_col] != g[id_col]) \
            | (first["line_no"] != g["line_no"])
        out = g.loc[lose, [id_col, "line_no"]]
        return out if len(out) else pd.DataFrame(
            {id_col: pd.Series(dtype=g[id_col].dtype),
             "line_no": pd.Series(dtype=np.int64)})

    loser_ds = keyed.groupby("bucket").map_groups(
        losers, batch_format="pandas") \
        .union(local_losers).materialize()
    n_losers = loser_ds.count()

    key_dt = np.dtype([("a", np.int64), ("b", np.int64)])

    if n_losers <= broadcast_losers_max:
        lost = loser_ds.to_pandas()
        # integer ids broadcast as a sorted structured array
        # (searchsorted membership); any other id dtype broadcasts the
        # (id, line_no) MultiIndex and tests with vectorized .isin
        if len(lost) and np.issubdtype(lost[id_col].dtype, np.integer):
            lost_obj: object = np.zeros(len(lost), dtype=key_dt)
            lost_obj["a"] = lost[id_col].to_numpy(dtype=np.int64)
            lost_obj["b"] = lost["line_no"].to_numpy(dtype=np.int64)
            lost_obj.sort()
        elif len(lost):
            lost_obj = pd.MultiIndex.from_arrays(
                [lost[id_col], lost["line_no"]])
        else:
            lost_obj = None
        ref = ray.put(lost_obj)

        def rebuild(batch: pa.Table) -> pa.Table:
            flat = _explode_lines(batch, id_col, text_col, delimiter,
                                  tokens_per_line, include_text=True)
            lk = ray.get(ref)
            ids = flat.column(id_col).to_numpy(zero_copy_only=False)
            lns = flat.column("line_no").to_numpy()
            if lk is None:
                keep = np.ones(flat.num_rows, dtype=bool)
            elif isinstance(lk, np.ndarray):
                keys = np.zeros(flat.num_rows, dtype=key_dt)
                keys["a"] = ids
                keys["b"] = lns
                pos = np.minimum(np.searchsorted(lk, keys), len(lk) - 1)
                keep = lk[pos] != keys
            else:
                keep = ~pd.MultiIndex.from_arrays([ids, lns]).isin(lk)
            kept = flat.filter(pa.array(keep))
            df = pd.DataFrame({
                id_col: kept.column(id_col).to_numpy(zero_copy_only=False),
                "line_no": kept.column("line_no").to_numpy(),
                "line": kept.column("line").to_pandas(),
            })
            carry_t = {}
            if carry_cols:
                cmap = pd.DataFrame(
                    {id_col: batch.column(id_col).to_numpy(
                        zero_copy_only=False)}
                    | {c: batch.column(c).to_pandas()
                       for c in carry_cols}).drop_duplicates(id_col)
                carry_t = {c: batch.schema.field(c).type
                           for c in carry_cols}
            if not len(df):
                return pa.table({
                    id_col: pa.array([], flat.schema.field(id_col).type),
                    text_col: pa.array([], pa.large_string())}
                    | {c: pa.array([], t) for c, t in carry_t.items()})
            df = df.sort_values([id_col, "line_no"])
            agg = df.groupby(id_col, sort=True)["line"] \
                .agg(out_delimiter.join).reset_index(name=text_col)
            if carry_cols:
                agg = agg.merge(cmap, on=id_col, how="left")
            return pa.table({
                id_col: pa.array(agg[id_col].to_numpy()),
                text_col: pa.array(agg[text_col], pa.large_string())}
                | {c: pa.array(agg[c], carry_t[c]) for c in carry_t})

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # join route: exploded lines + loser keys co-partitioned on doc id
    def _doc_bucket(ids_arr) -> pa.Array:
        from ..functions.hashing import _splitmix64

        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        if pa.types.is_integer(ids_arr.type):
            ids64 = np.ascontiguousarray(
                ids_arr.to_numpy(zero_copy_only=False).astype(np.int64))
            dh = _splitmix64(ids64.view(np.uint64).copy())
        else:
            s = ids_arr if pa.types.is_large_string(ids_arr.type) else \
                ids_arr.cast(pa.string()).cast(pa.large_string())
            dh = hash64(s)
        return pa.array((dh % np.uint64(num_buckets)).astype(np.int32))

    def _as_pa_type(t):
        # Dataset.schema() yields Arrow types for parquet-backed data
        # but plain Python/numpy types for pandas-backed datasets
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    carry = list(carry_cols or [])
    carry_types: dict = {}
    if carry:
        sch = ds.schema()
        carry_types = {c: _as_pa_type(t) for c, t in zip(sch.names,
                                                         sch.types)
                       if c in carry}

    def explode_text(batch: pa.Table) -> pa.Table:
        t = _explode_lines(batch, id_col, text_col, delimiter,
                           tokens_per_line, include_text=True)
        cols = {
            id_col: t.column(id_col),
            "line_no": t.column("line_no"),
            # canonicalize to large_string so the union with tag_losers'
            # large_string null column sees one schema (string-typed
            # input text would otherwise explode to pa.string here)
            "line": t.column("line").cast(pa.large_string()),
            "is_loser": pa.array(np.zeros(t.num_rows, bool)),
            "dbucket": _doc_bucket(t.column(id_col)),
        }
        if carry:
            cmap = pd.DataFrame(
                {id_col: batch.column(id_col).to_numpy(
                    zero_copy_only=False)}
                | {c: batch.column(c).to_pandas() for c in carry}) \
                .drop_duplicates(id_col)
            flat_ids = pd.DataFrame({id_col: t.column(id_col).to_numpy(
                zero_copy_only=False)})
            joined = flat_ids.merge(cmap, on=id_col, how="left")
            for c in carry:
                cols[c] = pa.array(joined[c], carry_types[c])
        return pa.table(cols)

    def tag_losers(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            "line_no": batch.column("line_no"),
            "line": pa.array([None] * n, pa.large_string()),
            "is_loser": pa.array(np.ones(n, bool)),
            "dbucket": _doc_bucket(batch.column(id_col)),
        } | {c: pa.array([None] * n, carry_types[c]) for c in carry})

    lines_ds = ds.map_batches(explode_text, batch_format="pyarrow")
    tagged = loser_ds.map_batches(tag_losers, batch_format="pyarrow")

    def rebuild_group(g: pd.DataFrame) -> pd.DataFrame:
        lose = g[g["is_loser"]]
        keep = g[~g["is_loser"]].merge(
            lose[[id_col, "line_no"]], on=[id_col, "line_no"],
            how="left", indicator=True)
        keep = keep[keep["_merge"] == "left_only"]
        if not len(keep):
            return pd.DataFrame(
                {id_col: pd.Series(dtype=g[id_col].dtype),
                 text_col: pd.Series(dtype=object)}
                | {c: pd.Series(dtype=g[c].dtype) for c in carry})
        keep = keep.sort_values([id_col, "line_no"])
        out = keep.groupby(id_col, sort=True)["line"] \
            .agg(out_delimiter.join).reset_index(name=text_col)
        if carry:
            out = out.merge(keep.drop_duplicates(id_col)[[id_col] + carry],
                            on=id_col, how="left")
        return out

    return lines_ds.union(tagged).groupby("dbucket").map_groups(
        rebuild_group, batch_format="pandas")


def dup_span_histogram(ds, id_col: str, text_col: str, *, k: int = 5,
                       hash_fn=None):
    """Cross-document duplicated-span histogram — substring-level
    dedup analytics (after Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": the diagnostic that sizes how
    much exact k-gram overlap a corpus carries before committing to
    span removal, the substring counterpart of whole-doc
    ``exact_duplicates`` and line-level ``line_dedup``).

    For every distinct k-token shingle, counts how many DISTINCT
    documents contain it, then histograms those counts. Output rows
    ``(docs_sharing, n_shingles)``: the row (3, 17) means 17 distinct
    spans each appear in exactly 3 documents.

    Scale shape: the explode task emits 16-byte (shingle_hash,
    partial_count) rows — document text never leaves the scan task.
    Document identity is ``id_col`` (rows sharing an id inside a batch
    unify); like the reference engine, input must be PK-unique on
    ``id_col`` ACROSS batches — a duplicate id split over two batches
    would count as two documents here while the SQL oracle's DISTINCT
    merges it. Per-doc distinct shingles pre-reduce within the batch,
    the partial counts sum across batches, ONE groupby(shingle).sum
    carries the pre-reduced partials, and the second groupby runs over
    the tiny docs_sharing domain. Nothing materializes on the driver.
    """
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column(text_col).to_pandas()
        di, sh = textfn.shingle_hashes(texts, k=k, hash_fn=hash_fn)
        if len(sh) == 0:
            return pd.DataFrame({"sh": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        codes = pd.factorize(
            batch.column(id_col).to_pandas(), use_na_sentinel=False)[0]
        di = codes[di]  # doc identity = id_col, not row position
        order = np.lexsort((sh, di))
        di_s, sh_s = di[order], sh[order]
        first = np.empty(len(sh_s), dtype=bool)
        first[0] = True
        first[1:] = (di_s[1:] != di_s[:-1]) | (sh_s[1:] != sh_s[:-1])
        u, c = np.unique(sh_s[first], return_counts=True)
        # int64 bit-view of the uint64 hash: equality classes are
        # unchanged and every block carries one stable dtype (mixed
        # uint64/int64 blocks trip Ray's schema-consistency warning)
        return pd.DataFrame({"sh": u.view(np.int64),
                             "cnt": c.astype(np.int64)})

    per_shingle = ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("sh").aggregate(Sum("cnt", alias_name="docs_sharing"))

    def hist(batch: pa.Table) -> pd.DataFrame:
        v = batch.column("docs_sharing").to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"docs_sharing": u.astype(np.int64),
                             "n_shingles": c.astype(np.int64)})

    return per_shingle.map_batches(hist, batch_format="pyarrow") \
        .groupby("docs_sharing").aggregate(Sum("n_shingles",
                                               alias_name="n_shingles"))


def explode_shingle_pairs(batch: pa.Table, id_col: str, text_col: str,
                          *, k: int = 5) -> pa.Table:
    """Distinct ``(id, shingle_hash)`` pairs for one batch — the shared
    explode kernel of ``span_dup_scores``, ``span_contamination_filter``
    and ``stages/components.shingle_star_edges``. Document identity is
    ``id_col`` (rows sharing an id inside a batch unify; PK-unique
    across batches expected, as documented on ``dup_span_histogram``);
    text never leaves the scan task — only 16-byte pairs do."""
    texts = batch.column(text_col).to_pandas()
    di, sh = textfn.shingle_hashes(texts, k=k)
    if len(sh) == 0:
        return pa.table({
            id_col: pa.array([], batch.column(id_col).type),
            "sh": pa.array([], pa.int64())})
    # row_of maps each factorized doc code back to a row carrying it
    codes = pd.factorize(
        batch.column(id_col).to_pandas(), use_na_sentinel=False)[0]
    row_of = np.zeros(codes.max() + 1, dtype=np.int64)
    row_of[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
    di = codes[di]
    order = np.lexsort((sh, di))
    di_s, sh_s = di[order], sh[order]
    first = np.empty(len(sh_s), dtype=bool)
    first[0] = True
    first[1:] = (di_s[1:] != di_s[:-1]) | (sh_s[1:] != sh_s[:-1])
    return pa.table({
        id_col: batch.column(id_col).take(
            pa.array(row_of[di_s[first]])),
        "sh": pa.array(sh_s[first].view(np.int64), pa.int64())})


def span_dup_scores(ds, id_col: str, text_col: str, *, k: int = 5,
                    num_buckets: int = 64,
                    broadcast_max: int = BROADCAST_LOSERS_MAX):
    """Per-document duplicated-span scores — the filter-side companion
    of ``dup_span_histogram`` (Lee et al. 2022): for every document,
    how many of its distinct k-token shingles also appear in at least
    one OTHER document. ``n_dup_shingles / n_shingles`` is the
    standard span-contamination signal a curation pipeline thresholds
    on before dropping or trimming a document.

    Returns a Dataset ``(id_col, n_shingles, n_dup_shingles)`` with one
    row per document that has at least one shingle (empty/stopword-free
    docs carry no signal and are absent, matching the SQL oracle).

    Shuffle discipline (same family as ``line_dedup``): ONE explode
    pass materializes distinct 16-byte ``(id, shingle_hash)`` pairs —
    text never leaves the scan task — and feeds both consumers: the
    shared-shingle discovery (pre-reduced groupby(sh).count) and the
    per-doc tally. Shared shingles come back by BROADCAST (one
    ``ray.put`` of a sorted int64 array, searchsorted membership in
    every tally task) while they fit ``broadcast_max``; past that the
    membership test becomes a bucketed join on ``hash % num_buckets``
    (pairs and shared keys co-group; still only 16-24 B rows move).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    pairs = ds.map_batches(
        lambda b: explode_shingle_pairs(b, id_col, text_col, k=k),
        batch_format="pyarrow").materialize()

    shared = pairs.groupby("sh").aggregate(Count(alias_name="c")) \
        .filter(expr="c >= 2").select_columns(["sh"]).materialize()
    n_shared = shared.count()

    if n_shared <= broadcast_max:
        arr = np.sort(shared.to_pandas()["sh"].to_numpy(
            dtype=np.int64)) if n_shared else None
        ref = ray.put(arr)

        def tally(batch: pa.Table) -> pa.Table:
            sh = batch.column("sh").to_numpy(zero_copy_only=False)
            lk = ray.get(ref)
            if lk is None:
                dup = np.zeros(len(sh), dtype=np.int64)
            else:
                pos = np.searchsorted(lk, sh)
                pos[pos == len(lk)] = 0
                dup = (lk[pos] == sh).astype(np.int64) \
                    if len(lk) else np.zeros(len(sh), dtype=np.int64)
            return batch.select([id_col]).append_column(
                "n_shingles",
                pa.array(np.ones(len(sh), dtype=np.int64))).append_column(
                "n_dup_shingles", pa.array(dup))

        scored = pairs.map_batches(tally, batch_format="pyarrow")
    else:  # shared set too big to broadcast: bucketed groupby route
        logger.info("span_dup_scores: %d shared shingles exceed the "
                    "%d broadcast budget - bucketed-groupby membership",
                    n_shared, broadcast_max)

        def with_bucket(batch: pa.Table) -> pa.Table:
            h = batch.column("sh").to_numpy(
                zero_copy_only=False).view(np.uint64)
            return batch.append_column("bucket", pa.array(
                (h % np.uint64(num_buckets)).astype(np.int32)))

        def mark(g: pd.DataFrame) -> pd.DataFrame:
            # rows are globally distinct per (doc, shingle), so the
            # per-shingle row count within its bucket IS docs_sharing
            dup = (g.groupby("sh")["sh"].transform("size")
                   .to_numpy(dtype=np.int64) >= 2).astype(np.int64)
            return pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                "n_shingles": np.ones(len(g), dtype=np.int64),
                "n_dup_shingles": dup})

        scored = pairs.map_batches(with_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(mark, batch_format="pandas")

    return scored.groupby(id_col).aggregate(
        Sum("n_shingles", alias_name="n_shingles"),
        Sum("n_dup_shingles", alias_name="n_dup_shingles"))


def span_contamination_filter(ds, id_col: str, text_col: str, *,
                              k: int = 5, max_dup_ratio: float = 0.25,
                              flagged_broadcast_max: int | None = None):
    """Drop documents whose duplicated-k-gram fraction exceeds
    ``max_dup_ratio`` (strictly) — ``span_dup_scores`` turned into the
    curation filter it exists for. Returns the kept rows of ``ds``
    with all columns intact.

    The flagged set is normally the minority being dropped, so it
    broadcasts (one ``ray.put``, membership by np.isin) while it fits
    ``flagged_broadcast_max`` (default ``BROADCAST_LOSERS_MAX``); past
    the budget the filter becomes a distributed ``left_anti`` hash
    join on ``id_col`` — text shuffles once, nothing lands on the
    driver (line_dedup's fallback discipline). The ratio compare is
    float (``n_dup > ratio * n_shingles``) — exact for dyadic ratios
    like the 0.25 default, since the counts are small integers.
    """
    if flagged_broadcast_max is None:
        flagged_broadcast_max = BROADCAST_LOSERS_MAX

    def over_threshold(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_dup_shingles").to_numpy(zero_copy_only=False)
        ns = batch.column("n_shingles").to_numpy(zero_copy_only=False)
        return batch.select([id_col]).filter(
            pa.array(nd > max_dup_ratio * ns))

    flag_ds = span_dup_scores(ds, id_col, text_col, k=k) \
        .map_batches(over_threshold, batch_format="pyarrow")
    return filter_out_ids(ds, flag_ds, id_col,
                          broadcast_max=flagged_broadcast_max,
                          caller="span_contamination_filter")


def filter_out_ids(ds, flag_ds, id_col: str, *,
                   broadcast_max: int | None = None,
                   caller: str = "filter_out_ids"):
    """Drop from ``ds`` every row whose ``id_col`` appears in
    ``flag_ds`` (a Dataset whose ``id_col`` column is the drop list).
    The flagged set is normally the minority being dropped, so it
    broadcasts (one ``ray.put``, membership by np.isin) while it fits
    ``broadcast_max``; past the budget the filter becomes a
    distributed ``left_anti`` hash join on ``id_col`` — text shuffles
    once, nothing lands on the driver (line_dedup's fallback
    discipline)."""
    import ray

    if broadcast_max is None:
        broadcast_max = BROADCAST_LOSERS_MAX
    flag_ds = flag_ds.select_columns([id_col]).materialize()
    n_flagged = flag_ds.count()
    if n_flagged == 0:
        return ds
    if n_flagged <= broadcast_max:
        ref = ray.put(flag_ds.to_pandas()[id_col].to_numpy())

        def drop_flagged(batch: pa.Table) -> pa.Table:
            bad = ray.get(ref)
            keep = ~np.isin(batch.column(id_col).to_numpy(
                zero_copy_only=False), bad)
            return batch.filter(pa.array(keep))

        return ds.map_batches(drop_flagged, batch_format="pyarrow")
    logger.info("%s: %d flagged docs exceed the %d broadcast budget - "
                "left_anti join route", caller, n_flagged, broadcast_max)
    return ds.join(flag_ds, join_type="left_anti",
                   num_partitions=max(16, flag_ds.num_blocks()),
                   on=(id_col,))


def ref_shingle_overlap(ds, ref_ds, id_col: str, text_col: str, *,
                        k: int = 5, num_buckets: int = 64,
                        broadcast_max: int = BROADCAST_LOSERS_MAX):
    """Benchmark decontamination scan (GPT-3-appendix-C / Llama-style
    n-gram decontamination): for every document in ``ds``, count how
    many of its distinct k-token shingles also occur anywhere in the
    REFERENCE corpus ``ref_ds`` (the eval/benchmark set). Returns a
    Dataset ``(id_col, n_shingles, n_ref_shingles)`` with one row per
    contaminated document (``n_ref_shingles >= 1``); callers threshold
    the ratio to drop or trim.

    Same shuffle discipline as ``span_dup_scores``: one explode pass
    per side ships 16-byte (id, shingle_hash) pairs, text never moves.
    Benchmark sets are small, so the reference shingle set normally
    BROADCASTS (one ``ray.put`` of a sorted int64 array, searchsorted
    membership per batch); past ``broadcast_max`` distinct reference
    shingles the membership test falls back to a bucketed co-group on
    ``hash % num_buckets`` — both routes byte-identical.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    pairs = ds.map_batches(
        lambda b: explode_shingle_pairs(b, id_col, text_col, k=k),
        batch_format="pyarrow")

    ref_sh = ref_ds.map_batches(
        lambda b: explode_shingle_pairs(b, id_col, text_col, k=k),
        batch_format="pyarrow").select_columns(["sh"]) \
        .groupby("sh").aggregate(Count(alias_name="c")) \
        .select_columns(["sh"]).materialize()
    n_ref = ref_sh.count()

    if n_ref <= broadcast_max:
        arr = np.sort(ref_sh.to_pandas()["sh"].to_numpy(
            dtype=np.int64)) if n_ref else None
        ref = ray.put(arr)

        def tally(batch: pa.Table) -> pa.Table:
            sh = batch.column("sh").to_numpy(zero_copy_only=False)
            lk = ray.get(ref)
            if lk is None or not len(lk):
                hit = np.zeros(len(sh), dtype=np.int64)
            else:
                pos = np.searchsorted(lk, sh)
                pos[pos == len(lk)] = 0
                hit = (lk[pos] == sh).astype(np.int64)
            return batch.select([id_col]).append_column(
                "n_shingles",
                pa.array(np.ones(len(sh), dtype=np.int64))).append_column(
                "n_ref_shingles", pa.array(hit))

        scored = pairs.map_batches(tally, batch_format="pyarrow")
    else:
        logger.info("ref_shingle_overlap: %d reference shingles exceed "
                    "the %d broadcast budget - bucketed-groupby "
                    "membership", n_ref, broadcast_max)

        def tag_pairs(batch: pa.Table) -> pa.Table:
            h = batch.column("sh").to_numpy(
                zero_copy_only=False).view(np.uint64)
            return pa.table({
                id_col: batch.column(id_col),
                "sh": batch.column("sh"),
                "is_ref": pa.array(np.zeros(batch.num_rows, np.int64)),
                "bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32))})

        def tag_ref(batch: pa.Table) -> pa.Table:
            h = batch.column("sh").to_numpy(
                zero_copy_only=False).view(np.uint64)
            return pa.table({
                id_col: pa.array(np.full(batch.num_rows, -1, np.int64)),
                "sh": batch.column("sh"),
                "is_ref": pa.array(np.ones(batch.num_rows, np.int64)),
                "bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32))})

        def mark(g: pd.DataFrame) -> pd.DataFrame:
            is_ref = g["is_ref"].to_numpy() == 1
            ref_set = np.unique(g.loc[is_ref, "sh"].to_numpy(np.int64))
            doc = g.loc[~is_ref]
            sh = doc["sh"].to_numpy(dtype=np.int64)
            if len(ref_set):
                pos = np.searchsorted(ref_set, sh)
                pos[pos == len(ref_set)] = 0
                hit = (ref_set[pos] == sh).astype(np.int64)
            else:
                hit = np.zeros(len(sh), dtype=np.int64)
            return pd.DataFrame({
                id_col: doc[id_col].to_numpy(),
                "n_shingles": np.ones(len(sh), dtype=np.int64),
                "n_ref_shingles": hit})

        scored = pairs.map_batches(tag_pairs, batch_format="pyarrow") \
            .union(ref_sh.map_batches(tag_ref, batch_format="pyarrow")) \
            .groupby("bucket").map_groups(mark, batch_format="pandas")

    return scored.groupby(id_col).aggregate(
        Sum("n_shingles", alias_name="n_shingles"),
        Sum("n_ref_shingles", alias_name="n_ref_shingles")) \
        .filter(expr="n_ref_shingles > 0")
