"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data extensions (first-class per the build brief; the
reference engine itself assumes PK-unique input — SURVEY.md §2.7).
Every variant follows the same shuffle discipline: per-batch vectorized
fingerprinting, then ONE bucketed groupby where the within-bucket work
is vectorized; document text never ships twice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import textfn
from ..functions.hashing import hash64


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
                      verify_threshold: float = 0.5):
    """MinHash-LSH candidate pairs with signature-similarity verify.

    shingle -> minhash signature -> band buckets (groupby) -> candidate
    pairs -> verified by estimated Jaccard (matching minhash fraction)
    >= threshold. Returns Dataset of (a, b, sim_est).

    The signatures ride along into the band explode so verification
    happens inside the bucket group without re-reading documents —
    at the cost of ``bands`` copies of the signature (num_perm * 8
    bytes each); cheaper than a second pass over text at web scale.
    """

    def sig_bands(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        texts = pd.Series(batch.column(text_col).to_pylist())
        di, sh = textfn.shingle_hashes(texts, k=k)
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

    exploded = ds.map_batches(sig_bands, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "sim_est": pd.Series(dtype=np.float64)})
        sigs = np.asarray([np.asarray(s) for s in g["sig"]])
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        sim = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = sim >= verify_threshold
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "sim_est": sim[keep]})

    out = exploded.groupby(["band", "bkey"]).map_groups(
        pairs, batch_format="pandas")
    return out


def simhash_near_duplicates(ds, id_col: str, text_col: str,
                            max_hamming: int = 3, prefix_bits: int = 16):
    """SimHash near-dup pairs: documents whose 64-bit SimHashes are
    within ``max_hamming``. Candidate grouping by the hash's top
    ``prefix_bits`` (a near pair usually shares a prefix after the
    standard table-rotation trick; one rotation here — documented
    recall tradeoff), verified exactly by popcount inside the group."""

    def sh(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        s = textfn.simhash(pd.Series(batch.column(text_col).to_pylist()))
        return pa.table({
            id_col: batch.column(id_col),
            "simhash": pa.array(s.view(np.int64), pa.int64()),
            "prefix": pa.array((s >> np.uint64(64 - prefix_bits))
                               .astype(np.int64)),
        })

    keyed = ds.map_batches(sh, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        n = len(g)
        if n < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        h = g["simhash"].to_numpy().view(np.uint64)
        ids = g[id_col].to_numpy()
        ia, ib = np.triu_indices(n, k=1)
        d = textfn.hamming_distance(h[ia], h[ib])
        keep = d <= max_hamming
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "hamming": d[keep]})

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


def embedding_cosine_duplicates(ds, id_col: str, emb_col: str,
                                threshold: float = 0.95,
                                num_buckets: int = 32, seed: int = 42):
    """Embedding near-dup pairs via random-hyperplane LSH bucketing +
    within-bucket exact cosine. Vectors are normalized once per batch;
    bucket = sign-pattern of ``log2(num_buckets)`` random projections
    (near-identical vectors agree on all signs with high probability)."""
    nbits = max(1, int(np.log2(num_buckets)))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        mat = np.stack(batch[emb_col].to_numpy()).astype(np.float32)
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
        sims = mat @ mat.T
        ia, ib = np.triu_indices(n, k=1)
        c = sims[ia, ib]
        keep = c >= threshold
        return pd.DataFrame({"a": ids[ia][keep], "b": ids[ib][keep],
                             "cos": c[keep]})

    return keyed.groupby("bucket").map_groups(pairs, batch_format="pandas")
