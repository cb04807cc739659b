"""Similarity search over an embedding column (list<float>).

Training-data extension: brute-force cosine top-k as the exact
baseline (one numpy matmul per batch against a broadcast query matrix
— ``ray.put`` once, read per actor/task, never re-shipped per batch),
and an IVF (inverted-file) variant as the scale path: k-means-ish
coarse centroids assign each vector to a cell; queries probe only the
nearest ``nprobe`` cells, turning an O(N) scan into O(N * nprobe / C).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, id_col: str, emb_col: str,
                     queries: np.ndarray, k: int = 10,
                     batch_size: int | None = None,
                     dtype=np.float32) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query row.

    ``queries``: (Q, D) float array. Per batch: one (B, D) x (D, Q)
    matmul; per-batch top-k heaps merge on the driver (k*Q rows per
    batch stream back — tiny). Returns (query_idx, vec_id, cos) rows.
    ``dtype``: float32 (default, the scale path — half the bandwidth)
    or float64 when the ranking must match a double-precision oracle
    bit-for-bit (DuckDB ``list_cosine_similarity``).
    """
    import ray

    qn = _normalize(np.asarray(queries, dtype=dtype))
    ref = ray.put(qn)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        q = ray.get(ref)
        mat = _normalize(np.stack(batch[emb_col].to_numpy()).astype(dtype))
        sims = mat @ q.T                      # (B, Q)
        out = []
        kk = min(k, len(batch))
        for qi in range(q.shape[0]):
            top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out.append(pd.DataFrame({
                "query_idx": qi,
                id_col: batch[id_col].to_numpy()[top],
                "cos": sims[top, qi]}))
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(score, batch_format="pandas",
                              batch_size=batch_size).to_pandas()
    # final exact top-k per query across batch partials
    out = []
    for qi, g in partials.groupby("query_idx"):
        top = heapq.nlargest(k, g.itertuples(index=False),
                             key=lambda r: r.cos)
        out.extend(top)
    return pd.DataFrame(out).sort_values(
        ["query_idx", "cos"], ascending=[True, False]).reset_index(drop=True)


def _spread_sample(ds, emb_col: str, sample_size: int,
                   seed: int) -> np.ndarray:
    """Bounded training sample drawn from EVERY block, not a
    positional head: ``ds.limit(n)`` reads the first blocks only, so
    sorted/clustered storage (the normal case for a written corpus)
    would hand k-means a single region of the space. Each batch
    contributes a deterministic, seeded slice; the driver concatenates
    ALL contributions and seeded-downsamples to ``sample_size`` (a
    bare ``limit`` would again truncate in block order — review
    finding). Driver ingress is bounded by blocks x per-batch take x
    vector bytes; repartition first if the dataset has millions of
    blocks."""
    def part(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({emb_col: []})
        # deterministic per-batch draw: seed mixed with the batch's
        # first row bytes so retries pick the same rows
        mat = np.stack(batch[emb_col].to_numpy()).astype(np.float32)
        mix = int(np.abs(mat[0]).sum() * 1e6) % (2**31)
        rng = np.random.default_rng(seed ^ mix)
        take = max(4, min(len(mat), sample_size // 64))
        idx = rng.choice(len(mat), size=min(take, len(mat)),
                         replace=False)
        return pd.DataFrame({emb_col: list(mat[np.sort(idx)])})

    rows = ds.map_batches(part, batch_format="pandas").to_pandas()
    mat = np.stack(rows[emb_col].to_numpy()).astype(np.float32)
    if len(mat) > sample_size:
        rng = np.random.default_rng(seed)
        mat = mat[np.sort(rng.choice(len(mat), size=sample_size,
                                     replace=False))]
    return mat


def train_ivf_centroids(ds, emb_col: str, num_cells: int = 64,
                        sample_size: int = 10_000, iters: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Coarse centroids: seeded k-means on a block-spread sample
    (``_spread_sample``), optionally sharpened against the FULL
    dataset with :func:`refine_ivf_centroids`. Training cost is
    independent of dataset size — the centroids are then broadcast to
    the assign stage."""
    mat = _normalize(_spread_sample(ds, emb_col, sample_size, seed))
    # farthest-point (k-means++-style, deterministic) seeding: random
    # seeds routinely drop two centroids into one cluster and leave
    # another uncovered — a local optimum Lloyd cannot escape
    rng = np.random.default_rng(seed)
    k = min(num_cells, len(mat))
    first = int(rng.integers(len(mat)))
    chosen = [first]
    best_sim = mat @ mat[first]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        np.minimum(best_sim, mat @ mat[nxt], out=best_sim)
    cent = mat[np.array(chosen)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            sel = mat[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def refine_ivf_centroids(ds, emb_col: str, centroids: np.ndarray,
                         iters: int = 2) -> np.ndarray:
    """Distributed Lloyd refinement of the coarse centroids over the
    FULL dataset: each batch assigns its vectors to the nearest
    centroid and emits per-cell (sum, count) partials — num_cells x
    dim floats per block, merged on the driver (sums are associative,
    so this is the standard partial-aggregation combiner; driver state
    is O(cells x dim), never O(rows)). Empty cells keep their previous
    centroid. Spherical k-means update (mean renormalized) to match
    the cosine metric used everywhere else."""
    import pickle

    import ray

    cent = _normalize(np.asarray(centroids, dtype=np.float32).copy())
    k, dim = cent.shape
    for _ in range(iters):
        ref = ray.put(cent)

        def part(batch: pd.DataFrame) -> pd.DataFrame:
            import pickle as _p

            from ..functions.runtime import pin_worker_threads

            pin_worker_threads()
            c = ray.get(ref)
            if not len(batch):
                return pd.DataFrame({"p": [_p.dumps((
                    np.zeros((len(c), c.shape[1]), dtype=np.float64),
                    np.zeros(len(c), dtype=np.int64)))]})
            mat = _normalize(
                np.stack(batch[emb_col].to_numpy()).astype(np.float32))
            a = (mat @ c.T).argmax(axis=1)
            sums = np.zeros((len(c), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pd.DataFrame(
                {"p": [pickle.dumps((sums, counts))]})

        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(part, batch_format="pandas") \
                .iter_batches(batch_format="pandas", batch_size=256):
            for blob in b["p"]:
                s, n = pickle.loads(bytes(blob))
                sums += s
                counts += n
        nz = counts > 0
        upd = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(upd, axis=1, keepdims=True)
        cent[nz] = (upd / np.maximum(norms, 1e-12)).astype(np.float32)
    return cent


def ivf_assign(ds, id_col: str, emb_col: str, centroids: np.ndarray):
    """Add an IVF ``cell`` column (nearest centroid) to each vector —
    the partitioned index layout; write_parquet(partition_cols=["cell"])
    makes per-cell probing a pruned read."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float32))

    def assign(batch: pd.DataFrame):
        import pyarrow as pa

        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        cent = ray.get(ref)
        raw = np.stack(batch[emb_col].to_numpy()).astype(np.float32)
        cell = (_normalize(raw) @ cent.T).argmax(axis=1).astype(np.int32)
        # plain Arrow fixed-size-list output (NOT the tensor-extension
        # dtype a pandas ndarray column would produce — the extension's
        # pandas metadata poisons plain parquet read-back of the index)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(raw.reshape(-1)), raw.shape[1])
        return pa.table({id_col: pa.array(batch[id_col].to_numpy()),
                         "cell": pa.array(cell), emb_col: emb})

    return ds.map_batches(assign, batch_format="pandas")


def ivf_topk(assigned, id_col: str, emb_col: str, centroids: np.ndarray,
             queries: np.ndarray, k: int = 10, nprobe: int = 4) -> pd.DataFrame:
    """Approximate top-k: probe only the ``nprobe`` cells nearest each
    query. Filter (vectorized per batch) + the brute-force scorer over
    the surviving ~nprobe/C fraction of vectors. NOTE: this still scans
    every block to evaluate the row filter — the genuinely pruned read
    at scale is ``ivf_write_index`` + ``ivf_topk_pruned``."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    cent = _normalize(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe.reshape(-1))

    filtered = assigned.filter(
        expr=f"cell in {sorted(int(c) for c in wanted)}")
    return brute_force_topk(filtered, id_col, emb_col, qn, k=k)


def probe_cells(centroids: np.ndarray, queries: np.ndarray,
                nprobe: int) -> np.ndarray:
    """Cell ids the queries need: ``nprobe`` nearest centroids each."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    cent = _normalize(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    return np.unique(probe.reshape(-1))


def ivf_write_index(assigned, path: str) -> None:
    """Persist the assigned vectors hive-partitioned by cell — one
    directory per cell, so probing is a PRUNED read (only the probed
    cells' files ever open; unprobed cells cost zero I/O)."""
    assigned.write_parquet(path, partition_cols=["cell"])


def ivf_topk_pruned(index_path: str, id_col: str, emb_col: str,
                    centroids: np.ndarray, queries: np.ndarray,
                    k: int = 10, nprobe: int = 4,
                    dtype=np.float32) -> pd.DataFrame:
    """Approximate top-k over a persisted partitioned IVF index: read
    ONLY the probed cells' directories (O(N * nprobe / C) bytes off
    storage — the scale path promised by ``ivf_assign``'s docstring)."""
    import os

    import ray.data as rd

    import glob

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    wanted = probe_cells(centroids, qn, nprobe)
    files = []
    for c in wanted:
        d = os.path.join(index_path, f"cell={int(c)}")
        if os.path.isdir(d):
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        return pd.DataFrame(columns=["query_idx", id_col, "cos"])
    ds = rd.read_parquet(files, columns=[id_col, emb_col])
    return brute_force_topk(ds, id_col, emb_col, queries, k=k, dtype=dtype)
