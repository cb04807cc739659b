"""Skew detection + mitigation before shuffle-heavy stages.

North-rule requirement (SURVEY.md §4 'Skew / stragglers'): hot keys
(domains) and oversized records (html blobs) are detected from cheap
statistics — Parquet row-group metadata for size skew, a per-batch
top-k counter sweep for key skew — and mitigated by SALTING: a hot key
is split into ``salt_factor`` sub-keys before the shuffle and the
partial aggregates are re-merged after (exact for associative
aggregations like count/XOR; the reference instead caps slice size at
checkpoint-merge time, ``CheckPointSwapRegister.java:311-341``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.sketches import TopCounter


def row_group_size_histogram(meta) -> pd.DataFrame:
    """Per-row-group (rows, bytes, bytes/row) from a TableMeta —
    flags groups whose avg row size is an outlier (oversized html)."""
    df = pd.DataFrame({"rows": meta.row_group_rows,
                       "bytes": meta.row_group_bytes})
    if not len(df):
        return df.assign(bytes_per_row=[], oversized=[])
    df["bytes_per_row"] = df["bytes"] / df["rows"].clip(lower=1)
    med = df["bytes_per_row"].median()
    df["oversized"] = df["bytes_per_row"] > 4 * max(med, 1.0)
    return df


def detect_hot_keys(ds, key_col: str, threshold_frac: float = 0.01,
                    cap: int = 10_000) -> pd.DataFrame:
    """Keys holding more than ``threshold_frac`` of total rows.

    One streaming pass: per-batch value_counts partials merged into a
    capped TopCounter on the driver (heavy hitters survive capping by
    mass). Returns (key, n, frac) sorted by frac desc.
    """
    import pickle

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column(key_col).value_counts()
        c = TopCounter(cap=cap)
        c.add(vc.field("values").to_numpy(zero_copy_only=False),
              vc.field("counts").to_numpy())
        return pa.table({"p": pa.array([pickle.dumps((c, batch.num_rows))],
                                       pa.large_binary())})

    total = 0
    merged = TopCounter(cap=cap)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        c, n = pickle.loads(row["p"])
        merged = merged.merge(c)
        total += n
    if total == 0:
        return pd.DataFrame(columns=["key", "n", "frac"])
    df = pd.DataFrame([{"key": k, "n": v} for k, v in merged.counts.items()])
    df["frac"] = df["n"] / total
    hot = df[df["frac"] >= threshold_frac]
    return hot.sort_values("frac", ascending=False).reset_index(drop=True)


def add_salted_key(ds, key_col: str, hot_keys: list, salt_factor: int = 8,
                   out_col: str = "salted_key"):
    """Append ``salted_key``: hot keys get a rotating salt suffix
    (uniform via row-index hash), cold keys pass through. Groupbys on
    the salted key then need a second tiny re-merge groupby on the
    original key — exact for associative/commutative aggregates."""
    import pyarrow.compute as pc

    from ..functions.hashing import _splitmix64

    hot_arr = pa.array(sorted(set(map(str, hot_keys))), pa.large_string())
    suffixes = np.array([f"#s{i}" for i in range(salt_factor)], dtype=object)

    def salt(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keys = col.cast(pa.large_string())
        n = len(keys)
        if len(hot_arr):
            is_hot = pc.is_in(keys, value_set=hot_arr) \
                .to_numpy(zero_copy_only=False)
        else:
            is_hot = np.zeros(n, dtype=bool)
        if is_hot.any():
            # uniform rotating salt from the row position (splitmix64 of
            # the batch-local index — no string concat, no Python loop)
            salts = (_splitmix64(np.arange(n, dtype=np.uint64))
                     % np.uint64(salt_factor)).astype(np.int64)
            suffix = np.where(is_hot, suffixes[salts], "")
            salted = pc.binary_join_element_wise(
                keys, pa.array(suffix, pa.large_string()),
                pa.scalar("", pa.large_string()),
                null_handling="replace", null_replacement="")
        else:
            salted = keys
        return batch.append_column(out_col, salted)

    return ds.map_batches(salt, batch_format="pyarrow")


def unsalt_counts(df: pd.DataFrame, key_col: str, n_col: str = "n"
                  ) -> pd.DataFrame:
    """Second-phase re-merge: strip the salt suffix and re-aggregate
    (driver-side — salted groups per hot key = salt_factor rows)."""
    base = df[key_col].astype(str).str.replace(r"#s\d+$", "", regex=True)
    out = df.assign(**{key_col: base}).groupby(key_col, as_index=False)[n_col].sum()
    return out


def detect_hot_domains(ds, url_col: str, threshold_frac: float = 0.01,
                       cap: int = 10_000) -> pd.DataFrame:
    """Hot DOMAINS of a url column (north-rule skew unit): vectorized
    host extraction per batch (``textfn.extract_domain``), then the
    same capped-TopCounter heavy-hitter pass as ``detect_hot_keys``.
    Returns (key, n, frac) — feed the keys to ``add_salted_key`` on a
    derived domain column before a domain-keyed shuffle."""
    from ..functions.textfn import extract_domain

    def host(batch: pa.Table) -> pa.Table:
        # unparseable urls extract to null — drop them, else 'None'
        # shows up as a hot "domain" and dilutes every frac
        return pa.table(
            {"domain": extract_domain(batch.column(url_col)).drop_null()})

    return detect_hot_keys(
        ds.select_columns([url_col]).map_batches(host,
                                                 batch_format="pyarrow"),
        "domain", threshold_frac=threshold_frac, cap=cap)
