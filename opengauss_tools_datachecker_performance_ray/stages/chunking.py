"""Sliding-window token chunking: the context-window preparation step
(split long documents into ``window``-token chunks every ``stride``
tokens, overlapping when stride < window) that precedes tokenization
in every long-context training recipe.

Counterpart to ``stages/packing.py`` (which CONCATENATES short docs
up to a budget; this SPLITS long ones). Fully vectorized per batch:
token lists come from one Arrow ``split_pattern``, per-window token
index ranges are built with repeat/arange arithmetic over the list
offsets, one ``take`` gathers every window's tokens, and one
``binary_join`` reassembles window text — no per-document Python
loop. Embarrassingly parallel flat map; nothing shuffles at any
corpus size, so the stage streams at 100 TB like any other scan.

Window-count rule (shared with the SQL oracle, integer-exact):
``c = 1 if n <= window else (n - window + stride - 1) // stride + 1``
— every token is covered, the final window may be shorter, empty and
null texts contribute no windows (same convention as
``dedup._explode_lines``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _grouped_arange


def window_chunks(ds, id_col: str, text_col: str,
                  window: int, stride: int | None = None,
                  carry_cols: list[str] | None = None,
                  batch_size: int | None = None):
    """Dataset of (id[, carry...], win_no, n_tok, win_text) rows — one
    row per sliding window of ``window`` space-separated tokens
    advancing by ``stride`` (default: no overlap). ``carry_cols``
    replicate per-document metadata (source, lang) onto every window
    row."""
    if window <= 0:
        raise ValueError("window must be positive")
    s = window if stride is None else int(stride)
    if s <= 0:
        raise ValueError("stride must be positive")
    if s > window:
        # the window-count rule guarantees full coverage; a stride
        # past the window would skip tokens (and drives the start
        # index past short docs — negative window lengths)
        raise ValueError("stride must be <= window")

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        ok = pc.and_(pc.is_valid(txt), pc.not_equal(txt, ""))
        batch = batch.filter(ok)
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lists = pc.split_pattern(txt, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = np.asarray(lists.offsets, dtype=np.int64)
        values = lists.values
        n = np.diff(offsets)  # tokens per doc
        c = np.where(n <= window, 1, (n - window + s - 1) // s + 1)
        doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), c)
        win_no = _grouped_arange(c)
        starts = win_no * s                      # token index in doc
        length = np.minimum(window, n[doc_idx] - starts)
        # gather indices: each window's token range, doc-base offset
        base = offsets[:-1][doc_idx] + starts
        gather = np.repeat(base, length) + _grouped_arange(length)
        win_offsets = np.concatenate(([0], np.cumsum(length)))
        win_vals = values.take(pa.array(gather, pa.int64()))
        sep = pa.scalar(" ", pa.large_string()) \
            if pa.types.is_large_string(win_vals.type) else " "
        win_text = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(win_offsets, pa.int64()), win_vals), sep)
        cols = {id_col: pa.array(ids[doc_idx])}
        take_idx = pa.array(doc_idx, pa.int64())
        for cc in carry_cols or []:
            cols[cc] = batch.column(cc).take(take_idx)
        cols["win_no"] = pa.array(win_no, pa.int64())
        cols["n_tok"] = pa.array(length, pa.int64())
        cols["win_text"] = win_text
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=batch_size)
