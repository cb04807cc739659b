"""Distributed connected components — the cluster/keep-one step of
near-duplicate dedup.

MinHash-LSH / SimHash / shared-shingle detection (``stages/dedup.py``)
emit candidate PAIRS; a curation pipeline must then group pairs into
duplicate CLUSTERS and keep one representative per cluster (Lee et al.
2022 dedup recipe; the pair→cluster step is classically solved with
label propagation à la Kiveris et al. 2014, "Connected Components in
MapReduce and Beyond"). This module implements that step Ray-Data-first:

- ``shingle_star_edges`` derives a deterministic, SQL-reproducible
  edge set from the corpus itself: two documents are connected when
  they share a k-token shingle that appears in between ``min_docs``
  and ``max_docs`` distinct documents (the upper cap drops boilerplate
  shingles the same way CCNet drops super-common lines — a shingle in
  thousands of documents is a stop-phrase, not evidence of copying).
  Star edges (member ↔ min-doc hub per shingle) keep the edge count
  linear in group size instead of quadratic, with identical
  connectivity.
- ``connected_components`` runs synchronous min-label propagation:
  every round each node's label becomes the min of its own and its
  neighbours' labels. Labels decrease monotonically, so the total
  label sum is a convergence certificate (unchanged sum == fixed
  point). A fixed round budget keeps the operator deterministic and
  lets an unrolled-SQL oracle value-match it exactly; propagation
  reaches a fixed point in O(graph diameter) rounds and near-dup
  clusters are shallow (a star-of-stars), so the default budget of 8
  converges in practice — callers can read the returned round count.

Scale shape: document text never leaves the first scan (16-byte
``(id, shingle_hash)`` pairs move, as in ``span_dup_scores``); each
round is two groupby shuffles over the EDGE set only — nodes that
share no shingle never enter the graph. Everything streams; the only
driver values are the per-round label sums (one int each).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import explode_shingle_pairs

logger = logging.getLogger(__name__)


def shingle_star_edges(ds, id_col: str, text_col: str, *, k: int = 5,
                       min_docs: int = 2, max_docs: int = 64):
    """Directed (both ways), deduplicated star edges ``(a, b)`` between
    documents sharing a qualifying k-token shingle (see module doc).

    One explode pass (text stays put), one groupby(shingle) that emits
    member↔hub pairs for qualifying shingles, one groupby(a) that
    deduplicates parallel edges (near-identical documents share
    hundreds of shingles; without this the message volume of every
    propagation round multiplies by that factor). An over-``max_docs``
    shingle group still co-locates in one task before being dropped —
    at 16 B/row even a million-document boilerplate shingle is ~16 MB,
    an accepted bound (same note as ``dedup.capped_group_keys``).
    """
    pairs = ds.map_batches(
        lambda b: explode_shingle_pairs(b, id_col, text_col, k=k),
        batch_format="pyarrow")

    def star(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(dtype=np.int64)
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64)})
        # rows are distinct (doc, shingle) pairs, so len(g) per shingle
        # IS the distinct-document count
        if not (min_docs <= len(ids) <= max_docs):
            return empty
        hub = ids.min()
        mem = ids[ids != hub]
        # both directions so one groupby key column serves propagation
        return pd.DataFrame({
            "a": np.concatenate([mem, np.full(len(mem), hub)]),
            "b": np.concatenate([np.full(len(mem), hub), mem])})

    def dedup_parallel(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return pairs.groupby("sh").map_groups(star, batch_format="pandas") \
        .groupby("a").map_groups(dedup_parallel, batch_format="pandas")


def connected_components(edges, *, rounds: int = 8):
    """Min-label propagation over directed edge Dataset ``(a, b)``
    (both directions present). Returns ``(labels, rounds_run,
    converged)`` where ``labels`` is a Dataset ``(n, lbl)`` with one
    row per node and ``lbl`` the component label after at most
    ``rounds`` synchronous rounds (== the component's min node id once
    converged).

    Each round is a reduce-side join expressed as a tagged union —
    label rows ``(key=n, t=0, v=lbl)`` and edge rows ``(key=a, t=1,
    v=b)`` co-group on ``key``; each group forwards its label to every
    neighbour plus itself, and a ``groupby(n).min`` folds the messages.
    The tag/value encoding keeps every column non-null int64 (no
    schema-widening unions). Labels materialize once per round —
    bounded by the node count, never the corpus.
    """
    from ray.data.aggregate import Min

    edges = edges.materialize()
    if edges.count() == 0:
        empty = pd.DataFrame({"n": pd.Series(dtype=np.int64),
                              "lbl": pd.Series(dtype=np.int64)})
        import ray
        return ray.data.from_pandas(empty), 0, True

    labels = edges.select_columns(["a"]).groupby("a").aggregate(
        Min("a", alias_name="lbl")) \
        .map_batches(lambda b: pa.table({"n": b.column("a"),
                                         "lbl": b.column("lbl")}),
                     batch_format="pyarrow").materialize()

    def tag_labels(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({"key": b.column("n"), "t": pa.array(z),
                         "v": b.column("lbl")})

    def tag_edges(b: pa.Table) -> pa.Table:
        o = np.ones(b.num_rows, dtype=np.int64)
        return pa.table({"key": b.column("a"), "t": pa.array(o),
                         "v": b.column("b")})

    def msgs(g: pd.DataFrame) -> pd.DataFrame:
        t = g["t"].to_numpy()
        lbl = int(g.loc[t == 0, "v"].min())  # exactly one label row
        dst = g.loc[t == 1, "v"].to_numpy(dtype=np.int64)
        n = np.concatenate([dst, [int(g["key"].iloc[0])]])
        return pd.DataFrame({"n": n,
                             "lbl": np.full(len(n), lbl, dtype=np.int64)})

    prev_sum = labels.sum("lbl")
    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow").materialize()
    converged = False
    r = 0
    for r in range(1, rounds + 1):
        labels = labels.map_batches(tag_labels, batch_format="pyarrow") \
            .union(tagged_edges) \
            .groupby("key").map_groups(msgs, batch_format="pandas") \
            .groupby("n").aggregate(Min("lbl", alias_name="lbl")) \
            .materialize()
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:  # monotone ⇒ fixed point reached
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        logger.info("connected_components: round budget %d exhausted "
                    "before the label sum stabilised (deep component "
                    "chain); labels are the round-%d state", rounds, r)
    return labels, r, converged


def mirror_pairs(pairs, a_col: str = "a", b_col: str = "b"):
    """Undirected candidate pairs (a < b) -> directed-both-ways edge
    Dataset for ``connected_components``."""

    def mirror(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False)
        b = batch.column(b_col).to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.concatenate([a, b])),
                         "b": pa.array(np.concatenate([b, a]))})

    return pairs.map_batches(mirror, batch_format="pyarrow")


def keep_one_verdict(labels, id_col: str):
    """Label Dataset ``(n, lbl)`` -> ``(id_col, comp, keep)`` where
    ``keep=1`` marks the component representative (min id)."""

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        lbl = b.column("lbl").to_numpy(zero_copy_only=False)
        return pa.table({id_col: b.column("n"), "comp": b.column("lbl"),
                         "keep": pa.array((n == lbl).astype(np.int64))})

    return labels.map_batches(finish, batch_format="pyarrow")


def neardup_components(ds, id_col: str, text_col: str, *, k: int = 5,
                       min_docs: int = 2, max_docs: int = 64,
                       rounds: int = 8):
    """Shared-shingle near-dup clusters with a keep-one verdict:
    ``(id_col, comp, keep)`` for every document in at least one edge
    (documents sharing no qualifying shingle are trivially kept and
    absent, matching the SQL oracle). ``keep=1`` marks the component
    representative (min id)."""
    edges = shingle_star_edges(ds, id_col, text_col, k=k,
                               min_docs=min_docs, max_docs=max_docs)
    labels, _, _ = connected_components(edges, rounds=rounds)
    return keep_one_verdict(labels, id_col)
