"""Connected components (near-dup cluster/keep-one step).

Pins: star-edge generation from shared shingles (boilerplate cap,
parallel-edge dedup, both directions), min-label propagation against a
brute-force reference (multi-hop chains that need several rounds, the
round-budget semantics when the budget is too small), and the
end-to-end ``neardup_components`` verdict against the same unrolled
propagation the DuckDB oracle runs.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.stages import components


def _edges_ds(pairs):
    """Undirected pair list -> directed-both-ways edge Dataset."""
    a = [p[0] for p in pairs] + [p[1] for p in pairs]
    b = [p[1] for p in pairs] + [p[0] for p in pairs]
    return rd.from_pandas(pd.DataFrame(
        {"a": np.array(a, np.int64), "b": np.array(b, np.int64)}))


def _brute_components(pairs, nodes):
    lbl = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(lbl[a], lbl[b])
            if lbl[a] != m or lbl[b] != m:
                lbl[a] = lbl[b] = m
                changed = True
    return lbl


def _sync_rounds(pairs, nodes, rounds):
    """Synchronous min-propagation reference (the operator's exact
    semantics when the round budget binds)."""
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        new = dict(lbl)
        for a, b in pairs:
            new[a] = min(new[a], lbl[b])
            new[b] = min(new[b], lbl[a])
        lbl = new
    return lbl


def test_connected_components_chain_and_star(ray_session):
    # chain 10-11-12-13-14 (diameter 4) + star around 2 + isolated edge
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14),
             (2, 7), (2, 8), (2, 9), (40, 41)]
    nodes = sorted({x for p in pairs for x in p})
    labels, rounds, converged = components.connected_components(
        _edges_ds(pairs))
    assert converged and 1 <= rounds <= 8
    got = labels.to_pandas().set_index("n")["lbl"].to_dict()
    assert got == _brute_components(pairs, nodes)


def test_connected_components_round_budget_semantics(ray_session):
    # path of 7 nodes: min label needs 6 synchronous rounds to reach
    # the far end; with rounds=2 the result is the exact 2-round state
    pairs = [(i, i + 1) for i in range(1, 7)]
    nodes = list(range(1, 8))
    labels, rounds, converged = components.connected_components(
        _edges_ds(pairs), rounds=2)
    assert rounds == 2 and not converged
    got = labels.to_pandas().set_index("n")["lbl"].to_dict()
    assert got == _sync_rounds(pairs, nodes, 2)
    # full budget converges to one component rooted at 1
    labels, _, converged = components.connected_components(
        _edges_ds(pairs), rounds=8)
    assert converged
    assert set(labels.to_pandas()["lbl"]) == {1}


def test_connected_components_empty(ray_session):
    empty = rd.from_pandas(pd.DataFrame(
        {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}))
    labels, rounds, converged = components.connected_components(empty)
    assert converged and rounds == 0 and labels.count() == 0


def test_shingle_star_edges_cap_and_dedup(ray_session):
    shared = "alpha beta gamma delta epsilon"      # one 5-gram, 3 docs
    boiler = "zero one two three four"             # in ALL docs -> capped
    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [f"{shared} {boiler} u{i} v{i} w{i} x{i} y{i} {shared}"
                 if i < 3 else f"{boiler} u{i} v{i} w{i} x{i} y{i}"
                 for i in range(5)],
    })
    edges = components.shingle_star_edges(
        rd.from_pandas(docs).repartition(3), "doc_id", "text",
        k=5, max_docs=4).to_pandas()
    got = set(map(tuple, edges[["a", "b"]].to_numpy()))
    # the boilerplate 5-gram spans all 5 docs (> max_docs=4) and the
    # repeated shared shingle inside doc 0/1/2 dedups: only the shared
    # shingle's star 0<->1, 0<->2 (plus bridging windows between the
    # two phrases, all within docs 0..2) may appear — never doc 3/4
    assert (1, 0) in got and (0, 1) in got and (2, 0) in got
    assert not any(3 in e or 4 in e for e in got)
    assert len(got) == len(edges)  # parallel edges deduplicated


def test_neardup_components_matches_unrolled_sql(ray_session):
    # multi-hop: doc0~doc1 share phrase P, doc1~doc2 share phrase Q,
    # doc3~doc4 share R -> components {0,1,2} and {3,4}; doc5 isolated
    P = "quick brown fox jumps over"
    Q = "lazy dog sleeps all day"
    R = "pack my box with liquor"
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3, 4, 5], np.int64),
        "text": [f"{P} a0 b0 c0 d0 e0",
                 f"{P} {Q} a1 b1 c1 d1 e1",
                 f"{Q} a2 b2 c2 d2 e2",
                 f"{R} a3 b3 c3 d3 e3",
                 f"{R} a4 b4 c4 d4 e4",
                 "nothing shared here at all"],
    })
    out = components.neardup_components(
        rd.from_pandas(docs).repartition(3), "doc_id", "text",
        k=5).to_pandas().sort_values("doc_id").reset_index(drop=True)
    comp = out.set_index("doc_id")["comp"].to_dict()
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4] != comp[0]
    assert 5 not in comp
    assert out.set_index("doc_id")["keep"].to_dict() == {
        0: 1, 1: 0, 2: 0, 3: 1, 4: 0}

    from opengauss_tools_datachecker_performance_ray.pipelines.queries \
        import _neardup_components_sql

    con = duckdb.connect()
    con.register("documents", docs)
    oracle = con.execute(_neardup_components_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype(np.int64), oracle.astype(np.int64))


def test_mirror_pairs_and_keep_one_verdict(ray_session):
    # pairs form two clusters {1,2,3} (chain via 1-2, 2-3) and {7,9}
    pairs = rd.from_pandas(pd.DataFrame(
        {"a": np.array([1, 2, 7], np.int64),
         "b": np.array([2, 3, 9], np.int64)}))
    labels, _, converged = components.connected_components(
        components.mirror_pairs(pairs))
    assert converged
    out = components.keep_one_verdict(labels, "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["comp"].tolist() == [1, 1, 1, 7, 7]
    assert out["keep"].tolist() == [1, 0, 0, 1, 0]
