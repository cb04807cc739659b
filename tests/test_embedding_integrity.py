"""Embedding-column integrity report
(``checks.embedding_integrity_counts``): adversarial corruption —
null vectors, wrong dims, NaN/inf elements, all-zero vectors,
out-of-range labels, duplicate ids — counted correctly and in exact
agreement with the generated DuckDB oracle on the same rows."""

import duckdb
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.pipelines import checks
from opengauss_tools_datachecker_performance_ray.pipelines.queries import (
    EMBEDDING_INTEGRITY_EMBEDDINGS_SQL)

DIM = 4


def _corrupt_table() -> pa.Table:
    vecs = [
        [1.0, 2.0, 3.0, 4.0],            # clean
        None,                             # null vector
        [1.0, 2.0, 3.0],                  # dim mismatch
        [float("nan"), 1.0, 1.0, 1.0],    # NaN element
        [float("inf"), 1.0, 1.0, 1.0],    # inf element
        [0.0, 0.0, 0.0, 0.0],             # zero vector (right dim)
        [],                               # dim mismatch, NOT zero-norm
        [1.0, 1.0, 1.0, 1.0],             # clean but label oob
        [2.0, 2.0, 2.0, 2.0],             # clean but dup id
        [3.0, 3.0, 3.0, 3.0],             # clean but dup id
    ]
    return pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 9], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 1, 2, 3, 4, 5, 6, 42, 7, None],
                          pa.int32()),
    })


def test_counts_on_adversarial_rows(ray_session):
    ds = rd.from_arrow(_corrupt_table())
    rep = checks.embedding_integrity_counts(
        ds, "embedding", DIM, id_col="vec_id", label_col="label",
        label_lo=0, label_hi=9)
    row = rep.iloc[0]
    assert row["n_rows"] == 10
    assert row["n_null_vec"] == 1
    assert row["n_dim_mismatch"] == 2       # 3-dim and empty
    assert row["n_nonfinite"] == 2          # NaN and inf rows
    assert row["n_zero_norm"] == 1          # only the non-empty zeros
    assert row["n_label_oob"] == 1          # 42; null label skipped
    assert row["n_dup_ids"] == 2            # both rows of vec_id=9
    assert row["passed"] == 0


def test_clean_table_passes(ray_session):
    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0] * DIM, [2.0] * DIM],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 9], pa.int32()),
    })
    rep = checks.embedding_integrity_counts(
        rd.from_arrow(t), "embedding", DIM, id_col="vec_id",
        label_col="label", label_lo=0, label_hi=9)
    assert int(rep["passed"].iloc[0]) == 1
    assert int(rep.drop(columns=["n_rows", "passed"]).iloc[0].sum()) == 0


def test_sql_oracle_parity_on_corruption(ray_session):
    """The gate's SQL (dim/label constants swapped for this table's)
    over the identical corrupted rows reproduces the Ray report —
    including the NaN-vs-zero-norm disjointness rule."""
    t = _corrupt_table()
    con = duckdb.connect()
    con.register("embeddings", t)
    # label bounds [0, 9] are shared with the gate; only dim differs
    sql = EMBEDDING_INTEGRITY_EMBEDDINGS_SQL.replace("<> 64", f"<> {DIM}")
    oracle = con.execute(sql).df().astype(np.int64)
    rep = checks.embedding_integrity_counts(
        rd.from_arrow(t), "embedding", DIM, id_col="vec_id",
        label_col="label", label_lo=0, label_hi=9)
    pd.testing.assert_frame_equal(rep, oracle)


def test_empty_table(ray_session):
    t = pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32()),
    })
    rep = checks.embedding_integrity_counts(
        rd.from_arrow(t), "embedding", DIM, id_col="vec_id",
        label_col="label", label_lo=0, label_hi=9)
    assert int(rep["n_rows"].iloc[0]) == 0
    assert int(rep["passed"].iloc[0]) == 1


def test_null_elements_match_sql(ray_session):
    """NULL elements inside vectors: skipped by both predicates on
    both engines (list_filter drops NULL lambda results), so an
    all-NULL vector is zero-norm and a partially-NULL finite vector is
    clean."""
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, None, 1.0, 1.0],
                               [None, None, None, None],
                               [float("nan"), None, 1.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 2], pa.int32()),
    })
    rep = checks.embedding_integrity_counts(
        rd.from_arrow(t), "embedding", DIM, id_col="vec_id",
        label_col="label", label_lo=0, label_hi=9)
    row = rep.iloc[0]
    assert row["n_nonfinite"] == 1   # only the NaN row
    assert row["n_zero_norm"] == 1   # only the all-NULL row
    con = duckdb.connect()
    con.register("embeddings", t)
    sql = EMBEDDING_INTEGRITY_EMBEDDINGS_SQL.replace("<> 64", f"<> {DIM}")
    oracle = con.execute(sql).df().astype(np.int64)
    pd.testing.assert_frame_equal(rep, oracle)


def test_bijection_detects_both_directions(ray_session, tmp_path):
    """Injected orphans on both sides + a count mismatch all surface
    in the bijection report."""
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines.queries import (
        bijection_documents_embeddings)

    d = tmp_path / "bij"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["a"] * 4}), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 9], pa.int64()),
        "embedding": pa.array([[1.0]] * 3, pa.list_(pa.float32()))}),
        str(d / "embeddings.parquet"))
    rep = bijection_documents_embeddings(str(d)).iloc[0]
    assert rep["n_docs"] == 4 and rep["n_vecs"] == 3
    assert rep["n_docs_without_vec"] == 2   # 3, 4
    assert rep["n_vecs_without_doc"] == 1   # 9
    assert rep["bijective"] == 0
