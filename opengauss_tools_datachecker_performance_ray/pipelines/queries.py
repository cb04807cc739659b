"""Driver-contract query suite over the /root/testdata tables.

Each function here backs one ``__ray_entry__.queries()`` entry
(SURVEY.md §2 coverage) and — where SQL-expressible — one
``oracle_sql()`` entry with IDENTICAL output column names, so the
driver's row-count + schema + order-insensitive value-hash compare
passes. Output columns avoid accumulated floats (sum/avg of double is
order-dependent in the last ulp across distributed batches); integer
aggregates and element-exact min/max only in oracle-matched queries.

All callables take ``sf_dir`` and return a Dataset / DataFrame /
pyarrow Table; none touches ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textfn
from ..stages import compare as cmp
from ..stages.digest import DigestConfig
from ..stages.profile import profile_dataset
from . import checks

TOKEN_RE = r"[A-Za-z0-9_']+"  # same regex on Ray (python re) and DuckDB (RE2)


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _with_schema(ds, columns: list[str], dtypes: dict | None = None) -> pd.DataFrame:
    """Materialize a (possibly empty) Dataset to pandas with a
    guaranteed column set — an empty Ray Dataset loses its schema on
    ``to_pandas``, which would fail the driver's schema compare."""
    df = ds.to_pandas()
    if df.empty and list(df.columns) != columns:
        df = pd.DataFrame({c: pd.Series(dtype=(dtypes or {}).get(c, object))
                           for c in columns})
    return df[columns]


# ---------------------------------------------------------------------------
# Column stats (SURVEY.md §2.5 A-ext)
# ---------------------------------------------------------------------------

def stats_documents(sf_dir: str) -> pd.DataFrame:
    """Exact table stats, fully scale-safe: scalar aggregates via
    per-batch partials merged on the driver (a few numbers per block),
    low-cardinality distinct (lang) via per-batch unique-set partials,
    and the near-unique distinct (doc_id) via the distributed exact
    distinct count (bucketed groupby — the driver never sees the key
    column; round-1 verdict item). The one-pass HLL estimate lives in
    ``hll_profile_documents``."""
    # doc_id deliberately NOT in this read: the scalar partial never
    # touches it; the distinct count does its own single-column scan
    ds = _read(sf_dir, "documents", ["text", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pickle

        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        rec = {
            "cnt": batch.num_rows,
            "text_nonnull": batch.num_rows - batch.column("text").null_count,
            "min_chars": pc.min(batch.column("n_chars")).as_py(),
            "max_chars": pc.max(batch.column("n_chars")).as_py(),
            # lang cardinality is tiny and bounded — exact sets are safe
            "langs": set(pc.unique(lang.drop_null()).to_pylist()),
        }
        return pa.table({"p": pa.array([pickle.dumps(rec)], pa.large_binary())})

    import pickle

    from ..functions.runtime import run_concurrently

    # the scalar-partial scan and the distinct-count scan are
    # independent — run them as concurrent driver executions
    rows, distinct_doc = run_concurrently(
        lambda: ds.map_batches(partial, batch_format="pyarrow").take_all(),
        lambda: checks.exact_distinct_count(
            _read(sf_dir, "documents", ["doc_id"]), "doc_id"))
    parts = [pickle.loads(r["p"]) for r in rows]
    langs = set()
    for p in parts:
        langs |= p["langs"]
    mins = [p["min_chars"] for p in parts if p["min_chars"] is not None]
    maxs = [p["max_chars"] for p in parts if p["max_chars"] is not None]
    return pd.DataFrame([{
        "cnt": sum(p["cnt"] for p in parts),
        "text_nonnull": sum(p["text_nonnull"] for p in parts),
        "min_chars": min(mins) if mins else None,
        "max_chars": max(maxs) if maxs else None,
        "distinct_lang": len(langs),
        "distinct_doc": distinct_doc,
    }])


STATS_DOCUMENTS_SQL = """
SELECT count(*) AS cnt,
       count(text) AS text_nonnull,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       count(DISTINCT lang) AS distinct_lang,
       count(DISTINCT doc_id) AS distinct_doc
FROM documents
"""


def stats_by_lang(sf_dir: str):
    """Per-group rollup (A5 analog) — partial aggregation then a small
    groupby over ~|langs| rows."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="cnt"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"))


STATS_BY_LANG_SQL = """
SELECT lang, count(*) AS cnt,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


def events_by_type(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Count(alias_name="cnt"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS cnt,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type
"""


def hll_profile_documents(sf_dir: str) -> pd.DataFrame:
    """HLL distinct estimates VALIDATED against the exact distributed
    distinct count (round-3 verdict #3d): per column of ``documents``
    emits (col, n_rows, n_nulls, exact_distinct, hll_ok) where
    ``exact_distinct`` comes from ``checks.exact_distinct_counts`` (all
    five columns in ONE tagged pass — two table scans total, not six;
    review finding) and ``hll_ok`` asserts the seeded HLL estimate
    inside max(±2σ, ±3) of exact: σ = 1.04/√m is the published HLL
    standard error (m = 2^14 registers), and the absolute ±3 floor
    covers the linear-counting regime at tiny cardinalities, where one
    discrete register collision costs ~1 and would otherwise dwarf the
    asymptotic band (review finding). Every column is integer/bool, so
    the row value-hashes against the SQL oracle — the sketch's
    accuracy contract is part of the correctness gate instead of a
    rows-only entry."""
    ds = _read(sf_dir, "documents")
    profs = profile_dataset(ds)
    exact_all = checks.exact_distinct_counts(
        _read(sf_dir, "documents", sorted(profs)), sorted(profs))
    rows = []
    for name in sorted(profs):
        p = profs[name]
        exact = exact_all[name]
        est = p.hll.estimate()
        sigma = 1.04 / np.sqrt(p.hll.m)
        band = max(2.0 * sigma * max(exact, 1), 3.0)
        rows.append({
            "col": name,
            "n_rows": np.int64(p.count),
            "n_nulls": np.int64(p.nulls),
            "exact_distinct": np.int64(exact),
            "hll_ok": bool(abs(est - exact) <= band),
        })
    return pd.DataFrame(rows)


HLL_PROFILE_DOCUMENTS_SQL = """
SELECT col, n_rows, n_nulls, exact_distinct, TRUE AS hll_ok FROM (
  SELECT 'doc_id' AS col, count(*)::BIGINT AS n_rows,
         (count(*) - count(doc_id))::BIGINT AS n_nulls,
         count(DISTINCT doc_id)::BIGINT AS exact_distinct FROM documents
  UNION ALL
  SELECT 'lang', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
         count(DISTINCT lang)::BIGINT FROM documents
  UNION ALL
  SELECT 'n_chars', count(*)::BIGINT, (count(*) - count(n_chars))::BIGINT,
         count(DISTINCT n_chars)::BIGINT FROM documents
  UNION ALL
  SELECT 'source', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
         count(DISTINCT source)::BIGINT FROM documents
  UNION ALL
  SELECT 'text', count(*)::BIGINT, (count(*) - count(text))::BIGINT,
         count(DISTINCT text)::BIGINT FROM documents
)
"""


# ---------------------------------------------------------------------------
# Uniqueness (SURVEY.md §2.7 north-star extension)
# ---------------------------------------------------------------------------

def uniqueness_lineitem(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    return checks.uniqueness_violations(ds, ["l_orderkey"])


UNIQUENESS_LINEITEM_SQL = """
SELECT l_orderkey, count(*) AS n FROM lineitem
GROUP BY l_orderkey HAVING count(*) > 1
"""


def uniqueness_orders(sf_dir: str):
    """Unique PK — expected empty result (edge-case coverage)."""
    ds = _read(sf_dir, "orders", ["o_orderkey"])
    out = checks.uniqueness_violations(ds, ["o_orderkey"])
    return _with_schema(out, ["o_orderkey", "n"],
                        {"o_orderkey": np.int64, "n": np.int64})


UNIQUENESS_ORDERS_SQL = """
SELECT o_orderkey, count(*) AS n FROM orders
GROUP BY o_orderkey HAVING count(*) > 1
"""


def uniqueness_lineitem_composite(sf_dir: str):
    """Composite key (l_orderkey, l_linenumber) — expected unique."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return checks.uniqueness_violations(ds, ["l_orderkey", "l_linenumber"])


UNIQUENESS_LINEITEM_COMPOSITE_SQL = """
SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem
GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Referential integrity (SURVEY.md §2.4 north-star extension)
# ---------------------------------------------------------------------------

def referential_orders_customer(sf_dir: str):
    child = _read(sf_dir, "orders", ["o_custkey"])
    parent = _read(sf_dir, "customer", ["c_custkey"])
    out = checks.referential_violations(child, "o_custkey",
                                        parent, "c_custkey")
    return _with_schema(out, ["o_custkey"], {"o_custkey": np.int64})


REFERENTIAL_ORDERS_CUSTOMER_SQL = """
SELECT o_custkey FROM orders
WHERE o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


def referential_events_smallparent(sf_dir: str):
    """Dangling FK values (parent restricted to c_custkey < 100 so
    violations actually exist in the synthetic data)."""
    child = _read(sf_dir, "events", ["user_id"])
    parent = _read(sf_dir, "customer", ["c_custkey"]) \
        .filter(expr="c_custkey < 100")
    out = checks.referential_violations(child, "user_id",
                                        parent, "c_custkey")
    return _with_schema(out, ["user_id"], {"user_id": np.int64})


REFERENTIAL_EVENTS_SMALLPARENT_SQL = """
SELECT user_id FROM events
WHERE user_id IS NOT NULL
  AND user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 100)
"""


def referential_lineitem_orders_partitioned(sf_dir: str):
    """Hash-partitioned anti-join path (large-parent variant)."""
    child = _read(sf_dir, "lineitem", ["l_orderkey"])
    parent = _read(sf_dir, "orders", ["o_orderkey"])
    # plain-partitioned showcase: bloom declined explicitly (child
    # outnumbers parent), which also skips the routing count() pair
    out = checks.referential_violations_partitioned(
        child, "l_orderkey", parent, "o_orderkey", num_buckets=32,
        bloom_prune=False)
    return _with_schema(out, ["l_orderkey"], {"l_orderkey": object})


REFERENTIAL_LINEITEM_ORDERS_PARTITIONED_SQL = """
SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey FROM lineitem
WHERE l_orderkey IS NOT NULL
  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def referential_bloom_pruned(sf_dir: str):
    """Bloom semi-join route (``functions/bloom.py``): the parent side
    is ~4-6x the child, so ``bloom_prune`` auto-engages — a bloom
    filter over the child keys drops unreferenced parents BEFORE the
    anti-join shuffle. Bloom filters have no false negatives, so the
    violation set is bit-identical to the plain anti-join (the oracle
    below is the plain anti-join SQL)."""

    def child_slice(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey").to_numpy()
        return batch.filter(pa.array(key % 64 == 0)).select(["o_custkey"])

    def parent_slice(batch: pa.Table) -> pa.Table:
        key = batch.column("c_custkey").to_numpy()
        return batch.filter(pa.array(key % 3 != 0))

    child = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(child_slice, batch_format="pyarrow")
    parent = _read(sf_dir, "customer", ["c_custkey"]) \
        .map_batches(parent_slice, batch_format="pyarrow")
    # derived inputs: .count() would re-execute the whole filter
    # pipeline, so size the bloom from the parquet footer + the known
    # 1/64 filter fraction and request the route explicitly
    import pyarrow.parquet as pq

    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    out = checks.referential_violations_partitioned(
        child, "o_custkey", parent, "c_custkey", num_buckets=16,
        bloom_prune=True, n_child=max(1, n_orders // 64))
    return _with_schema(out, ["o_custkey"], {"o_custkey": object})


REFERENTIAL_BLOOM_PRUNED_SQL = """
SELECT CAST(o_custkey AS VARCHAR) AS o_custkey FROM orders
WHERE o_orderkey % 64 = 0 AND o_custkey IS NOT NULL
  AND o_custkey NOT IN (SELECT c_custkey FROM customer
                        WHERE c_custkey % 3 <> 0)
"""


def line_dedup_documents(sf_dir: str):
    """C4/CCNet-style line-level exact dedup over the documents corpus
    (``stages.dedup.line_dedup``). The synthetic corpus carries no
    newlines, so "lines" are fixed 10-token windows (the operator's
    ``tokens_per_line`` mode); every non-first occurrence of a window
    across the whole corpus is removed and documents are rebuilt from
    their surviving windows. The dedup shuffle ships 24 B/line
    fingerprints, never text; the loser set broadcasts and documents
    rebuild in one stateless second pass."""
    from ..stages import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = dedup.line_dedup(ds, "doc_id", "text", tokens_per_line=10)
    df = _with_schema(out, ["doc_id", "text"],
                      {"doc_id": np.int64, "text": object})
    return df.sort_values("doc_id").reset_index(drop=True)


LINE_DEDUP_DOCUMENTS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents WHERE text IS NOT NULL AND text <> ''
), lines AS (
  SELECT doc_id, (i - 1) // 10 AS line_no,
         string_agg(w, ' ' ORDER BY i) AS line
  FROM toks GROUP BY doc_id, (i - 1) // 10
), winners AS (
  SELECT doc_id, line_no, line FROM lines
  QUALIFY row_number() OVER (PARTITION BY line
                             ORDER BY doc_id, line_no) = 1
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
FROM winners GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Table-pair compare (the flagship, SURVEY.md §2.4 J1-J3)
# ---------------------------------------------------------------------------

ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderdate", "o_orderpriority"]


def _orders_sink_batch(batch: pa.Table) -> pa.Table:
    """Derived sink: drop keys %97==0 (-> insert), bump price where
    %89==0 (-> update), append remapped keys %101==0 (-> delete)."""
    key = batch.column("o_orderkey").to_numpy()
    keep = key % 97 != 0
    kept = batch.filter(pa.array(keep))
    kkey = kept.column("o_orderkey").to_numpy()
    price = kept.column("o_totalprice").to_numpy().copy()
    price = np.where(kkey % 89 == 0, price + 1.0, price)
    kept = kept.set_column(kept.schema.get_field_index("o_totalprice"),
                           "o_totalprice", pa.array(price, pa.float64()))
    extra_mask = key % 101 == 0
    extra = batch.filter(pa.array(extra_mask))
    if extra.num_rows:
        new_keys = extra.column("o_orderkey").to_numpy() + 100_000_000
        extra = extra.set_column(extra.schema.get_field_index("o_orderkey"),
                                 "o_orderkey", pa.array(new_keys, pa.int64()))
        return pa.concat_tables([kept, extra])
    return kept


def _num_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def compare_orders_pair(sf_dir: str) -> pd.DataFrame:
    source = _read(sf_dir, "orders", ORDER_COLS)
    sink = _read(sf_dir, "orders", ORDER_COLS) \
        .map_batches(_orders_sink_batch, batch_format="pyarrow")
    n = _num_rows(sf_dir, "orders")  # parquet footer, no extra scan
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000, bucket_capacity=64)
    res = cmp.compare_tables(source, sink, cfg, table="orders")
    v = res.violations[["key", "kind"]].sort_values(["key", "kind"])
    return v.reset_index(drop=True)


def _scaled_orders_side_builder(sf_dir: str, repeat: int):
    """Bench helper: ``repeat`` key-remapped copies of orders per side
    (simulating ``repeat`` input shards of distinct key ranges).
    Returns a ``side(transform=None) -> Dataset`` factory.

    Each task materializes ``copies`` key-remapped copies (~600k rows,
    ~0.25 cpu-s of work): 100-TB-realistic task granularity — 150k-row
    tasks are ~40ms and Ray's per-task overhead dominates them (the
    multiprocessing control in BASELINE.md runs the same kernel at
    efficiency 0.78; tiny tasks measured Ray scheduling, not the
    engine)."""
    import os as _os

    import ray.data as rd

    path = f"{sf_dir}/orders.parquet"
    copies = max(1, int(_os.environ.get("GRAFT_SHARD_COPIES", "4")))
    shards = max(1, -(-repeat // copies))  # ceil: total copies == repeat

    def load_shard(batch) -> pa.Table:
        """One task per logical shard: read the (page-cached) parquet
        and remap keys into the shard's own ranges — models a
        multi-file input honestly (one read task per file group)
        instead of serially splitting a single file's blocks on the
        driver. Low-cardinality string columns stay DICTIONARY-encoded
        end to end: the digest hashes the dictionary once and gathers
        by index, so their strings never materialize."""
        import pyarrow.parquet as pq

        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        i = int(batch["id"][0])
        t = pq.read_table(path, columns=ORDER_COLS, use_threads=False,
                          read_dictionary=["o_orderstatus",
                                           "o_orderpriority"])
        idx = t.schema.get_field_index("o_orderkey")
        k = t.column("o_orderkey").to_numpy()
        outs = []
        # the last shard carries the remainder so total copies across
        # all shards is EXACTLY `repeat` (bench throughput and
        # partition sizing divide by it)
        n_copies = min(copies, repeat - i * copies)
        for j in range(n_copies):
            shift = np.int64(i * copies + j) * 1_000_000_000
            outs.append(t.set_column(
                idx, "o_orderkey", pa.array(k + shift, pa.int64())))
        return pa.concat_tables(outs)

    def side(transform=None):
        ds = rd.range(shards, override_num_blocks=shards) \
            .map_batches(load_shard, batch_format="numpy", batch_size=None)
        if transform is not None:
            ds = ds.map_batches(transform, batch_format="pyarrow")
        return ds

    return side


def compare_orders_pair_scaled(sf_dir: str, repeat: int = 16) -> dict:
    """Bench-only scaled flagship: ``repeat`` key-remapped copies of
    orders per side. Unlike the oracle-matched ``compare_orders_pair``
    (uniform mutations that dirty every bucket — worst case), the
    injected diffs here are BUCKET-TARGETED: only rows hashing to
    bucket 0 get a mutated price, so ~1/B of buckets differ and the
    Merkle prune actually prunes — the design point of the engine
    (clean partitions cost one streaming digest pass and no join).
    Violation count still scales linearly with ``repeat``.
    """
    side = _scaled_orders_side_builder(sf_dir, repeat)
    n = _num_rows(sf_dir, "orders") * repeat
    # partitions sized for join parallelism (>= ~2 per CPU at bench
    # scale; at 10^12 rows the 1M-row default capacity gives 10^6
    # partitions and the same per-partition work). bucket_capacity
    # bounds the signature-partial volume per block (parts × B keys).
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=1024)

    from ..functions import canonical, hashing

    def mutate_bucket0(batch: pa.Table) -> pa.Table:
        """Bump price for rows whose key hashes to bucket 0 of
        partition 0 — the same khash/bucket math the digest uses, so
        diffs land in exactly ONE bucket of ONE partition: the
        rare-violation design point (everything else prunes clean;
        the classify fetch touches ~rows/(parts*buckets) rows). With
        diffs in every partition the driver-side classify of ~600k
        violation rows became the serial floor and the bench measured
        verdict rendering, not the engine."""
        keys = canonical.key_column(batch, ["o_orderkey"])
        kh = hashing.hash64(keys)
        part, bucket = hashing.assign_buckets(kh, cfg.num_partitions,
                                              cfg.buckets_per_partition)
        hit = (bucket == 0) & (part == 0)
        price = batch.column("o_totalprice").to_numpy().copy()
        price[hit] += 1.0
        return batch.set_column(
            batch.schema.get_field_index("o_totalprice"),
            "o_totalprice", pa.array(price, pa.float64()))

    # streaming (not materialized): the two digest scans are pure map
    # work that scales with cores; materialization adds object-store
    # round-trips that contend at high core counts on one node
    res = cmp.compare_tables(side(), side(mutate_bucket0), cfg,
                             table="orders_scaled")
    return res.summary


def compare_dirty10(sf_dir: str, materialize_digests=False,
                    repeat: int = 16) -> dict:
    """Bench-only A/B pair for round-3 verdict #6: ~10% of rows mutated
    UNIFORMLY across ``repeat`` key-remapped orders copies per side, so
    most buckets are dirty — the opposite of the flagship's
    prune-friendly injection. Streaming mode pays a second raw scan
    (prefiltered, but the prefilter passes almost everything at 10%
    dirty) for the classify; materialized mode classifies from the
    RETAINED digest rows and never re-reads the input. Same verdicts
    either way (pinned by
    tests/test_compare.py::TestDigestMaterializationModes); bench.py
    times both and records the A/B."""

    def mutate_10pct(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy()
        price = batch.column("o_totalprice").to_numpy().copy()
        hit = (k % 10) == 3
        price[hit] += 1.0
        return batch.set_column(
            batch.schema.get_field_index("o_totalprice"),
            "o_totalprice", pa.array(price, pa.float64()))

    side = _scaled_orders_side_builder(sf_dir, repeat)
    n = _num_rows(sf_dir, "orders") * repeat
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=1024)
    res = cmp.compare_tables(side(), side(mutate_10pct), cfg,
                             table="orders_dirty10",
                             materialize_digests=materialize_digests,
                             approx_rows=n)
    return res.summary


COMPARE_ORDERS_PAIR_SQL = """
WITH sink AS (
    SELECT o_orderkey,
           o_custkey,
           o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT CAST(COALESCE(s.o_orderkey, k.o_orderkey) AS VARCHAR) AS key,
       CASE WHEN k.o_orderkey IS NULL THEN 'insert'
            WHEN s.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS kind
FROM orders s FULL OUTER JOIN sink k ON s.o_orderkey = k.o_orderkey
WHERE k.o_orderkey IS NULL OR s.o_orderkey IS NULL
   OR s.o_custkey <> k.o_custkey
   OR s.o_orderstatus <> k.o_orderstatus
   OR s.o_totalprice <> k.o_totalprice
   OR s.o_orderdate <> k.o_orderdate
   OR s.o_orderpriority <> k.o_orderpriority
"""


def compare_documents_clean(sf_dir: str) -> pd.DataFrame:
    """Identical pair — expected zero violations, all partitions pruned
    at the Merkle root (the 99%-clean fast path)."""
    a = _read(sf_dir, "documents")
    b = _read(sf_dir, "documents")
    cfg = DigestConfig.for_rows(("doc_id",), 1000,
                                partition_capacity=250, bucket_capacity=16)
    res = cmp.compare_tables(a, b, cfg, table="documents")
    return res.violations[["key", "kind"]]


COMPARE_DOCUMENTS_CLEAN_SQL = """
SELECT CAST(a.doc_id AS VARCHAR) AS key, 'update' AS kind
FROM documents a JOIN documents b USING (doc_id)
WHERE a.text <> b.text OR a.lang <> b.lang
   OR a.source <> b.source OR a.n_chars <> b.n_chars
"""


# ---------------------------------------------------------------------------
# Dedup (training-data extensions)
# ---------------------------------------------------------------------------

def dedup_exact_documents(sf_dir: str):
    """Exact dedup by full-text content hash: representative (min doc_id)
    per distinct text. The shuffle ships (doc_id, fp, bucket) rows —
    never the text itself; buckets give fixed-width parallelism and the
    within-bucket reduce is one vectorized pandas groupby-min."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    num_buckets = 64

    def fp(batch: pa.Table) -> pa.Table:
        h = textfn.fingerprint(pd.Series(batch.column("text").to_pylist()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            # int64 reinterpret: Ray groupby keys must not be uint64
            "fp": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    keyed = ds.map_batches(fp, batch_format="pyarrow")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fp", sort=False)["doc_id"].min().reset_index(
            name="doc_id")[["doc_id"]]

    return keyed.groupby("bucket").map_groups(reduce, batch_format="pandas")


DEDUP_EXACT_DOCUMENTS_SQL = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


def events_asof_last_order(sf_dir: str):
    """As-of join (custom operator — Ray Data has none): each event
    attaches the latest order of the same customer at or before the
    event timestamp. Value-checked against DuckDB's ASOF JOIN."""
    from ..stages.joins import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "o_orderdate"])

    orders = orders.map_batches(rename, batch_format="pyarrow")
    out = asof_join(events, orders, key="user_id", left_ts="ts",
                    right_ts="o_orderdate", left_cols=["event_id"],
                    right_cols=[])
    return out.select_columns(
        ["event_id", "user_id", "ts", "o_orderdate_matched"])


EVENTS_ASOF_LAST_ORDER_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderdate AS o_orderdate_matched
FROM events e ASOF JOIN orders o
ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def events_range_join_orders(sf_dir: str):
    """Range (inequality) join via the banding composition: each event
    pairs with same-customer orders whose derived [lo, hi] interval
    contains the event's derived point value (deterministic integer
    derivations so DuckDB's inequality join is an exact oracle)."""
    from ..stages.joins import range_join

    events = _read(sf_dir, "events", ["event_id", "user_id"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def ev(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        return pa.table({"event_id": batch.column("event_id"),
                         "user_id": batch.column("user_id"),
                         "v": pa.array((eid % 1000).astype(np.int64))})

    def od(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy()
        lo = (ok % 1000).astype(np.int64)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "user_id": batch.column("o_custkey"),
                         "lo": pa.array(lo),
                         "hi": pa.array(lo + 25)})

    out = range_join(events.map_batches(ev, batch_format="pyarrow"),
                     orders.map_batches(od, batch_format="pyarrow"),
                     key="user_id", left_val="v",
                     right_lo="lo", right_hi="hi",
                     left_cols=["event_id"], right_cols=["o_orderkey"],
                     band_width=32)
    return out.select_columns(["event_id", "user_id", "v", "o_orderkey"])


EVENTS_RANGE_JOIN_ORDERS_SQL = """
SELECT e.event_id, e.user_id,
       e.event_id % 1000 AS v,
       o.o_orderkey
FROM events e JOIN orders o
  ON e.user_id = o.o_custkey
 AND e.event_id % 1000 BETWEEN o.o_orderkey % 1000
                           AND o.o_orderkey % 1000 + 25
"""


def ngram_jaccard_pairs(sf_dir: str):
    """Pair-verification kernel, oracle-checked: character-set (1-gram)
    Jaccard over the deterministic pair set (doc d, doc d+1) for even
    d — DuckDB's ``jaccard()`` computes the identical statistic. Pairs
    co-locate via a groupby on pair id; in production this kernel runs
    on LSH candidate sets (``dedup.ngram_jaccard_verify``), where the
    pair list, not the corpus, is what moves."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tag_pairs(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        return pa.table({"pair": pa.array((d // 2).astype(np.int64)),
                         "doc_id": batch.column("doc_id"),
                         "text": batch.column("text")})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "jac": pd.Series(dtype=np.float64)})
        if len(g) != 2:
            return empty
        ta, tb = str(g["text"].iloc[0] or ""), str(g["text"].iloc[1] or "")
        if not ta or not tb:  # duckdb jaccard rejects empty strings
            return empty
        return pd.DataFrame({"a": [int(g["doc_id"].iloc[0])],
                             "b": [int(g["doc_id"].iloc[1])],
                             "jac": [textfn.jaccard_ngrams(ta, tb, n=1)]})

    return ds.map_batches(tag_pairs, batch_format="pyarrow") \
        .groupby("pair").map_groups(verify, batch_format="pandas")


NGRAM_JACCARD_PAIRS_SQL = """
SELECT a.doc_id AS a, b.doc_id AS b, jaccard(a.text, b.text) AS jac
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 2 = 0
  AND length(a.text) >= 1 AND length(b.text) >= 1
"""


def corpus_curation_by_lang(sf_dir: str):
    """Flagship training-data curation pipeline in ONE streaming pass
    + one partial-aggregated shuffle: fingerprint + token-count every
    document (vectorized per batch), drop exact duplicates (keep the
    lowest doc_id per identical text — a bucketed groupby over partial
    rows, text never shuffles), drop documents outside the token-count
    quality window, and roll up (docs, tokens) per language. Fully
    SQL-expressible, so value-checked against the DuckDB oracle."""
    from ray.data.aggregate import Count, Sum

    lo, hi = 5, 10_000
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def feat(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        s = pd.Series(batch.column("text").to_pylist())
        h = textfn.fingerprint(s)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_tokens": pa.array(s.fillna("").str.count(TOKEN_RE)
                                 .to_numpy(np.int64)),
            "fp": pa.array(h.view(np.int64), pa.int64()),
            "bucket": pa.array((h % np.uint64(64)).astype(np.int32)),
        })

    keyed = ds.map_batches(feat, batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # one surviving row per fingerprint: the lowest doc_id's row
        # (its lang/token count ride along — identical text does not
        # imply identical metadata, so the row, not just the id, wins)
        g = g.sort_values(["fp", "doc_id"]).drop_duplicates("fp")
        return g[["doc_id", "lang", "n_tokens"]]

    kept = keyed.groupby("bucket").map_groups(keep_first,
                                              batch_format="pandas")
    filtered = kept.filter(expr=f"n_tokens >= {lo} and n_tokens <= {hi}")
    return filtered.groupby("lang").aggregate(
        Count(alias_name="docs"),
        Sum("n_tokens", alias_name="tokens"))


CORPUS_CURATION_BY_LANG_SQL = """
WITH kept AS (
    SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
), feat AS (
    SELECT d.lang,
           len(regexp_extract_all(d.text, '[A-Za-z0-9_'']+')) AS n_tokens
    FROM documents d JOIN kept k USING (doc_id)
)
SELECT lang, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
FROM feat WHERE n_tokens BETWEEN 5 AND 10000 GROUP BY lang
"""


def minhash_lsh_candidates(sf_dir: str):
    """MinHash-LSH near-dup candidate PAIRS: shingle -> minhash ->
    band-bucket groupby -> within-bucket pairs, VALUE-MATCHED against a
    SQL oracle that recomputes the identical fingerprints (round-3
    verdict #3a): ``md5_hash64`` shingle hashes (= DuckDB
    ``md5_number_lower``, bit-parity pinned by test), the seeded
    (a·h + b) mod 2^64 mod (2^61−1) permutations inlined as SQL
    literals, bands = num_perm (one row per band, so a band-key match
    is exactly a signature-value match — the per-band FNV fold is a
    bijection of a single value). The oracle therefore models the
    ALGORITHM, not a recall assumption: whatever candidate set LSH
    produces, the SQL produces the same one. Production keeps the fast
    vectorized ``hash64``; only the gate pins the md5 variant.

    Pairs arrive EXACTLY-ONCE from the stage (first-matching-band
    suppression inside the group reduce, ``stages/dedup.py``); SQL's
    DISTINCT mirrors that. Docs without a single word token are
    filtered on both sides (an all-MAX signature would otherwise pair
    empty docs in Ray while SQL's empty shingle list drops them)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _gate_minhash_pairs(ds)


def _gate_minhash_pairs(ds):
    """The ONE oracle-pinned minhash gate configuration (tokenful-doc
    filter, md5 shingle hashes, bands=num_perm, no verify threshold,
    star-compare cap disabled because the SQL emits full cliques —
    review finding, round 4), shared by ``minhash_lsh_candidates`` and
    the composed ``minhash_dedup_keep_documents`` so the two gate
    queries cannot drift apart."""
    from ..stages.dedup import minhash_lsh_pairs

    def has_token(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        ok = pc.and_(pc.is_valid(t),
                     pc.greater(pc.count_substring_regex(
                         t, r"[\p{L}\p{N}_']+"), 0))
        return batch.filter(ok)

    pairs = minhash_lsh_pairs(
        ds.map_batches(has_token, batch_format="pyarrow"),
        "doc_id", "text", k=5, num_perm=GATE_MINHASH_PERMS,
        bands=GATE_MINHASH_PERMS, verify_threshold=0.0,
        hash_fn=textfn.md5_hash64,
        max_group_size=GATE_UNCAPPED_GROUP)
    return pairs.select_columns(["a", "b"])


# gate queries run on bounded testdata; the O(n^2)-guard star-compare
# stays the production default but must not engage under an
# all-pairs-clique SQL oracle
GATE_UNCAPPED_GROUP = 1_000_000_000


GATE_MINHASH_PERMS = 16


def _minhash_lsh_parts() -> tuple[str, str]:
    """(CTE chain, final pair select) of the minhash-LSH SQL replica —
    split so the component oracle can reuse the chain with the pair
    select wrapped as one more CTE."""
    a, b = textfn.minhash_params(GATE_MINHASH_PERMS)
    params = ",\n        ".join(
        f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)"
        for j in range(GATE_MINHASH_PERMS))
    ctes = rf"""params(j, pa, pb) AS (VALUES
        {params}),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\p{{L}}\p{{N}}_'']+') AS ws
  FROM documents
), shl AS (
  SELECT doc_id, CASE
    WHEN len(ws) >= 5
      THEN [array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]
    WHEN len(ws) >= 1 THEN [array_to_string(ws, ' ')]
    ELSE [] END AS sh
  FROM toks
), h AS (
  SELECT doc_id, md5_number_lower(unnest(sh))::HUGEINT AS h FROM shl
), sig AS (
  SELECT doc_id, j,
         min(((pa * h + pb) % 18446744073709551616::HUGEINT)
             % 2305843009213693951::HUGEINT) AS m
  FROM h CROSS JOIN params GROUP BY doc_id, j
)"""
    select = """SELECT DISTINCT s1.doc_id AS a, s2.doc_id AS b
FROM sig s1 JOIN sig s2
  ON s1.j = s2.j AND s1.m = s2.m AND s1.doc_id < s2.doc_id"""
    return ctes, select


def _minhash_lsh_sql() -> str:
    ctes, select = _minhash_lsh_parts()
    return f"\nWITH {ctes}\n{select}\n"


MINHASH_LSH_CANDIDATES_SQL = _minhash_lsh_sql()


def simhash_documents(sf_dir: str) -> pd.DataFrame:
    """Per-doc 64-bit SimHash fingerprints, value-matched bit-for-bit
    against a SQL oracle that recomputes them (round-3 verdict #3b):
    word-unigram tokens (same regex both sides, parity audited on the
    testdata), ``md5_hash64`` token hashes (= ``md5_number_lower``),
    per-bit majority vote with duplicate tokens voting once per
    occurrence, tokenless/null docs hashing to 0. Production simhash
    keeps the fast ``hash64``; the gate pins the md5 variant through
    the same vote/packing kernel."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sh(batch: pa.Table) -> pa.Table:
        s = textfn.simhash(pd.Series(batch.column("text").to_pylist()),
                           hash_fn=textfn.md5_hash64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(s, pa.uint64())})

    return ds.map_batches(sh, batch_format="pyarrow")


# word-unigram md5 SimHash, recomputed entirely in SQL: per-bit
# majority vote (2*ones > total), bits packed via exact powers of two
# (DuckDB's << overflow-checks at bit 63; 2.0**b is exact for b<=63)
_SIMHASH_CTE = r"""
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{N}_'']+') AS ws
  FROM documents
), h AS (
  SELECT doc_id, md5_number_lower(unnest(ws))::UBIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b,
         CASE WHEN 2 * sum(((h >> b) & 1)::BIGINT) > count(*)
              THEN 1 ELSE 0 END AS s
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) bb
  GROUP BY doc_id, b
), sh AS (
  SELECT doc_id, sum((s * (2.0 ** b))::HUGEINT)::UBIGINT AS simhash
  FROM bits GROUP BY doc_id
)
"""


SIMHASH_DOCUMENTS_SQL = f"""
WITH {_SIMHASH_CTE}
SELECT d.doc_id, coalesce(sh.simhash, 0::UBIGINT) AS simhash
FROM documents d LEFT JOIN sh USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def _token_count_batch(batch: pa.Table,
                       carry_cols: tuple[str, ...] = ("doc_id",)
                       ) -> pa.Table:
    """Shared TOKEN_RE token-count kernel: (carry_cols..., n_tokens).
    One copy so the Ray side of token_stats / pack_chunks / v4 cannot
    drift from their common regexp_extract_all SQL oracle."""
    import re

    pat = re.compile(TOKEN_RE)
    s = pd.Series(batch.column("text").to_pylist()).fillna("")
    n = s.str.count(pat).to_numpy(dtype=np.int64)
    return pa.table({c: batch.column(c) for c in carry_cols}
                    | {"n_tokens": pa.array(n, pa.int64())})


def token_stats_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_token_count_batch, batch_format="pyarrow")


TOKEN_STATS_DOCUMENTS_SQL = """
SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS n_tokens
FROM documents
"""


def topk_longest_documents(sf_dir: str) -> pd.DataFrame:
    """Top-10 longest docs WITHOUT a global sort: each block emits its
    own top-10 partial (vectorized argpartition-equivalent via pandas
    nlargest), and the driver merges blocks × 10 tiny rows — no
    all-to-all exchange (round-1 verdict: the full ``ds.sort`` moved
    every row)."""
    k = 10
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k, [("n_chars", "descending"), ("doc_id", "descending")])
        return batch.take(idx)

    parts = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    return (parts.sort_values(["n_chars", "doc_id"],
                              ascending=[False, False])
            .head(k).reset_index(drop=True))


TOPK_LONGEST_DOCUMENTS_SQL = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id DESC LIMIT 10
"""


def lang_by_source(sf_dir: str):
    """Drift-input crosstab (exact counts; the PSI statistic itself is
    float and lives in ``drift_documents_by_source``)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source", "lang"])
    return ds.groupby(["source", "lang"]).aggregate(Count(alias_name="n"))


LANG_BY_SOURCE_SQL = """
SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
"""


def psi_lang_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source PSI of the lang distribution vs the global one —
    the categorical-drift statistic of ``drift_documents_by_source``
    value-matched in isolation, through the SAME ``checks.psi``
    function the drift verdict calls (add-half smoothing, reference =
    merge of all groups including the group, matching
    ``drift_by_group``'s convention). Counts aggregate distributed and
    exactly; only the tiny (source, lang) crosstab reaches the driver.
    The float sum's category order differs between Python (set
    iteration) and SQL (hash agg) at ~1e-16 — under the gate's rounded
    value-hash, as with every mean/avg oracle here. NULL source/lang
    rows are dropped on BOTH sides up front: pandas groupby and SQL
    GROUP BY disagree on NULL-as-a-group, so the only portable
    convention is none."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source", "lang"]) \
        .map_batches(lambda t: t.drop_null(), batch_format="pyarrow")
    cnt = ds.groupby(["source", "lang"]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    glob = cnt.groupby("lang")["n"].sum().to_dict()
    rows = [(src, checks.psi(glob, g.set_index("lang")["n"].to_dict()))
            for src, g in cnt.groupby("source")]
    return pd.DataFrame(rows, columns=["source", "psi"])


PSI_LANG_BY_SOURCE_SQL = """
WITH c AS (
  SELECT source, lang, count(*)::DOUBLE AS n FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT source, sum(n) AS tot FROM c GROUP BY 1
), g AS (
  SELECT lang, sum(n) AS gn FROM c GROUP BY 1
), gt AS (
  SELECT sum(gn) AS gtot FROM g
)
SELECT t.source,
       sum((greatest(g.gn, 0.5) / gt.gtot - greatest(coalesce(c.n, 0), 0.5) / t.tot)
           * ln((greatest(g.gn, 0.5) / gt.gtot)
                / (greatest(coalesce(c.n, 0), 0.5) / t.tot))) AS psi
FROM t CROSS JOIN g CROSS JOIN gt
LEFT JOIN c ON c.source = t.source AND c.lang = g.lang
GROUP BY t.source
"""


def lang_diversity_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source language-diversity profile: Shannon entropy (nats)
    and Herfindahl concentration (HHI) of each source's lang
    distribution, plus docs/langs counts — the corpus-MIX diagnostic
    (a source whose entropy collapses is feeding a monoculture; HHI
    near 1 means one language dominates). Same shuffle shape as the
    PSI drift statistic: counts aggregate distributed and exactly,
    only the tiny (source, lang) crosstab reaches the driver; the
    float entropy sum's category order differs from SQL's hash agg at
    ~1e-16, under the gate's rounded value-hash (PSI convention).
    NULL source/lang dropped on both sides up front."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["source", "lang"]) \
        .map_batches(lambda t: t.drop_null(), batch_format="pyarrow")
    cnt = ds.groupby(["source", "lang"]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    rows = []
    for src, g in cnt.groupby("source", sort=True):
        # fixed (lang-sorted) summation order: deterministic across
        # runs even where the groupby's arrival order is not
        n = g.sort_values("lang")["n"].to_numpy(np.float64)
        tot = n.sum()
        p = n / tot
        rows.append((src, int(tot), len(g),
                     float(-(p * np.log(p)).sum()),
                     float((p * p).sum())))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "n_langs", "entropy", "hhi"]
    ).astype({"n_docs": np.int64, "n_langs": np.int64}) \
        .sort_values("source").reset_index(drop=True)


LANG_DIVERSITY_BY_SOURCE_SQL = """
WITH c AS (
  SELECT source, lang, count(*)::DOUBLE AS n FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), t AS (
  SELECT source, sum(n) AS tot, count(*) AS n_langs FROM c GROUP BY 1
)
SELECT c.source,
       CAST(any_value(t.tot) AS BIGINT) AS n_docs,
       CAST(any_value(t.n_langs) AS BIGINT) AS n_langs,
       sum(-(c.n / t.tot) * ln(c.n / t.tot)) AS entropy,
       sum((c.n / t.tot) * (c.n / t.tot)) AS hhi
FROM c JOIN t USING (source)
GROUP BY c.source
ORDER BY c.source
"""


def ks_exact_events(sf_dir: str) -> pd.DataFrame:
    """EXACT two-sample KS (click vs view on events.value) through the
    distributed integer kernel ``checks.ks_exact_counts`` — the precise
    sibling of the sketch-based drift KS, value-matched against a
    DuckDB window-function oracle. Integer outputs make the match
    hash-exact: ks_num = max_v |cumA(v)*NB - cumB(v)*NA|."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def flag(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["click", "view"]))
        sub = batch.filter(keep)
        a = pc.cast(pc.equal(sub.column("event_type"), "click"), pa.int64())
        return pa.table({"value": sub.column("value"), "a": a})

    flagged = ds.map_batches(flag, batch_format="pyarrow")
    res = checks.ks_exact_counts(flagged, "value", "a")
    return pd.DataFrame([{"ks_num": np.int64(res["ks_num"]),
                          "n_a": np.int64(res["n_a"]),
                          "n_b": np.int64(res["n_b"])}])


KS_EXACT_EVENTS_SQL = """
WITH s AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
  FROM events
  WHERE event_type IN ('click', 'view')
    AND value IS NOT NULL AND isfinite(value)
), d AS (
  SELECT value, CAST(sum(a) AS BIGINT) AS na,
         CAST(sum(1 - a) AS BIGINT) AS nb
  FROM s GROUP BY value
), c AS (
  SELECT CAST(sum(na) OVER (ORDER BY value) AS BIGINT) AS ca,
         CAST(sum(nb) OVER (ORDER BY value) AS BIGINT) AS cb
  FROM d
), t AS (
  SELECT CAST(sum(na) AS BIGINT) AS n_a,
         CAST(sum(nb) AS BIGINT) AS n_b FROM d
)
SELECT max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS ks_num, t.n_a, t.n_b
FROM c, t GROUP BY t.n_a, t.n_b
"""


QUANTILE_QS = [0.25, 0.5, 0.9, 0.99]


def quantiles_events_value(sf_dir: str) -> pd.DataFrame:
    """EXACT discrete quantiles of events.value through the
    distributed ``checks.exact_quantiles`` kernel (quantile_disc
    semantics — element at rank ceil(q*n)); value-matched against
    DuckDB since both select an actual element (no interpolation, so
    no FP drift)."""
    ds = _read(sf_dir, "events", ["value"])
    got = checks.exact_quantiles(ds, "value", QUANTILE_QS)
    return pd.DataFrame({"q": np.array(QUANTILE_QS, np.float64),
                         "value": [got[q] for q in QUANTILE_QS]})


QUANTILES_EVENTS_VALUE_SQL = """
WITH v AS (
  SELECT value FROM events WHERE value IS NOT NULL AND isfinite(value)
)
SELECT CAST(0.25 AS DOUBLE) AS q, quantile_disc(value, 0.25) AS value FROM v
UNION ALL
SELECT CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5) FROM v
UNION ALL
SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM v
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM v
"""


def top_terms_by_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Top-k tokens per language by exact corpus frequency (term
    frequency — the webtext vocabulary rollup). Two-stage exact plan:
    per-batch (lang, token) count partials (the combiner), ONE bucketed
    groupby for exact global counts, then per-bucket top-k partials —
    any global top-k member is necessarily in its bucket's top-k, so
    merging the ≤ B*k*|langs| partial rows on the driver stays exact
    while the vocabulary itself never leaves the workers. Ties break
    by token ascending (deterministic)."""
    from ray.data.aggregate import Sum

    from ..functions import hashing

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        ok = pc.and_(pc.and_(pc.is_valid(txt), pc.not_equal(txt, "")),
                     pc.is_valid(batch.column("lang")))
        batch = batch.filter(ok)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lists = pc.split_pattern(txt, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n_per = np.diff(np.asarray(lists.offsets, dtype=np.int64))
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        flat = pa.table({
            "lang": pa.array(np.repeat(langs, n_per)),
            "token": lists.values,
        })
        gb = flat.group_by(["lang", "token"]).aggregate([([], "count_all")])
        tok = gb.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        if not pa.types.is_large_string(tok.type):
            tok = tok.cast(pa.large_string())
        h = hashing.hash64(tok)
        return pa.table({
            "lang": gb.column("lang"), "token": gb.column("token"),
            "n_part": gb.column("count_all"),
            "bucket": pa.array((h % np.uint64(32)).astype(np.int32)),
        })

    return _bucketed_topk_by_lang(
        ds.map_batches(partial, batch_format="pyarrow"), "token", k)


def _bucketed_topk_by_lang(partials, term_col: str,
                           k: int) -> pd.DataFrame:
    """Second stage shared by the term and bigram top-k operators:
    per-bucket exact (lang, term) totals -> per-bucket top-k partials
    (any global top-k member is necessarily in its bucket's top-k) ->
    driver merge. Ties break by term ascending (deterministic)."""
    import pandas as pd  # noqa: F811 (local for map_groups pickling)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["lang", term_col], sort=False)["n_part"] \
            .sum().reset_index(name="n")
        tot = tot.sort_values(["lang", "n", term_col],
                              ascending=[True, False, True])
        return tot.groupby("lang", sort=False).head(k)

    cand = partials.groupby("bucket").map_groups(
        bucket_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["lang", "n", term_col],
                            ascending=[True, False, True])
    out = cand.groupby("lang", sort=True).head(k).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["lang", term_col, "n"]]


TOP_TERMS_BY_LANG_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
  WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL
), c AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY 1, 2
)
SELECT lang, token, n FROM c
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n DESC, token) <= 5
"""


def events_props_rollup(sf_dir: str) -> pd.DataFrame:
    """JSON sidecar-metadata extraction (``functions/jsonfn.py``):
    pull the integer field ``k`` out of the events.props JSON column
    with the vectorized flat-object fast path, then an exact integer
    rollup per event_type. The oracle uses DuckDB json_extract_string
    + TRY_CAST, which agrees with the strict-integer semantics on
    integer-valued props (coercion divergences pinned by unit test)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions import jsonfn

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        k = jsonfn.extract_int(batch.column("props"), "k")
        t = pa.table({"event_type": batch.column("event_type"), "k": k})
        return t.filter(pc.is_valid(k))

    out = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="cnt"), Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"), Max("k", alias_name="max_k")) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    for c in ("cnt", "sum_k", "min_k", "max_k"):
        out[c] = out[c].astype(np.int64)
    return out[["event_type", "cnt", "sum_k", "min_k", "max_k"]]


EVENTS_PROPS_ROLLUP_SQL = """
WITH e AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM e WHERE k IS NOT NULL GROUP BY event_type
"""


def stable_sample_orders(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~10% sample of orders by key
    (``stages/sampling.py`` Knuth multiplicative hash in 32-bit
    integer space — stable across runs, cluster sizes and
    partitionings, and integer-exact in SQL, so the sample itself is
    oracle-checkable)."""
    from ..stages import sampling

    ds = _read(sf_dir, "orders", ["o_orderkey"])
    out = sampling.stable_sample(ds, "o_orderkey", 0.1)
    df = _with_schema(out, ["o_orderkey"], {"o_orderkey": np.int64})
    return df.sort_values("o_orderkey").reset_index(drop=True)


STABLE_SAMPLE_ORDERS_SQL = """
SELECT o_orderkey FROM orders
WHERE ((CAST(o_orderkey AS UBIGINT) % 4294967296) * 2654435761)
      % 4294967296 < 429496729
"""


WINDOW_TOKENS = 10  # the shared token-window width for "lines"


def _window_dup_stats(batch: pa.Table, id_col: str,
                      text_col: str) -> pd.DataFrame:
    """Per-doc (id, size, nunique) of WINDOW_TOKENS-token windows —
    shared by the standalone repetition feature and the curation
    pipeline's filter so the repetition definition cannot diverge."""
    from ..stages.dedup import _explode_lines

    flat = _explode_lines(batch, id_col, text_col, "\n",
                          tokens_per_line=WINDOW_TOKENS,
                          include_text=True)
    df = pd.DataFrame({
        id_col: flat.column(id_col).to_numpy(),
        "line": flat.column("line").to_pandas(),
    })
    if not len(df):
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "size": pd.Series(dtype=np.int64),
                             "nunique": pd.Series(dtype=np.int64)})
    return df.groupby(id_col, sort=True)["line"] \
        .agg(["size", "nunique"]).reset_index()


def repetition_features_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-style within-document repetition signal: per document,
    how many of its 10-token windows are repeats of an earlier window
    IN THE SAME DOCUMENT (boilerplate/loop detector). Embarrassingly
    parallel — each document's windows come from its own row, so this
    is a pure ``map_batches`` with zero shuffle. Integer outputs
    (n_lines, n_dup_lines) keep the oracle hash-exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def features(batch: pa.Table) -> pa.Table:
        g = _window_dup_stats(batch, "doc_id", "text")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)),
            "n_lines": pa.array(g["size"].to_numpy(dtype=np.int64)),
            "n_dup_lines": pa.array(
                (g["size"] - g["nunique"]).to_numpy(dtype=np.int64)),
        })

    out = ds.map_batches(features, batch_format="pyarrow")
    df = _with_schema(out, ["doc_id", "n_lines", "n_dup_lines"],
                      {"doc_id": np.int64, "n_lines": np.int64,
                       "n_dup_lines": np.int64})
    return df.sort_values("doc_id").reset_index(drop=True)


REPETITION_FEATURES_DOCUMENTS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents WHERE text IS NOT NULL AND text <> ''
), lines AS (
  SELECT doc_id, (i - 1) // 10 AS line_no,
         string_agg(w, ' ' ORDER BY i) AS line
  FROM toks GROUP BY doc_id, (i - 1) // 10
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) - count(DISTINCT line) AS BIGINT) AS n_dup_lines
FROM lines GROUP BY doc_id
"""


def corpus_curation_v2(sf_dir: str) -> pd.DataFrame:
    """End-to-end curation pipeline composing the session's exact
    operators — every stage SQL-expressible, so the WHOLE pipeline
    value-matches one oracle: stable 80% split (Knuth hash on doc_id)
    -> per-doc repetition filter (drop docs where duplicate windows
    exceed 1/5 of windows; zero shuffle, per-batch local) -> corpus-
    wide line-level exact dedup (fingerprints shuffle, text does not;
    lang carried through the rebuild) -> per-lang doc/token rollup."""
    from ..stages import sampling
    from ..stages.dedup import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    sampled = sampling.stable_sample(ds, "doc_id", 0.8)

    def rep_filter(batch: pa.Table) -> pa.Table:
        g = _window_dup_stats(batch, "doc_id", "text")
        bad = set(g.loc[(g["size"] - g["nunique"]) * 5 > g["size"],
                        "doc_id"])
        ids = batch.column("doc_id").to_numpy()
        keep = ~np.isin(ids, np.fromiter(bad, dtype=np.int64,
                                         count=len(bad))) \
            if bad else np.ones(len(ids), dtype=bool)
        # empty/null texts never survive the explode either way
        txt = batch.column("text")
        ok = pc.and_(pc.is_valid(txt), pc.not_equal(txt, "")) \
            .to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keep & ok))

    filtered = sampled.map_batches(rep_filter, batch_format="pyarrow")
    rebuilt = line_dedup(filtered, "doc_id", "text", tokens_per_line=10,
                         carry_cols=["lang"])

    def rollup(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flatx = pc.replace_substring(txt, "\n", " ")
        ntok = pc.add(pc.count_substring(flatx, " "), 1)
        t = pa.table({"lang": batch.column("lang"),
                      "n_tokens": ntok.cast(pa.int64())})
        gb = t.group_by(["lang"]).aggregate(
            [([], "count_all"), ("n_tokens", "sum")])
        return pa.table({"lang": gb.column("lang"),
                         "n_docs": gb.column("count_all"),
                         "n_tokens": gb.column("n_tokens_sum")})

    parts = rebuilt.map_batches(rollup, batch_format="pyarrow") \
        .to_pandas()
    if not len(parts):
        return pd.DataFrame({"lang": pd.Series(dtype=object),
                             "n_docs": pd.Series(dtype=np.int64),
                             "n_tokens": pd.Series(dtype=np.int64)})
    out = parts.groupby("lang", sort=True)[["n_docs", "n_tokens"]] \
        .sum().reset_index()
    for c in ("n_docs", "n_tokens"):
        out[c] = out[c].astype(np.int64)
    return out


CORPUS_CURATION_V2_SQL = """
WITH sampled AS (
  SELECT doc_id, text, lang FROM documents
  WHERE ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
        % 4294967296 < 3435973836
    AND text IS NOT NULL AND text <> ''
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM sampled
), lines AS (
  SELECT doc_id, (i - 1) // 10 AS line_no,
         string_agg(w, ' ' ORDER BY i) AS line
  FROM toks GROUP BY doc_id, (i - 1) // 10
), rep AS (
  SELECT doc_id, count(*) AS nl,
         count(*) - count(DISTINCT line) AS dups
  FROM lines GROUP BY doc_id
), keep AS (
  SELECT doc_id FROM rep WHERE dups * 5 <= nl
), winners AS (
  SELECT l.doc_id, l.line_no, l.line FROM lines l JOIN keep USING (doc_id)
  QUALIFY row_number() OVER (PARTITION BY line
                             ORDER BY doc_id, line_no) = 1
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
  FROM winners GROUP BY doc_id
)
SELECT s.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(replace(r.text, chr(10), ' '), ' ')))
            AS BIGINT) AS n_tokens
FROM rebuilt r JOIN sampled s USING (doc_id)
GROUP BY s.lang
"""


def events_value_histogram(sf_dir: str, width: float = 10.0) -> pd.DataFrame:
    """Fixed-width histogram of events.value — the exact-profile
    sibling of the t-digest CDF: per-batch integer bincount partials
    (the combiner; one row per non-empty bin per block), driver fold,
    no shuffle. Bin = floor(value / width) as an integer, so both
    sides compute the same IEEE division + floor."""
    ds = _read(sf_dir, "events", ["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.and_(pc.is_valid(v), pc.is_finite(v))
        arr = v.filter(ok).to_numpy(zero_copy_only=False)
        b = np.floor(arr / width).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()),
                         "n_part": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"bin": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64)})
    out = parts.groupby("bin", sort=True)["n_part"].sum() \
        .reset_index(name="n")
    out["n"] = out["n"].astype(np.int64)
    return out


EVENTS_VALUE_HISTOGRAM_SQL = """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE value IS NOT NULL AND isfinite(value)
GROUP BY 1
"""


def quantiles_by_event_type(sf_dir: str) -> pd.DataFrame:
    """Per-group exact discrete quantiles (p50/p90 of events.value per
    event_type) via ``checks.exact_quantiles_by_group`` — distinct
    (group, value) partials, one grouped sort, one block fetch per
    (group, rank)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    long = checks.exact_quantiles_by_group(ds, "event_type", "value",
                                           [0.5, 0.9])
    wide = long.pivot(index="event_type", columns="q", values="value") \
        .reset_index()
    wide.columns = ["event_type", "p50", "p90"]
    return wide.sort_values("event_type").reset_index(drop=True)


QUANTILES_BY_EVENT_TYPE_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90
FROM events
WHERE value IS NOT NULL AND isfinite(value)
GROUP BY event_type
"""


def text_analysis_scaled(sf_dir: str, repeat: int = 96) -> pd.DataFrame:
    """Bench headline #2: full text-analysis pass (token counts,
    quality score, language-id, SimHash fingerprint) over ``repeat``
    remapped copies of documents — one task per shard, one map pass,
    per-batch partial aggregation, tiny driver-side result. This is the
    compute-bound (regex/bit-twiddling) web-text workload of the north
    metric; unlike the digest kernel it is not memory-bandwidth-bound,
    so it demonstrates core scaling."""
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"

    def shard_analyze(batch) -> pa.Table:
        import pyarrow.parquet as pq

        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        i = int(batch["id"][0])
        t = pq.read_table(path, columns=["doc_id", "text"], use_threads=False)
        s = pd.Series(t.column("text").to_pylist())
        n_tok = textfn.token_counts(s)
        qs = textfn.quality_score(s)
        langs = textfn.lang_id(s)
        sh = textfn.simhash(s)
        # partial aggregate: per predicted lang -> count, tokens, mean
        # quality, xor of simhashes (tiny, mergeable on the driver)
        df = pd.DataFrame({"lang_pred": langs, "n_tok": n_tok, "q": qs,
                           "sh": sh})
        g = df.groupby("lang_pred", sort=False).agg(
            docs=("q", "size"), tokens=("n_tok", "sum"), qsum=("q", "sum"))
        xor = df.groupby("lang_pred", sort=False)["sh"].apply(
            lambda v: np.bitwise_xor.reduce(v.to_numpy().astype(np.uint64)))
        g["sh_xor"] = xor.astype(np.uint64).values
        g = g.reset_index()
        g["shard"] = np.int32(i)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = rd.range(repeat, override_num_blocks=repeat) \
        .map_batches(shard_analyze, batch_format="numpy", batch_size=None) \
        .to_pandas()
    out = partials.groupby("lang_pred").agg(
        docs=("docs", "sum"), tokens=("tokens", "sum"), qsum=("qsum", "sum"),
        sh_xor=("sh_xor", lambda v: np.bitwise_xor.reduce(
            v.to_numpy().astype(np.uint64))))
    out["mean_quality"] = out["qsum"] / out["docs"]
    return out.reset_index()[["lang_pred", "docs", "tokens", "mean_quality"]]


def quality_documents(sf_dir: str) -> pd.DataFrame:
    """Heuristic quality + language-id scores.

    Oracle-matched BIT-EXACT: the score is pure IEEE-double arithmetic
    over integer regex counts, evaluated in the same operation order as
    ``QUALITY_DOCUMENTS_SQL`` (clip = least/greatest, left-associated
    weighted sum), and ``lang_id``'s argmax first-index tie-break maps
    to the SQL CASE ladder in declaration order."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def q(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pylist())
        feats = textfn.quality_features(s)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(feats["n_tokens"].to_numpy()),
            "quality": pa.array(textfn.quality_score(s)),
            "lang_pred": pa.array(textfn.lang_id(s)),
        })

    return ds.map_batches(q, batch_format="pyarrow")


def quality_features_documents(sf_dir: str) -> pd.DataFrame:
    """Deterministic integer quality features per document — the
    SQL-expressible core of the quality heuristic (ASCII-safe regex
    classes so Python ``re`` and DuckDB RE2 count identically;
    the float composites stay in ``quality_documents``)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        s = pd.Series(batch.column("text").to_pylist()).fillna("")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(s.str.len().to_numpy(np.int64)),
            "n_tokens": pa.array(s.str.count(TOKEN_RE).to_numpy(np.int64)),
            "n_upper": pa.array(s.str.count(r"[A-Z]").to_numpy(np.int64)),
            "n_digit": pa.array(s.str.count(r"[0-9]").to_numpy(np.int64)),
        })

    return ds.map_batches(feats, batch_format="pyarrow")


QUALITY_FEATURES_DOCUMENTS_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '[A-Za-z0-9_'']+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
       len(regexp_extract_all(text, '[0-9]')) AS n_digit
FROM documents
"""

# Stopword alternations generated from the SAME textfn.STOPWORDS sets
# (sorted, like quality_score/lang_id build their patterns) so the SQL
# can never drift from the Python heuristic. Safe for the ASCII corpus:
# RE2's \w/\b are ASCII-only while Python's are Unicode — identical on
# ASCII text, which is what the testdata documents table contains.
# RE2's \s is narrower than Python's even within ASCII ([\t\n\f\r ]
# vs + VT and the \x1c-\x1f separators), so the punct class spells the
# extra control chars out instead of trusting \s.
_STOP_PATS = {
    _l: r"\b(?:" + "|".join(sorted(textfn.STOPWORDS[_l])) + r")\b"
    for _l in textfn.STOPWORDS
}
_GREATEST_ALL = "greatest(" + ",".join(
    f"c_{_l}" for _l in textfn.STOPWORDS) + ")"
QUALITY_DOCUMENTS_SQL = f"""
WITH f AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(regexp_extract_all(text, '[\\w'']+')) AS n_tokens,
    len(regexp_extract_all(text, '[^\\w\\s\\x0b\\x1c-\\x1f]')) AS n_punct,
    {','.join(
        "len(regexp_extract_all(lower(text), '" + _STOP_PATS[_l] + "'))"
        " AS c_" + _l for _l in textfn.STOPWORDS)}
  FROM documents
)
SELECT doc_id, n_tokens,
  least(greatest(n_tokens/200.0,0),1)*0.4
  + least(greatest(1.0 - (n_punct/greatest(n_chars,1))*4.0,0),1)*0.3
  + least(greatest((c_en/greatest(n_tokens,1))*5.0,0),1)*0.3 AS quality,
  CASE WHEN {_GREATEST_ALL}=0 THEN 'und'
       {' '.join(
           "WHEN c_" + _l + "=" + _GREATEST_ALL + " THEN '" + _l + "'"
           for _l in list(textfn.STOPWORDS)[:-1])}
       ELSE '{list(textfn.STOPWORDS)[-1]}' END AS lang_pred
FROM f
"""


def profile_counts_documents(sf_dir: str) -> pd.DataFrame:
    """The EXACT fields of the sketch profile (count / nulls / min /
    max per column), oracle-checked — the approximate fields (HLL
    distinct, t-digest quantiles) stay in ``hll_profile_documents``.
    Values are cast to strings for a uniform cross-type result column
    (binary min/max on strings matches DuckDB's default collation)."""
    cols = ["doc_id", "lang", "n_chars"]
    profs = profile_dataset(_read(sf_dir, "documents", cols), cols)
    rows = [{"col": p.name, "cnt": p.count, "nulls": p.nulls,
             "vmin": str(p.vmin), "vmax": str(p.vmax)}
            for p in (profs[c] for c in cols)]
    return pd.DataFrame(rows)


PROFILE_COUNTS_DOCUMENTS_SQL = """
SELECT 'doc_id' AS col, count(*) AS cnt,
       count(*) - count(doc_id) AS nulls,
       CAST(min(doc_id) AS VARCHAR) AS vmin,
       CAST(max(doc_id) AS VARCHAR) AS vmax FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) - count(lang),
       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) - count(n_chars),
       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
FROM documents
"""


def drift_documents_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-group drift verdicts on documents by source, assembled from
    the two EXACT legs so the composite value-matches its SQL oracle
    (round-3 verdict #3e):

    - numeric ``n_chars``: exact two-sample KS of each source vs the
      rest through the ONE-PASS grouped integer kernel
      ``checks.ks_exact_by_group`` (shuffle volume = distinct
      (source, value) pairs; equality with the per-group
      ``ks_exact_counts`` loop pinned by test) — value =
      ks_num/(n_a·n_b) (identical float division of identical integers
      on both sides), verdict by the PURE-INTEGER rule
      10·ks_num > n_a·n_b (KS > 0.1);
    - categorical ``lang``: exact PSI of each source vs the global
      distribution through ``checks.psi`` (same add-half smoothing as
      the oracled ``psi_lang_by_source``; float sum-order noise ~1e-16
      sits under the gate's rounded value-hash, and the 0.25 verdict
      margin is ≥ 7e-3 across the testdata — audited).

    The sketch-based ``drift_by_group`` + ``drift_exact_recheck``
    two-phase pipeline remains the cheap first-pass (t-digest/HLL
    partials) and is pinned by pytest; this gate entry runs the exact
    siblings end-to-end."""
    from ray.data.aggregate import Count

    cat = _read(sf_dir, "documents", ["source", "lang"]) \
        .map_batches(lambda t: t.drop_null(), batch_format="pyarrow")
    cnt = cat.groupby(["source", "lang"]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    glob = cnt.groupby("lang")["n"].sum().to_dict()
    rows = []
    for src, g in cnt.groupby("source"):
        p = checks.psi(glob, g.set_index("lang")["n"].to_dict())
        rows.append({"grp": str(src), "col": "lang", "stat": "psi",
                     "value": float(p),
                     "result": "failed" if p > 0.25 else "success"})
    ks = checks.ks_exact_by_group(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        "source", "n_chars")
    for r in ks.itertuples(index=False):
        num, n_a, n_b = int(r.ks_num), int(r.n_a), int(r.n_b)
        rows.append({
            "grp": str(r.source), "col": "n_chars", "stat": "ks_exact",
            "value": num / (n_a * n_b) if n_a and n_b else 0.0,
            "result": "failed" if 10 * num > n_a * n_b else "success"})
    return pd.DataFrame(rows, columns=["grp", "col", "stat", "value",
                                       "result"])


DRIFT_DOCUMENTS_BY_SOURCE_SQL = """
WITH ks_d AS (
  SELECT source, n_chars AS v FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
), grps AS (SELECT DISTINCT source FROM ks_d),
cnts AS (SELECT source, v, count(*)::BIGINT AS c FROM ks_d GROUP BY 1, 2),
gv AS (
  SELECT g.source AS grp, c.v,
         sum(CASE WHEN c.source = g.source THEN c.c ELSE 0 END) AS na_v,
         sum(CASE WHEN c.source <> g.source THEN c.c ELSE 0 END) AS nb_v
  FROM grps g CROSS JOIN cnts c GROUP BY 1, 2
), cum AS (
  SELECT grp,
         sum(na_v) OVER (PARTITION BY grp ORDER BY v) AS ca,
         sum(nb_v) OVER (PARTITION BY grp ORDER BY v) AS cb
  FROM gv
), tot AS (
  SELECT grp, sum(na_v)::BIGINT AS n_a, sum(nb_v)::BIGINT AS n_b
  FROM gv GROUP BY 1
), ks AS (
  SELECT c.grp, max(abs(c.ca * t.n_b - c.cb * t.n_a))::BIGINT AS ks_num,
         t.n_a, t.n_b
  FROM cum c JOIN tot t ON t.grp = c.grp GROUP BY c.grp, t.n_a, t.n_b
), psi_c AS (
  SELECT source, lang, count(*)::DOUBLE AS n FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), psi_t AS (SELECT source, sum(n) AS tot FROM psi_c GROUP BY 1),
psi_g AS (SELECT lang, sum(n) AS gn FROM psi_c GROUP BY 1),
psi_gt AS (SELECT sum(gn) AS gtot FROM psi_g),
psi AS (
  SELECT t.source AS grp,
         sum((greatest(g.gn, 0.5) / gt.gtot
              - greatest(coalesce(c.n, 0), 0.5) / t.tot)
             * ln((greatest(g.gn, 0.5) / gt.gtot)
                  / (greatest(coalesce(c.n, 0), 0.5) / t.tot))) AS psi
  FROM psi_t t CROSS JOIN psi_g g CROSS JOIN psi_gt gt
  LEFT JOIN psi_c c ON c.source = t.source AND c.lang = g.lang
  GROUP BY t.source
)
SELECT grp, 'lang' AS col, 'psi' AS stat, psi AS value,
       CASE WHEN psi > 0.25 THEN 'failed' ELSE 'success' END AS result
FROM psi
UNION ALL
SELECT grp, 'n_chars' AS col, 'ks_exact' AS stat,
       CASE WHEN n_a * n_b = 0 THEN 0.0
            ELSE ks_num / (n_a::DOUBLE * n_b) END AS value,
       CASE WHEN 10 * ks_num > n_a * n_b THEN 'failed'
            ELSE 'success' END AS result
FROM ks
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def knn_embeddings(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id 0: the query vector
    is broadcast once (ray.put) and each batch does one numpy matmul,
    emitting only its block-local top-k (no global sort — blocks × k
    tiny rows merge on the driver). float64 math matches DuckDB's
    ``list_cosine_similarity`` double precision, so the neighbor id set
    is oracle-checkable; the float scores stay out of the result (their
    last-ulp bytes are engine-specific)."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    k = 10
    q = None
    for b in ds.iter_batches(batch_size=256, batch_format="pandas"):
        m = b[b["vec_id"] == 0]
        if len(m):
            q = np.asarray(list(m["embedding"])[0], dtype=np.float64)
            break
    assert q is not None
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(ref)
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = mat @ qv
        sub = pd.DataFrame({"vec_id": batch["vec_id"], "cos": cos})
        sub = sub[sub["vec_id"] != 0]
        return sub.sort_values(["cos", "vec_id"],
                               ascending=[False, False]).head(k)

    parts = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    top = parts.sort_values(["cos", "vec_id"],
                            ascending=[False, False]).head(k)
    return top[["vec_id"]].reset_index(drop=True)


KNN_EMBEDDINGS_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id DESC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Incremental mode, rules, skew, CSV source, multimodal (round-1 widening)
# ---------------------------------------------------------------------------

def cdc_debezium_orders(sf_dir: str) -> pd.DataFrame:
    """Debezium CDC ingestion end-to-end: a synthetic change stream
    (one Debezium-JSON update event per order with o_orderkey % 97 == 0,
    built distributedly from the orders table as the CDC feed stand-in)
    parses through the event parser into per-table changed keys — the
    reference's consume -> consolidate front half (S5). Oracle = the
    generating predicate."""
    import json as _json

    from ..sources import debezium

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def to_events(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy()
        keys = keys[keys % 97 == 0]
        lines = [_json.dumps({
            "payload": {
                "before": None,
                "after": {"o_orderkey": str(int(k)), "o_comment": "upd"},
                "source": {"table": "orders", "ts_ms": 1675319298000},
                "op": "u", "ts_ms": 1675319299411,
            }}) for k in keys]
        return pa.table({"text": pa.array(lines, pa.large_string())})

    events = ds.map_batches(to_events, batch_format="pyarrow")
    parsed = debezium.parse_change_events(
        events, key_columns={"orders": ["o_orderkey"]})
    out = parsed.select_columns(["key", "op"]).to_pandas()
    return out.drop_duplicates().sort_values("key").reset_index(drop=True)


CDC_DEBEZIUM_ORDERS_SQL = """
SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key, 'u' AS op
FROM orders WHERE o_orderkey % 97 = 0
"""


def cdc_compaction_orders(sf_dir: str) -> pd.DataFrame:
    """CDC log-compaction end-to-end: a synthetic Debezium stream with
    REAL transport offsets — per order an insert (offset ``3k``), for
    ``k % 3 == 0`` an update bumping ``o_custkey`` by 1,000,000
    (offset ``3k+1``), for ``k % 5 == 0`` a delete tombstone (offset
    ``3k+2``, ``before``-only payload like Debezium emits) — parses
    with carried values (``value_columns``) and materializes the final
    table state via ``incremental.compact_changes`` (keep-latest per
    key, tombstones erase). Oracle = the generating predicate: keys
    not divisible by 5 survive, custkey bumped iff divisible by 3.
    Exercises parser value carriage, delete-before payloads, offset
    ordering across interleaved ops, and the bucketed keep-latest fold
    in one pipeline."""
    import json as _json

    from ..sources import debezium
    from . import incremental

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def to_events(batch: pa.Table) -> pa.Table:
        ks = batch.column("o_orderkey").to_numpy()
        cs = batch.column("o_custkey").to_numpy()
        lines: list[str] = []
        offs: list[int] = []

        def emit(payload: dict, off: int) -> None:
            lines.append(_json.dumps({"payload": payload}))
            offs.append(off)

        src = {"table": "orders", "ts_ms": 1675319298000}
        for k, c in zip(ks.tolist(), cs.tolist()):
            emit({"before": None,
                  "after": {"o_orderkey": str(k), "o_custkey": str(c)},
                  "source": src, "op": "c", "ts_ms": 1675319299000}, 3 * k)
            if k % 3 == 0:
                emit({"before": None,
                      "after": {"o_orderkey": str(k),
                                "o_custkey": str(c + 1000000)},
                      "source": src, "op": "u",
                      "ts_ms": 1675319299100}, 3 * k + 1)
            if k % 5 == 0:
                emit({"before": {"o_orderkey": str(k),
                                 "o_custkey": str(c)},
                      "after": None, "source": src, "op": "d",
                      "ts_ms": 1675319299200}, 3 * k + 2)
        return pa.table({"text": pa.array(lines, pa.large_string()),
                         "off": pa.array(offs, pa.int64())})

    events = ds.map_batches(to_events, batch_format="pyarrow")
    parsed = debezium.parse_change_events(
        events, key_columns={"orders": ["o_orderkey"]},
        offset_col="off", value_columns=["o_custkey"])
    state = incremental.compact_changes(parsed,
                                        value_columns=["o_custkey"])
    df = _with_schema(state.select_columns(["key", "v_o_custkey"]),
                      ["key", "v_o_custkey"],
                      {"key": object, "v_o_custkey": object})
    out = pd.DataFrame({
        "key": df["key"].astype(str),
        "o_custkey": df["v_o_custkey"].astype(np.int64)})
    return out.sort_values("key").reset_index(drop=True)


CDC_COMPACTION_ORDERS_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       CAST(o_custkey + CASE WHEN o_orderkey % 3 = 0
                             THEN 1000000 ELSE 0 END AS BIGINT)
           AS o_custkey
FROM orders
WHERE o_orderkey % 5 <> 0
ORDER BY key
"""


def cdc_state_verify_orders(sf_dir: str) -> pd.DataFrame:
    """Sinkless CDC verification capstone: does REPLAYING the change
    log reproduce the source table? Compact the stream into the
    materialized state (``incremental.compact_changes``), cast the
    transport strings back to the source schema, and run the standard
    Merkle digest compare against the source itself — no sink database
    needed, the log IS the sink. This closes the loop the reference
    leaves to the replication tool: its increment mode trusts the CDC
    feed and re-extracts both databases; here the feed itself is the
    verified artifact.

    Injected transport faults (oracle = the fault predicates): every
    key gets an insert with a STALE value then an update delivering
    the true value, but the update for ``k % 11 == 0`` is LOST (stale
    state -> 'update' diff) and a SPURIOUS delete arrives for
    ``k % 13 == 0`` (missing key -> 'insert' diff, which wins when
    both faults hit). Scale shape: compaction's bucketed keep-latest
    fold feeds the streaming digest compare directly — the raw JSON
    never moves past the parser, and clean partitions Merkle-prune as
    usual."""
    import json as _json

    from ..sources import debezium
    from . import incremental

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def to_events(batch: pa.Table) -> pa.Table:
        ks = batch.column("o_orderkey").to_numpy()
        cs = batch.column("o_custkey").to_numpy()
        lines: list[str] = []
        offs: list[int] = []
        src = {"table": "orders", "ts_ms": 1675319298000}
        for k, c in zip(ks.tolist(), cs.tolist()):
            lines.append(_json.dumps({"payload": {
                "before": None,
                "after": {"o_orderkey": str(k), "o_custkey": str(c - 1)},
                "source": src, "op": "c", "ts_ms": 1675319299000}}))
            offs.append(3 * k)
            if k % 11 != 0:  # the true-value update; LOST for k%11==0
                lines.append(_json.dumps({"payload": {
                    "before": None,
                    "after": {"o_orderkey": str(k), "o_custkey": str(c)},
                    "source": src, "op": "u", "ts_ms": 1675319299100}}))
                offs.append(3 * k + 1)
            if k % 13 == 0:  # spurious delete
                lines.append(_json.dumps({"payload": {
                    "before": {"o_orderkey": str(k), "o_custkey": str(c)},
                    "after": None, "source": src, "op": "d",
                    "ts_ms": 1675319299200}}))
                offs.append(3 * k + 2)
        return pa.table({"text": pa.array(lines, pa.large_string()),
                         "off": pa.array(offs, pa.int64())})

    parsed = debezium.parse_change_events(
        ds.map_batches(to_events, batch_format="pyarrow"),
        key_columns={"orders": ["o_orderkey"]},
        offset_col="off", value_columns=["o_custkey"])
    state = incremental.compact_changes(parsed,
                                        value_columns=["o_custkey"])

    def to_schema(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(b.column("key"), pa.int64()),
            "o_custkey": pc.cast(b.column("v_o_custkey"), pa.int64())})

    sink = state.map_batches(to_schema, batch_format="pyarrow")
    n = _num_rows(sf_dir, "orders")
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=64)
    res = cmp.compare_tables(ds, sink, cfg, table="orders")
    v = res.violations[["key", "kind"]].sort_values(["key", "kind"])
    return v.reset_index(drop=True)


CDC_STATE_VERIFY_ORDERS_SQL = """
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       CASE WHEN o_orderkey % 13 = 0 THEN 'insert'
            ELSE 'update' END AS kind
FROM orders
WHERE o_orderkey % 11 = 0 OR o_orderkey % 13 = 0
ORDER BY key, kind
"""


def incremental_recheck_orders(sf_dir: str) -> pd.DataFrame:
    """Incremental (changed-key) verification: CDC batch = every 500th
    order key; re-extract both sides filtered to those keys and
    classify. SQL-expressible, so oracle-checked."""
    import ray.data as rd

    from . import incremental

    changed = [str(k) for k in range(0, 15000 * 10, 500)]

    def src_f():
        return rd.read_parquet(f"{sf_dir}/orders.parquet", columns=ORDER_COLS)

    def snk_f():
        return rd.read_parquet(f"{sf_dir}/orders.parquet", columns=ORDER_COLS) \
            .map_batches(_orders_sink_batch, batch_format="pyarrow")

    res = incremental.incremental_check(
        src_f, snk_f, ["o_orderkey"], changed, table="orders",
        cfg=incremental.IncrementConfig(max_diff_count=10**9,
                                        secondary_recheck=False))
    v = res.violations[["key", "kind"]].sort_values(["key", "kind"])
    return v.reset_index(drop=True)


INCREMENTAL_RECHECK_ORDERS_SQL = """
WITH sink AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
),
changed(k) AS (SELECT (n - 1) * 500 FROM generate_series(1, 300) t(n)),
s AS (SELECT * FROM orders WHERE o_orderkey IN (SELECT k FROM changed)),
kk AS (SELECT * FROM sink WHERE o_orderkey IN (SELECT k FROM changed))
SELECT CAST(COALESCE(s.o_orderkey, kk.o_orderkey) AS VARCHAR) AS key,
       CASE WHEN kk.o_orderkey IS NULL THEN 'insert'
            WHEN s.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS kind
FROM s FULL OUTER JOIN kk ON s.o_orderkey = kk.o_orderkey
WHERE kk.o_orderkey IS NULL OR s.o_orderkey IS NULL
   OR s.o_totalprice <> kk.o_totalprice
"""


def row_rule_orders(sf_dir: str) -> pd.DataFrame:
    """Row rule M5: ORDER BY pk LIMIT 100 OFFSET 50 semantics."""
    from .validate import apply_row_rule

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = apply_row_rule(ds, "o_orderkey", 50, 100).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


ROW_RULE_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 100 OFFSET 50
"""


def hot_sources_documents(sf_dir: str) -> pd.DataFrame:
    """Skew detection: sources holding >= 4% of documents."""
    from ..stages import skew

    ds = _read(sf_dir, "documents", ["source"])
    hot = skew.detect_hot_keys(ds, "source", threshold_frac=0.04)
    out = hot[["key", "n"]].copy()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("key").reset_index(drop=True)


HOT_SOURCES_DOCUMENTS_SQL = """
SELECT source AS key, count(*) AS n FROM documents
GROUP BY source
HAVING count(*) >= 0.04 * (SELECT count(*) FROM documents)
ORDER BY key
"""


def csv_lang_counts(sf_dir: str) -> pd.DataFrame:
    """CSV source path (S4): documents exported to CSV shards once
    (cached under /tmp), read back via the CSV reader, counted per
    lang — oracle checked against the parquet view."""
    import ray.data as rd  # noqa: F401

    from ray.data.aggregate import Count

    from ..sources import csvsrc

    import hashlib
    import os

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/graft_csv_{tag}"
    if not os.path.exists(os.path.join(d, "shard0.csv")):
        os.makedirs(d, exist_ok=True)
        import pyarrow.parquet as pq

        df = pq.read_table(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"]).to_pandas()
        n = max(1, len(df) // 4)
        for i in range(0, 4):
            part = df.iloc[i * n:(i + 1) * n if i < 3 else len(df)]
            part.to_csv(os.path.join(d, f"shard{i}.csv"), index=False)
        import json

        with open(os.path.join(d, "schema.json"), "w") as f:
            json.dump({"doc_id": "int64", "lang": "string"}, f)
    ds = csvsrc.read_csv_table(d)
    return ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()


CSV_LANG_COUNTS_SQL = """
SELECT lang, count(*) AS n FROM documents GROUP BY lang
"""


def simhash_near_dups_documents(sf_dir: str) -> pd.DataFrame:
    """SimHash near-duplicate pairs in the EXACT configuration
    (round-3 verdict #3b): rotations=4 × prefix_bits=16 are four
    DISJOINT 16-bit windows covering all 64 bits, so any pair within
    hamming ≤ 3 leaves at least one window untouched (pigeonhole) and
    shares that rotation's prefix — structural recall 1; the in-group
    popcount filter gives precision 1. The banded route's output is
    therefore exactly the all-pairs hamming ≤ 3 set, value-matched
    against the SQL oracle that recomputes the md5-variant simhashes
    and brute-forces ``bit_count(xor(...)) <= 3``. At corpus scale the
    same code runs with ``approx_rows``-scaled prefixes (recall < 1,
    documented trade); the gate pins the exact regime."""
    from ..stages import dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_near_duplicates(
        ds, "doc_id", "text", max_hamming=3, prefix_bits=16,
        rotations=4, hash_fn=textfn.md5_hash64,
        max_group_size=GATE_UNCAPPED_GROUP).to_pandas()


SIMHASH_NEAR_DUPS_DOCUMENTS_SQL = f"""
WITH {_SIMHASH_CTE},
full_sh AS (
  SELECT d.doc_id, coalesce(sh.simhash, 0::UBIGINT) AS simhash
  FROM documents d LEFT JOIN sh USING (doc_id)
)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM full_sh a JOIN full_sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def embedding_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH bucketing +
    within-bucket exact cosine, VALUE-MATCHED against a SQL oracle
    that replicates the bucketing (round-3 verdict #3c): the five
    seeded hyperplanes are inlined as SQL literals, the bucket is the
    sign pattern of the raw dot products (normalization never flips a
    sign; margin audited ≥ 2e-5 across the testdata vs ~1e-13 rounding
    noise), and the verify threshold 0.45 sits in the real cosine mass
    (nearest pair ≥ 1e-4 away — the ``embedding_dup_pairs_exact``
    audit). The oracle models the ALGORITHM — same-bucket pairs with
    cosine ≥ threshold — so the match holds regardless of LSH recall;
    recall vs the exact all-pairs sibling is asserted by pytest.
    ``use_float64`` pins double precision end-to-end for the gate;
    float32 stays the scale default."""
    from ..stages import dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = dedup.embedding_cosine_duplicates(
        ds, "vec_id", "embedding", threshold=0.45, num_buckets=32,
        use_float64=True, max_group_size=GATE_UNCAPPED_GROUP).to_pandas()
    return out[["a", "b"]].astype(np.int64)


def _embedding_lsh_sql(dim: int = 64, nbits: int = 5,
                       threshold: float = 0.45) -> str:
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((dim, nbits)).astype(np.float32)
    terms = []
    for j in range(nbits):
        vals = ", ".join(repr(float(v)) for v in planes[:, j])
        terms.append(f"(CASE WHEN list_dot_product(v, [{vals}]::DOUBLE[])"
                     f" > 0 THEN {1 << j} ELSE 0 END)")
    bucket = "\n     + ".join(terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v,
       {bucket} AS bucket
      FROM e)
SELECT b1.vec_id AS a, b2.vec_id AS b
FROM b b1 JOIN b b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
WHERE list_cosine_similarity(b1.v, b2.v) >= {threshold}
"""


EMBEDDING_DUP_PAIRS_SQL = _embedding_lsh_sql()


def embedding_dup_pairs_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT all-pairs embedding-cosine pairs at 0.45 — the oracle-
    checkable brute-force baseline for ``embedding_dup_pairs`` (whose
    LSH route and 0.99 threshold stay the scale path; the testdata has
    no pairs above 0.52, so a verifying threshold must sit in the real
    cosine mass). Threshold margin audited over the testdata: the
    nearest pair cosine is >= 1e-4 from 0.45 at every sf, four orders
    of magnitude above float32-vs-float64 evaluation noise, so the
    float64 matmul here and DuckDB's ``list_cosine_similarity`` select
    the identical id set."""
    from ..stages import dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_cosine_duplicates_exact(
        ds, "vec_id", "embedding", threshold=0.45).to_pandas()


EMBEDDING_DUP_PAIRS_EXACT_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.45
"""


def knn_ivf_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF top-10 neighbors of vec 0 via the PARTITIONED index + probe
    (only the probed cells' parquet files open — the genuine scale
    path). The GATE configuration probes ALL cells in float64, which
    makes IVF exact — the recall-vs-brute-force assertion made
    deterministic (round-2 verdict #8): the result must equal
    ``knn_embeddings`` and is oracle-checked by the same DuckDB
    ``list_cosine_similarity`` SQL. The pruned ``nprobe < cells``
    configuration is exercised by tests and remains the scale
    default of ``stages.similarity.ivf_topk_pruned``."""
    import shutil
    import tempfile

    from ..stages import similarity

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = None
    for b in ds.iter_batches(batch_size=256, batch_format="pandas"):
        m = b[b["vec_id"] == 0]
        if len(m):
            q = np.asarray(list(m["embedding"])[0],
                           dtype=np.float64)[None, :]
            break
    assert q is not None
    num_cells = 8
    cent = similarity.refine_ivf_centroids(
        ds, "embedding",
        similarity.train_ivf_centroids(ds, "embedding",
                                       num_cells=num_cells),
        iters=1)
    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        similarity.ivf_write_index(
            similarity.ivf_assign(ds, "vec_id", "embedding", cent), idx)
        out = similarity.ivf_topk_pruned(idx, "vec_id", "embedding",
                                         cent, q, k=11, nprobe=num_cells,
                                         dtype=np.float64)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out = out.sort_values(["cos", "vec_id"], ascending=[False, False])
    out = out[out["vec_id"] != 0].head(10)
    return out[["vec_id"]].reset_index(drop=True)


def multimodal_embeddings(sf_dir: str) -> pd.DataFrame:
    """Multimodal actor-pool pipeline with a REAL decode: each
    document's text bytes render deterministically into a binary ppm
    image payload, which the pure-numpy netpbm decoder decodes +
    resizes, then the feature stage pools into an embedding.

    ORACLE-CHECKED (round-2 verdict #8): the ppm pixels are exactly
    the first 3072 UTF-8 bytes of the text (space-padded), the 32->224
    nearest-neighbor resize repeats every pixel exactly 7x7 (uniform
    weights), and the 64 pooled chunks are equal-sized — so
    round(mean(embedding) * 255 * 3072) recovers the EXACT integer
    byte sum of the padded prefix, which DuckDB computes from
    hex(encode(text)). Float error budget: chunk means are float32
    (rel ~1e-7), sum <= 3072*255 ~ 7.8e5, absolute error ~0.2 < 0.5 —
    the round is always exact.

    Round 5: odd media_ids carry the SAME pixels as a real PNG
    (stdlib-zlib DEFLATE, Paeth-filtered scanlines) instead of ppm —
    identical decoded tensors, so the oracle is unchanged while the
    driver gate now exercises the compressed-format decode path
    (``multimodal.decode_png``) end-to-end."""
    import pyarrow as pa  # noqa: F811
    import ray.data as rd

    from ..stages import multimodal

    ds = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 64")
    rows = ds.to_pandas()

    def text_to_img(doc_id: int, t: str) -> bytes:
        raw = np.frombuffer(t.encode()[:3072].ljust(3072, b" "),
                            dtype=np.uint8).reshape(32, 32, 3)
        if doc_id % 2:  # odd ids: same pixels, real PNG payload
            return multimodal.encode_png(raw, filter_type=4)
        return multimodal.encode_ppm(raw)

    media = pa.table({
        "media_id": pa.array(rows["doc_id"].to_numpy(np.int64)),
        "payload": pa.array(
            [text_to_img(i, t)
             for i, t in zip(rows["doc_id"], rows["text"])],
            pa.large_binary()),
        "mime": pa.array(["image/png" if i % 2
                          else "image/x-portable-pixmap"
                          for i in rows["doc_id"]]),
        "width": pa.array(np.full(len(rows), 32, np.int32)),
        "height": pa.array(np.full(len(rows), 32, np.int32)),
        "duration_ms": pa.array(np.zeros(len(rows), np.int32)),
    })
    out = multimodal.decode_pipeline(
        rd.from_arrow(media), concurrency=2,
        cfg=multimodal.DecodeConfig(fake=False)).to_pandas()
    out["dim"] = out["embedding"].map(len)
    out["byte_sum"] = [
        int(round(float(np.mean(np.asarray(e, dtype=np.float64)))
                  * 255.0 * 3072.0))
        for e in out["embedding"]]
    return out[["media_id", "dim", "byte_sum"]] \
        .sort_values("media_id").reset_index(drop=True)


MULTIMODAL_EMBEDDINGS_SQL = """
WITH sel AS (
    SELECT doc_id AS media_id, encode(text) AS b
    FROM documents WHERE doc_id < 64
), padded AS (
    SELECT media_id, hex(b) AS hx,
           least(octet_length(b), 3072) AS n,
           3072 - least(octet_length(b), 3072) AS pad
    FROM sel
), sums AS (
    SELECT media_id,
           sum(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
               + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS s
    FROM padded, generate_series(1, 3072) AS g(i)
    WHERE i <= n
    GROUP BY media_id
)
SELECT p.media_id, 64 AS dim,
       CAST(COALESCE(s.s, 0) + p.pad * 32 AS BIGINT) AS byte_sum
FROM padded p LEFT JOIN sums s USING (media_id)
ORDER BY p.media_id
"""


# ---------------------------------------------------------------------------
# Streaming-shaped operators over the events table (SURVEY.md §2.9;
# Ray Data has no native event-time windows — expressed as groupby +
# in-group pandas over ts-sorted rows, ordering assumption documented)
# ---------------------------------------------------------------------------

def events_tumbling_window(sf_dir: str):
    """Tumbling 1-hour count per user: windowed aggregate expressed as
    a derived window-key column + pre-aggregated groupby (no sort
    needed — tumbling windows are embarrassingly groupable)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()
        bucket = us // np.int64(3600 * 1_000_000)
        return pa.table({"user_id": batch.column("user_id"),
                         "hour_bucket": pa.array(bucket, pa.int64())})

    return ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby(["user_id", "hour_bucket"]).aggregate(Count(alias_name="n"))


EVENTS_TUMBLING_WINDOW_SQL = """
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       count(*) AS n
FROM events GROUP BY user_id, hour_bucket
"""


def sessionize_events(ds, gap_us: int = 30 * 60 * 1_000_000):
    """Sessionization (inactivity-gap sessions): per-user sorted-by-ts
    session assignment inside ``groupby(user).map_groups`` — the
    within-group sort provides the event-time ordering Ray Data lacks.
    Returns one row per (user_id, session_id) with event count and
    session start.

    Partitioning assumption: one user's events fit one group
    (hash-partitioned by user_id). The in-group kernel is guarded for
    pathological users (round-2 verdict #10): pure int64 numpy
    (lexsort + diff + segment counts), no pandas sort/groupby copies —
    peak memory is ~3 int64 arrays of the group, so a 500k-event user
    costs ~12 MB and a 100M-event user ~2.4 GB (one worker's heap, the
    documented ceiling; beyond that, pre-split by coarse time slice
    and stitch sessions at slice boundaries)."""
    GAP = np.int64(gap_us)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(), us))
        us = us[order]
        new_session = np.r_[True, np.diff(us) > GAP]
        starts = np.flatnonzero(new_session)
        counts = np.diff(np.r_[starts, len(us)])
        return pd.DataFrame({
            "user_id": np.repeat(g["user_id"].iloc[0], len(starts)),
            "session_id": np.arange(len(starts), dtype=np.int64),
            "n_events": counts.astype(np.int64),
            "session_start_us": us[starts]})

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def events_sessionization(sf_dir: str):
    """Sessionization (30-min inactivity gap) over the events table —
    see ``sessionize_events``."""
    return sessionize_events(_read(sf_dir, "events",
                                   ["user_id", "ts", "event_id"]))


EVENTS_SESSIONIZATION_SQL = """
WITH ordered AS (
    SELECT user_id, ts, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS us,
           lag(CAST(epoch_us(ts) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR us - prev_us > 30 * 60 * 1000000
                   THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
sess AS (
    SELECT *, CAST(SUM(new_session)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                  AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(us) AS session_start_us
FROM sess GROUP BY user_id, session_id
"""


def monotonic_audit_events(sf_dir: str) -> pd.DataFrame:
    """Monotonicity audit per user: count events whose ``value``
    REGRESSES below the running maximum of any earlier event, ordered
    by (ts, event_id) — a deterministic total order since event_id is
    unique. This is the "monotonic counter" constraint (cumulative
    metrics, version columns, log offsets must not decrease): the
    reference's incremental path assumes exactly this of its change
    stream (Kafka offsets consumed in commit order; our
    ``sources/debezium.py`` keep-latest-by-offset compaction makes
    the same assumption) — here the assumption becomes a checkable
    per-key audit, one row per user with the event and regression
    counts.

    Partitioning: one user per group (hash-partitioned by user_id,
    the sessionization envelope); the in-group kernel is pure numpy —
    lexsort + running max + one comparison, ~3 arrays of the group.
    Null user_id/ts/event_id rows and null/non-finite values are
    excluded on BOTH engines (stated; DuckDB orders NaN above every
    double where numpy comparisons return False, so non-finite
    values cannot be allowed to reach the running max)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def drop_bad(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(batch.column("user_id")),
                            pc.is_valid(batch.column("ts"))),
                    pc.is_valid(batch.column("event_id")))
        m = pc.and_(m, pc.fill_null(
            pc.is_finite(batch.column("value")), False))
        return batch.filter(m)

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        us = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((g["event_id"].to_numpy(), us))
        v = g["value"].to_numpy()[order]
        n_reg = int(np.count_nonzero(
            v[1:] < np.maximum.accumulate(v)[:-1]))
        if n_reg == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_regressions": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "user_id": [np.int64(g["user_id"].iloc[0])],
            "n_events": [np.int64(len(v))],
            "n_regressions": [np.int64(n_reg)]})

    out = ds.map_batches(drop_bad, batch_format="pyarrow") \
        .groupby("user_id").map_groups(audit, batch_format="pandas")
    return _with_schema(out, ["user_id", "n_events", "n_regressions"],
                        {"user_id": np.int64, "n_events": np.int64,
                         "n_regressions": np.int64})


MONOTONIC_AUDIT_EVENTS_SQL = """
WITH o AS (
    SELECT user_id, value,
           max(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
      AND event_id IS NOT NULL
      AND value IS NOT NULL AND isfinite(value)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN value < prev_max THEN 1 ELSE 0 END)
            AS BIGINT) AS n_regressions
FROM o GROUP BY user_id
HAVING sum(CASE WHEN value < prev_max THEN 1 ELSE 0 END) > 0
"""


def lineitem_rollup(sf_dir: str):
    """TPC-H Q1-style pricing rollup (computed column + multi-agg
    groupby). Quantities are integral doubles in this data, so the sum
    is computed over BIGINT casts — exact on both engines (sum of
    float64 would be order-dependent in the last ulp)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_discount"])

    def cast_cols(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").cast(pa.int64())
        # discount in [0,1): scale to basis points for an exact int sum
        d = pc.multiply(batch.column("l_discount"), 10000.0)
        d = pc.round(d).cast(pa.int64())
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": q, "disc_bp": d,
        })

    return ds.map_batches(cast_cols, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Count(alias_name="cnt"),
            Sum("qty", alias_name="sum_qty"),
            Min("qty", alias_name="min_qty"),
            Max("qty", alias_name="max_qty"),
            Sum("disc_bp", alias_name="sum_disc_bp"))


LINEITEM_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS cnt,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
       CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty,
       CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT)
           AS sum_disc_bp
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- round-4 additions: substring-level dedup analytics + PII scan ----


def dup_spans_documents(sf_dir: str):
    """Cross-document duplicated k-gram span histogram (Lee-et-al-style
    substring dedup diagnostic, ``stages/dedup.dup_span_histogram``).
    VALUE-MATCHED: the SQL recomputes the same word 5-shingles (same
    tokenization as the minhash oracle) and groups by the shingle
    STRING, while the Ray side groups by the production 64-bit shingle
    hash — equality classes agree up to a 64-bit collision among the
    corpus's distinct shingles (~1e-8 at sf0.1; same accepted risk as
    every hash-bucketed stage here)."""
    from ..stages.dedup import dup_span_histogram

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_histogram(ds, "doc_id", "text", k=5)


# one shared word-5-shingle CTE drives all three span oracles below —
# a tokenizer / window-arithmetic change lands everywhere at once
# (review finding, round 4)
_SHINGLE_CTE_TMPL = r"""%(p)stoks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{N}_'']+') AS ws
  FROM %(rel)s
), %(p)sshl AS (
  SELECT doc_id, CASE
    WHEN len(ws) >= 5
      THEN [array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]
    WHEN len(ws) >= 1 THEN [array_to_string(ws, ' ')]
    ELSE [] END AS sh
  FROM %(p)stoks
), %(p)sex AS (
  SELECT DISTINCT doc_id, s
  FROM (SELECT doc_id, unnest(sh) AS s FROM %(p)sshl)
)"""


def _shingle_cte_for(rel: str, prefix: str = "") -> str:
    """The shared word-5-shingle CTE chain over an arbitrary relation,
    CTE names prefixed so several instances can coexist in one WITH
    (the composed v4 oracle shingles three different filtered sets)."""
    return _SHINGLE_CTE_TMPL % {"rel": rel, "p": prefix}


_SHINGLE_CTE_SQL = "WITH " + _shingle_cte_for("documents")

DUP_SPANS_DOCUMENTS_SQL = _SHINGLE_CTE_SQL + """, per AS (
  SELECT s, count(*) AS docs_sharing FROM ex GROUP BY s
)
SELECT docs_sharing, count(*) AS n_shingles FROM per GROUP BY docs_sharing
"""


# corpus-hitting extra patterns for the gate query: the synthetic
# documents table is lowercase ASCII word soup, so the PII presets
# legitimately count zero there (the oracle proves it); these two make
# the counts non-trivial on the same corpus.
_SCAN_TERM = r"\bspark\b"
_SCAN_BIGRAM = r"\btable table\b"


def pattern_scan_documents(sf_dir: str):
    """PII/pattern scan + redaction accounting per lang
    (``functions/textfn.pattern_counts`` / ``redact``). The PII presets
    (email/ipv4/phone) run for real over every document; the
    corpus-hitting term/bigram patterns exercise non-zero counts; and
    ``redacted_chars`` (total text length after redacting the term)
    drives the redact kernel end-to-end against DuckDB's
    ``regexp_replace(..., 'g')``. Counts pre-aggregate per batch by
    lang, so the shuffle carries one tiny partial row per (batch,
    lang), never text."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def scan(batch: pa.Table) -> pd.DataFrame:
        t = batch.column("text").to_pandas().fillna("")
        df = textfn.pattern_counts(t, textfn.PII_PATTERNS)
        df = df.rename(columns={n: f"n_{n}" for n in textfn.PII_PATTERNS})
        df["n_term"] = t.str.count(_SCAN_TERM).to_numpy(dtype=np.int64)
        df["n_bigram"] = t.str.count(_SCAN_BIGRAM).to_numpy(dtype=np.int64)
        df["redacted_chars"] = textfn.redact(t, [_SCAN_TERM]) \
            .str.len().to_numpy(dtype=np.int64)
        df["docs"] = np.int64(1)
        df["lang"] = batch.column("lang").to_pandas().fillna("").to_numpy(
            dtype=object)
        return df.groupby("lang", as_index=False).sum()

    cols = ["docs", "n_email", "n_ipv4", "n_phone", "n_term", "n_bigram",
            "redacted_chars"]
    return ds.map_batches(scan, batch_format="pyarrow") \
        .groupby("lang").aggregate(*[Sum(c, alias_name=c) for c in cols])


def _pattern_scan_sql() -> str:
    def cnt(pat: str, name: str) -> str:
        q = pat.replace("'", "''")  # SQL string-literal escaping
        return ("CAST(sum(len(regexp_extract_all(coalesce(text,''), "
                f"'{q}'))) AS BIGINT) AS {name}")

    from ..functions.textfn import PII_PATTERNS as P

    return f"""
SELECT coalesce(lang,'') AS lang, count(*) AS docs,
  {cnt(P["email"], "n_email")},
  {cnt(P["ipv4"], "n_ipv4")},
  {cnt(P["phone"], "n_phone")},
  {cnt(_SCAN_TERM, "n_term")},
  {cnt(_SCAN_BIGRAM, "n_bigram")},
  CAST(sum(length(regexp_replace(coalesce(text,''), '{_SCAN_TERM}',
      '[X]', 'g'))) AS BIGINT) AS redacted_chars
FROM documents GROUP BY coalesce(lang,'')
"""


PATTERN_SCAN_DOCUMENTS_SQL = _pattern_scan_sql()


def span_dup_scores_documents(sf_dir: str):
    """Per-document duplicated-span scores (the filter-side companion
    of ``dup_spans_documents`` — ``stages/dedup.span_dup_scores``),
    restricted to documents that share at least one 5-gram with
    another document. Same shingle-hash-vs-shingle-string oracle
    equivalence as ``dup_spans_documents``."""
    from ..stages.dedup import span_dup_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return span_dup_scores(ds, "doc_id", "text", k=5) \
        .filter(expr="n_dup_shingles > 0")


SPAN_DUP_SCORES_DOCUMENTS_SQL = _SHINGLE_CTE_SQL + """, per AS (
  SELECT s, count(*) AS c FROM ex GROUP BY s
)
SELECT e.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN p.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_shingles
FROM ex e JOIN per p ON e.s = p.s
GROUP BY e.doc_id
HAVING n_dup_shingles > 0
"""


def corpus_curation_v3(sf_dir: str,
                       flagged_broadcast_max: int | None = None
                       ) -> pd.DataFrame:
    """Curation pipeline composing the round-4 operators end-to-end,
    value-matched against ONE oracle: span-contamination filter (drop
    documents whose duplicated-5-gram fraction strictly exceeds 25% —
    ``stages/dedup.span_contamination_filter``, broadcast or left_anti
    join per its budget) -> PII/term redaction (``textfn.redact``) ->
    per-lang docs/tokens/chars rollup over the REDACTED text.
    Empty/null texts drop on both sides."""
    from ..stages.dedup import span_contamination_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    kept = span_contamination_filter(
        ds, "doc_id", "text", k=5, max_dup_ratio=0.25,
        flagged_broadcast_max=flagged_broadcast_max)

    def redact_partial(batch: pa.Table) -> pd.DataFrame:
        txt = batch.column("text")
        ok = pc.and_(pc.is_valid(txt), pc.not_equal(txt, ""))
        batch = batch.filter(ok)
        t = batch.column("text").to_pandas()
        rt = textfn.redact(t, [_SCAN_TERM])
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas().fillna("")
            .to_numpy(dtype=object),
            "n_docs": np.ones(len(rt), dtype=np.int64),
            "n_tokens": rt.str.count(TOKEN_RE).to_numpy(dtype=np.int64),
            "n_chars": rt.str.len().to_numpy(dtype=np.int64),
        })
        return df.groupby("lang", as_index=False).sum()

    parts = kept.map_batches(redact_partial,
                             batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"lang": pd.Series(dtype=object),
                             "n_docs": pd.Series(dtype=np.int64),
                             "n_tokens": pd.Series(dtype=np.int64),
                             "n_chars": pd.Series(dtype=np.int64)})
    out = parts.groupby("lang", sort=True, as_index=False).sum()
    for c in ("n_docs", "n_tokens", "n_chars"):
        out[c] = out[c].astype(np.int64)
    return out


def _curation_v3_sql() -> str:
    tok = TOKEN_RE.replace("'", "''")
    term = _SCAN_TERM.replace("'", "''")
    return _SHINGLE_CTE_SQL + f""", per AS (
  SELECT s, count(*) AS c FROM ex GROUP BY s
), sc AS (
  SELECT e.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN p.c >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM ex e JOIN per p ON e.s = p.s GROUP BY e.doc_id
), red AS (
  SELECT coalesce(d.lang, '') AS lang,
         regexp_replace(d.text, '{term}', '[X]', 'g') AS rt
  FROM documents d
  WHERE d.text IS NOT NULL AND d.text <> ''
    AND d.doc_id NOT IN (SELECT doc_id FROM sc WHERE n_dup * 4 > n_shingles)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(rt, '{tok}'))) AS BIGINT)
           AS n_tokens,
       CAST(sum(length(rt)) AS BIGINT) AS n_chars
FROM red GROUP BY lang
"""


CORPUS_CURATION_V3_SQL = _curation_v3_sql()


def neardup_components_documents(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate clusters with a keep-one verdict
    (``stages/components.neardup_components``): documents connect when
    they share a 5-token shingle held by 2..64 distinct documents;
    clusters come from min-label propagation (8-round budget,
    early-exit on the monotone label-sum certificate). Output
    ``(doc_id, comp, keep)`` — ``comp`` is the cluster's min doc_id,
    ``keep=1`` marks the representative. VALUE-MATCHED against an
    unrolled 8-round SQL propagation over the identical edge set (same
    shingle-hash-vs-string equivalence as ``dup_spans_documents``)."""
    from ..stages import components

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = components.neardup_components(ds, "doc_id", "text", k=5)
    df = _with_schema(out, ["doc_id", "comp", "keep"],
                      {"doc_id": np.int64, "comp": np.int64,
                       "keep": np.int64})
    return df.sort_values("doc_id").reset_index(drop=True)


def _cc_propagation_sql(exrel: str, rounds: int = 8,
                        max_docs: int = 64, min_docs: int = 2) -> str:
    """grp/star/edges/l0..lN clauses (min-label propagation, unrolled)
    over a shingle-pairs relation ``exrel``; the caller reads the final
    labels from ``l{rounds}``. AS MATERIALIZED: edges is referenced
    once per round and every round references its predecessor twice —
    without materialization DuckDB re-inlines the whole chain
    (2^rounds blowup)."""
    sql = f"""grp AS MATERIALIZED (
  SELECT s, min(doc_id) AS hub
  FROM {exrel} GROUP BY s HAVING count(*) BETWEEN {min_docs} AND {max_docs}
), star AS MATERIALIZED (
  SELECT DISTINCT e.doc_id AS a, g.hub AS b
  FROM {exrel} e JOIN grp g USING (s) WHERE e.doc_id <> g.hub
), edges AS MATERIALIZED (
  SELECT a, b FROM star UNION SELECT b AS a, a AS b FROM star
)"""
    return sql + ", " + _cc_label_rounds_sql(rounds)


def _cc_label_rounds_sql(rounds: int = 8) -> str:
    """l0..lN min-label propagation clauses over an ``edges`` relation
    (both directions present) — shared by the shingle-edge and the
    minhash-candidate-edge component oracles."""
    sql = """l0 AS MATERIALIZED (
  SELECT DISTINCT a AS n, a AS lbl FROM edges
)"""
    for i in range(1, rounds + 1):
        sql += f""", l{i} AS MATERIALIZED (
  SELECT n, min(lbl) AS lbl FROM (
    SELECT e.b AS n, l.lbl FROM edges e JOIN l{i - 1} l ON l.n = e.a
    UNION ALL SELECT n, lbl FROM l{i - 1}
  ) GROUP BY n
)"""
    return sql


def _neardup_components_sql(rounds: int = 8, max_docs: int = 64) -> str:
    return (_SHINGLE_CTE_SQL + ", "
            + _cc_propagation_sql("ex", rounds, max_docs) + f"""
SELECT n AS doc_id, lbl AS comp, CAST(n = lbl AS BIGINT) AS keep
FROM l{rounds}
""")


NEARDUP_COMPONENTS_DOCUMENTS_SQL = _neardup_components_sql()


GATE_CAP_PER_SOURCE_K = 10  # one constant drives BOTH engines


def cap_per_source_documents(sf_dir: str,
                             k: int = GATE_CAP_PER_SOURCE_K
                             ) -> pd.DataFrame:
    """Per-domain/source cap (``stages/sampling.cap_per_group``): keep
    at most k documents per source, chosen by the Knuth hash of doc_id
    — the CommonCrawl-style hot-domain limit, deterministic and
    SQL-reproducible (integer-exact QUALIFY oracle; use
    ``_cap_per_source_sql(k)`` for a non-default k)."""
    from ..stages import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    out = sampling.cap_per_group(ds, "source", "doc_id", k)
    df = _with_schema(out, ["doc_id", "source"],
                      {"doc_id": np.int64, "source": object})
    return df.sort_values("doc_id").reset_index(drop=True)


def _cap_per_source_sql(k: int = GATE_CAP_PER_SOURCE_K) -> str:
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, row_number() OVER (
    PARTITION BY source
    ORDER BY ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
             % 4294967296, doc_id) AS rn
  FROM documents) WHERE rn <= {k}
"""


CAP_PER_SOURCE_DOCUMENTS_SQL = _cap_per_source_sql()


GATE_PACK_CHUNK_TOKENS = 2048  # one constant drives BOTH engines


def pack_chunks_documents(sf_dir: str,
                          chunk_size: int = GATE_PACK_CHUNK_TOKENS
                          ) -> pd.DataFrame:
    """Sequence packing (``stages/packing.pack_chunks``): global token
    offset of every document in the id-ordered concatenated stream and
    the [chunk_first, chunk_last] span of 2048-token training chunks
    it lands in — a distributed two-pass prefix sum (per-range-bucket
    partials -> driver scan over one int per bucket -> broadcast).
    Integer-exact, value-matched against the SQL window prefix sum
    (use ``_pack_chunks_sql(chunk)`` for a non-default size)."""
    from ..stages import packing

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    weights = ds.map_batches(_token_count_batch, batch_format="pyarrow")
    out = packing.pack_chunks(weights, "doc_id", "n_tokens", chunk_size,
                              bucket_width=64)
    df = _with_schema(out, ["doc_id", "n_tokens", "offset",
                            "chunk_first", "chunk_last"],
                      {c: np.int64 for c in
                       ("doc_id", "n_tokens", "offset",
                        "chunk_first", "chunk_last")})
    return df.sort_values("doc_id").reset_index(drop=True)


def _pack_chunks_sql(chunk: int = GATE_PACK_CHUNK_TOKENS) -> str:
    tok = TOKEN_RE.replace("'", "''")
    return f"""
WITH w AS (
  SELECT doc_id,
         len(regexp_extract_all(coalesce(text, ''), '{tok}'))
             AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS "offset"
  FROM w
)
SELECT doc_id, n_tokens, "offset",
       "offset" // {chunk} AS chunk_first,
       CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // {chunk}
            ELSE "offset" // {chunk} END AS chunk_last
FROM o
"""


PACK_CHUNKS_DOCUMENTS_SQL = _pack_chunks_sql()


GATE_BENCH_MOD = 97  # doc_id % 97 == 0 is the pseudo-benchmark set


def _bench_split(is_ref: bool):
    """Batch filter for the deterministic pseudo-benchmark split —
    ONE predicate shared by decontaminate_documents and
    corpus_curation_v4 so the Ray side cannot drift from the
    ``doc_id % 97`` literals in their SQL oracles."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % GATE_BENCH_MOD == 0) if is_ref \
            else (ids % GATE_BENCH_MOD != 0)
        return batch.filter(pa.array(m))

    return f


def decontaminate_documents(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (``stages/dedup.ref_shingle_overlap``):
    the deterministic pseudo-benchmark is every doc with
    ``doc_id % 97 == 0``; for each remaining document, count its
    distinct 5-token shingles that also occur in the benchmark set
    (the GPT-3/Llama n-gram decontamination scan). Only contaminated
    docs (>= 1 overlapping shingle) return. Same shingle-hash-vs-string
    oracle equivalence as ``dup_spans_documents``."""
    from ..stages.dedup import ref_shingle_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    corpus = ds.map_batches(_bench_split(False), batch_format="pyarrow")
    ref = ds.map_batches(_bench_split(True), batch_format="pyarrow")
    out = ref_shingle_overlap(corpus, ref, "doc_id", "text", k=5)
    df = _with_schema(out, ["doc_id", "n_shingles", "n_ref_shingles"],
                      {c: np.int64 for c in
                       ("doc_id", "n_shingles", "n_ref_shingles")})
    return df.sort_values("doc_id").reset_index(drop=True)


DECONTAMINATE_DOCUMENTS_SQL = _SHINGLE_CTE_SQL + """, ref AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0
)
SELECT e.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ref_shingles
FROM ex e LEFT JOIN ref r ON e.s = r.s
WHERE e.doc_id % 97 <> 0
GROUP BY e.doc_id
HAVING n_ref_shingles > 0
"""


def corpus_curation_v4(sf_dir: str) -> pd.DataFrame:
    """Capstone curation pipeline composing the four round-4
    continuation operators end-to-end under ONE oracle:

    1. split off the deterministic pseudo-benchmark (doc_id % 97 == 0);
    2. hot-domain cap — keep <= 15 docs per source by Knuth-hash order
       (``sampling.cap_per_group``);
    3. benchmark decontamination — drop any capped doc sharing a
       5-token shingle with the benchmark set
       (``dedup.ref_shingle_overlap`` + ``filter_out_ids``);
    4. near-dup keep-one — connected components over shared-shingle
       star edges, drop every non-representative
       (``components.neardup_components``);
    5. sequence packing — global token offsets / 2048-token chunk
       spans over the survivors (``packing.pack_chunks``);
    6. per-source rollup: n_docs, n_tokens, first/last chunk touched.

    Every stage is the production operator, unmodified; the SQL oracle
    recomputes the identical pipeline (three prefixed shingle-CTE
    instances over the successive filtered sets + the unrolled
    propagation)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages import components, packing, sampling
    from ..stages.dedup import filter_out_ids, ref_shingle_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    corpus = ds.map_batches(_bench_split(False), batch_format="pyarrow")
    bench = ds.map_batches(_bench_split(True), batch_format="pyarrow") \
        .select_columns(["doc_id", "text"])

    capped = sampling.cap_per_group(corpus, "source", "doc_id",
                                    V4_CAP_K) \
        .materialize()  # consumed by the overlap scan AND the filter
    flagged = ref_shingle_overlap(capped, bench, "doc_id", "text", k=5)
    clean = filter_out_ids(capped, flagged, "doc_id").materialize()
    losers = components.neardup_components(clean, "doc_id", "text", k=5) \
        .filter(expr="keep == 0")
    kept = filter_out_ids(clean, losers, "doc_id")

    packed = packing.pack_chunks(
        kept.map_batches(
            lambda b: _token_count_batch(b, ("doc_id", "source")),
            batch_format="pyarrow"),
        "doc_id", "n_tokens", GATE_PACK_CHUNK_TOKENS, bucket_width=64,
        carry_cols=["source"])
    out = packed.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Min("chunk_first", alias_name="first_chunk"),
        Max("chunk_last", alias_name="last_chunk"))
    df = _with_schema(out, ["source", "n_docs", "n_tokens",
                            "first_chunk", "last_chunk"],
                      {"source": object} | {c: np.int64 for c in
                       ("n_docs", "n_tokens", "first_chunk",
                        "last_chunk")})
    return df.sort_values("source").reset_index(drop=True)


V4_CAP_K = 15  # one constant drives BOTH v4 engines


def _curation_v4_sql(cap_k: int = V4_CAP_K,
                     chunk: int = GATE_PACK_CHUNK_TOKENS) -> str:
    tok = TOKEN_RE.replace("'", "''")
    return ("WITH base AS MATERIALIZED (\n"
            "  SELECT doc_id, source, text FROM documents"
            " WHERE doc_id % 97 <> 0\n"
            "), refdocs AS MATERIALIZED (\n"
            "  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0\n"
            "), " + _shingle_cte_for("refdocs", "r") + f""", capped AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text, row_number() OVER (
      PARTITION BY source
      ORDER BY ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
               % 4294967296, doc_id) AS rn
    FROM base) WHERE rn <= {cap_k}
), """ + _shingle_cte_for("capped", "c") + """, cont AS MATERIALIZED (
  SELECT DISTINCT e.doc_id
  FROM cex e JOIN (SELECT DISTINCT s FROM rex) r USING (s)
), clean AS MATERIALIZED (
  SELECT * FROM capped
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
), """ + _shingle_cte_for("clean", "k") + ", "
            + _cc_propagation_sql("kex") + f""", kept AS MATERIALIZED (
  SELECT doc_id, source, text FROM clean
  WHERE doc_id NOT IN (SELECT n FROM l8 WHERE n <> lbl)
), w AS MATERIALIZED (
  SELECT doc_id, source,
         len(regexp_extract_all(coalesce(text, ''), '{tok}')) AS nt
  FROM kept
), o AS MATERIALIZED (
  SELECT source, CAST(nt AS BIGINT) AS nt,
         CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM w
)
SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
       min(off // {chunk}) AS first_chunk,
       max(CASE WHEN nt > 0 THEN (off + nt - 1) // {chunk}
                ELSE off // {chunk} END) AS last_chunk
FROM o GROUP BY source
""")


CORPUS_CURATION_V4_SQL = _curation_v4_sql()


def minhash_dedup_keep_documents(sf_dir: str) -> pd.DataFrame:
    """The production fuzzy-dedup composition end-to-end: MinHash-LSH
    candidate pairs (gate configuration of ``minhash_lsh_candidates``,
    so the SQL replica emits the identical pair set) -> connected
    components (min-label propagation) -> keep-one verdict. Output
    ``(doc_id, comp, keep)`` for every doc in at least one candidate
    pair. VALUE-MATCHED: the oracle chains the exact minhash SQL
    replica into the same unrolled 8-round propagation."""
    from ..stages import components

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _gate_minhash_pairs(ds)
    labels, _, _ = components.connected_components(
        components.mirror_pairs(pairs))
    out = components.keep_one_verdict(labels, "doc_id")
    df = _with_schema(out, ["doc_id", "comp", "keep"],
                      {c: np.int64 for c in ("doc_id", "comp", "keep")})
    return df.sort_values("doc_id").reset_index(drop=True)


def _minhash_components_sql(rounds: int = 8) -> str:
    ctes, select = _minhash_lsh_parts()
    return ("WITH " + ctes + f""", cand AS MATERIALIZED (
{select}
), edges AS MATERIALIZED (
  SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand
), """ + _cc_label_rounds_sql(rounds) + f"""
SELECT n AS doc_id, lbl AS comp, CAST(n = lbl AS BIGINT) AS keep
FROM l{rounds}
""")


MINHASH_DEDUP_KEEP_DOCUMENTS_SQL = _minhash_components_sql()


# ---------------------------------------------------------------------------
# Round-4 continuation #3: normalization, Gopher quality filter,
# keyword search, JSONL sink/source round-trip
# ---------------------------------------------------------------------------

def normalize_text_documents(sf_dir: str) -> pd.DataFrame:
    """Text canonicalization with byte-parity proof
    (``functions/textfn.normalize_text``): NFC -> lower -> trim ->
    whitespace collapse, per doc, emitting the normalized char count
    and the low-64-bit md5 content hash. Because every kernel is
    utf8proc/RE2 on BOTH engines, the oracle hash-matches only when
    the normalized byte stream is identical — this is the same
    canonicalize-before-digest contract as the compare pipeline's
    M1 type canonicalizer, applied to web text. Pure map_batches;
    no shuffle at any scale."""

    def f(batch: pa.Table) -> pa.Table:
        norm = textfn.normalize_text(batch.column("text"))
        h = textfn.md5_hash64(norm.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "norm_chars": pc.utf8_length(norm).cast(pa.int64()),
            "norm_hash": pa.array(h, type=pa.uint64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(f, batch_format="pyarrow")
    df = _with_schema(out, ["doc_id", "norm_chars", "norm_hash"],
                      {"doc_id": np.int64, "norm_chars": np.int64,
                       "norm_hash": np.uint64})
    return df.sort_values("doc_id").reset_index(drop=True)


NORMALIZE_TEXT_DOCUMENTS_SQL = r"""
SELECT doc_id, CAST(len(x) AS BIGINT) AS norm_chars,
       CAST(md5_number_lower(x) AS UBIGINT) AS norm_hash
FROM (SELECT doc_id,
             regexp_replace(regexp_replace(
                 lower(nfc_normalize(coalesce(text, ''))),
                 '^\s+|\s+$', '', 'g'), '\s+', ' ', 'g') AS x
      FROM documents)
"""


# Gopher-rule thresholds (Rae et al. 2021 app. A1.1 family) — one set
# of integer constants drives BOTH engines.
GATE_GOPHER_MIN_WORDS = 30
GATE_GOPHER_MAX_WORDS = 50000
GATE_GOPHER_MWL_LO = 2       # mean word length lower bound
GATE_GOPHER_MWL_HI = 10      # mean word length upper bound
GATE_GOPHER_DISTINCT_MULT = 5  # keep iff 5 * n_distinct > n_words
GATE_GOPHER_MIN_STOP = 2


def _gopher_keep_mask(feats: pd.DataFrame) -> np.ndarray:
    """ONE boolean rule expression shared by the gate query and the
    v5 curation stage, so the Ray side cannot drift from the literals
    in their SQL oracles (the ``_bench_split`` discipline)."""
    nw = feats["n_words"].to_numpy()
    wc = feats["sum_word_chars"].to_numpy()
    nd = feats["n_distinct_words"].to_numpy()
    ns = feats["n_stopwords"].to_numpy()
    return ((nw >= GATE_GOPHER_MIN_WORDS)
            & (nw <= GATE_GOPHER_MAX_WORDS)
            & (GATE_GOPHER_MWL_LO * nw <= wc)
            & (wc <= GATE_GOPHER_MWL_HI * nw)
            & (GATE_GOPHER_DISTINCT_MULT * nd > nw)
            & (ns >= GATE_GOPHER_MIN_STOP))


def _gopher_keep_batch(batch: pa.Table, text_col: str = "text"
                       ) -> pa.Table:
    """Filter a batch to Gopher-rule survivors, keeping ALL columns —
    the composable stage form used by ``corpus_curation_v5`` and the
    ``curate --gopher-filter`` CLI."""
    feats = textfn.gopher_features(batch.column(text_col))
    return batch.filter(pa.array(_gopher_keep_mask(feats)))


def gopher_filter_documents(sf_dir: str) -> pd.DataFrame:
    """Gopher-style document quality filter
    (``functions/textfn.gopher_features``): keep documents with
    30 <= n_words <= 50000, mean word length in [2, 10] (evaluated as
    ``2*n <= sum_chars <= 10*n`` so it stays integer-exact), distinct
    fraction > 1/5 (``5*n_distinct > n_words``) and >= 2 stopwords.
    Returns kept docs WITH the integer evidence columns, so the SQL
    oracle value-matches the full decision basis, not just the id
    list. Embarrassingly parallel map_batches -> filter; nothing
    shuffles at any corpus size."""

    def f(batch: pa.Table) -> pa.Table:
        feats = textfn.gopher_features(batch.column("text"))
        keep = _gopher_keep_mask(feats)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(feats["n_words"].to_numpy()),
            "sum_word_chars":
                pa.array(feats["sum_word_chars"].to_numpy()),
            "n_distinct_words":
                pa.array(feats["n_distinct_words"].to_numpy()),
            "n_stopwords": pa.array(feats["n_stopwords"].to_numpy()),
        }).filter(pa.array(keep))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(f, batch_format="pyarrow")
    cols = ["doc_id", "n_words", "sum_word_chars", "n_distinct_words",
            "n_stopwords"]
    df = _with_schema(out, cols, {c: np.int64 for c in cols})
    return df.sort_values("doc_id").reset_index(drop=True)


def _gopher_filter_sql(rel: str = "documents") -> str:
    from ..functions.textfn import GOPHER_STOPWORDS

    tok = TOKEN_RE.replace("'", "''")
    stop_pred = " OR ".join(f"x = '{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{tok}') AS ws
  FROM {rel}
), f AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(coalesce(list_aggregate(
             list_transform(ws, x -> len(x)), 'sum'), 0) AS BIGINT)
             AS sum_word_chars,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
         CAST(len(list_filter(ws, x -> {stop_pred})) AS BIGINT)
             AS n_stopwords
  FROM toks)
SELECT * FROM f
WHERE n_words BETWEEN {GATE_GOPHER_MIN_WORDS} AND {GATE_GOPHER_MAX_WORDS}
  AND {GATE_GOPHER_MWL_LO} * n_words <= sum_word_chars
  AND sum_word_chars <= {GATE_GOPHER_MWL_HI} * n_words
  AND {GATE_GOPHER_DISTINCT_MULT} * n_distinct_words > n_words
  AND n_stopwords >= {GATE_GOPHER_MIN_STOP}
"""


GOPHER_FILTER_DOCUMENTS_SQL = _gopher_filter_sql()


# Fixed gate search vocabulary + result size: integer tf ranking keeps
# the top-k bit-exact (no float scores to tie-break differently).
GATE_SEARCH_TERMS = ("vector", "spark", "window")
GATE_SEARCH_TOPK = 100


def keyword_search_documents(sf_dir: str,
                             terms: tuple[str, ...] = GATE_SEARCH_TERMS,
                             k: int = GATE_SEARCH_TOPK) -> pd.DataFrame:
    """Distributed keyword search over the corpus
    (``functions/textfn.term_frequencies``): exact token-equality term
    frequencies for a fixed query vocabulary, ranked by total tf with
    doc_id as the deterministic tie-break. Scale path: each block
    emits at most k rows (local partial top-k inside ``map_batches``,
    the ``similarity.py`` brute-force-ANN shape), the driver merges
    k x n_blocks candidate rows — no global sort, no shuffle. Integer
    ranking means the SQL ``ORDER BY total_tf DESC, doc_id LIMIT k``
    oracle matches bit-for-bit; a float BM25 score is the same
    plumbing with tf/dl/df plugged into the closed form."""

    def f(batch: pa.Table) -> pd.DataFrame:
        tf, dl = textfn.term_frequencies(batch.column("text"), terms)
        total = tf.sum(axis=1)
        df = pd.DataFrame({"doc_id": batch.column("doc_id").to_numpy()})
        for j, t in enumerate(terms):
            df[f"tf_{t}"] = tf[:, j]
        df["dl"] = dl
        df["total_tf"] = total
        df = df[df["total_tf"] > 0]
        return df.sort_values(["total_tf", "doc_id"],
                              ascending=[False, True]).head(k)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cols = (["doc_id"] + [f"tf_{t}" for t in terms] + ["dl", "total_tf"])
    df = _with_schema(ds.map_batches(f, batch_format="pyarrow"),
                      cols, {c: np.int64 for c in cols})
    df = df.sort_values(["total_tf", "doc_id"],
                        ascending=[False, True]).head(k)
    return df.sort_values("doc_id").reset_index(drop=True)


def _keyword_search_sql(terms: tuple[str, ...] = GATE_SEARCH_TERMS,
                        k: int = GATE_SEARCH_TOPK) -> str:
    # terms may contain apostrophes (TOKEN_RE tokens can: "don't"):
    # escape the literal and double-quote the alias. Tokens cannot
    # contain double quotes, so the quoted alias needs no escaping.
    tok = TOKEN_RE.replace("'", "''")
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t.replace(chr(39), chr(39) * 2)}'))"
        f" AS BIGINT) AS \"tf_{t}\""
        for t in terms)
    total = " + ".join(f'"tf_{t}"' for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{tok}') AS ws
  FROM documents
), f AS (
  SELECT doc_id,
         {tf_cols},
         CAST(len(ws) AS BIGINT) AS dl
  FROM toks)
SELECT *, CAST({total} AS BIGINT) AS total_tf FROM f
WHERE {total} > 0
ORDER BY total_tf DESC, doc_id
LIMIT {k}
"""


KEYWORD_SEARCH_DOCUMENTS_SQL = _keyword_search_sql()


def jsonl_roundtrip_documents(sf_dir: str) -> pd.DataFrame:
    """JSONL sink + source round-trip validation — the newline-
    delimited-JSON interchange format of Common-Crawl-style corpora,
    added beside the CSV slice reader (reference parity:
    ``sources/csvsrc.py``; the reference's extract side reads
    table slices, here the slice IS a JSONL shard). Writes
    (doc_id, text, lang) as sharded JSONL under /tmp via
    ``Dataset.write_json``, reads it back with ``ray.data.read_json``,
    and rolls up per lang: doc count, doc_id sum, char sum, and the
    order-independent XOR of per-doc md5 content hashes. The oracle
    computes the identical rollup straight from the parquet view —
    any escaping / unicode / numeric-precision corruption in the
    encode-decode cycle breaks the hash match. Per-batch partials
    (<= n_langs rows each) fold on the driver; nothing wide."""
    import os
    import shutil

    import ray.data as rd

    out_dir = ("/tmp/graft_jsonl_"
               f"{os.path.basename(os.path.normpath(sf_dir))}"
               f"_{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    _read(sf_dir, "documents",
          ["doc_id", "text", "lang"]).write_json(out_dir)

    def partial(batch: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(batch.column("text"), "")
        b = pd.DataFrame({
            "lang": batch.column("lang").to_numpy(
                zero_copy_only=False),
            "doc_id": batch.column("doc_id").to_numpy(),
            "chars": pc.utf8_length(txt).cast(pa.int64()).to_numpy(),
            "h": textfn.md5_hash64(
                txt.to_numpy(zero_copy_only=False)),
        })
        # dropna=False: a NULL lang is a group (matches SQL GROUP BY)
        return b.groupby("lang", dropna=False, as_index=False).agg(
            n_docs=("doc_id", "size"), sum_doc_id=("doc_id", "sum"),
            sum_chars=("chars", "sum"),
            text_hash_xor=("h", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))))

    xor_fold = ("text_hash_xor", lambda s: np.bitwise_xor.reduce(
        s.to_numpy(dtype=np.uint64)))
    try:
        parts = rd.read_json(out_dir).map_batches(
            partial, batch_format="pyarrow").to_pandas()
        if parts.empty:
            return pd.DataFrame({
                "lang": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype=np.int64),
                "sum_doc_id": pd.Series(dtype=np.int64),
                "sum_chars": pd.Series(dtype=np.int64),
                "text_hash_xor": pd.Series(dtype=np.uint64)})
        out = parts.groupby("lang", dropna=False, as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_doc_id=("sum_doc_id", "sum"),
            sum_chars=("sum_chars", "sum"), text_hash_xor=xor_fold)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out["text_hash_xor"] = out["text_hash_xor"].astype(np.uint64)
    return out.sort_values("lang").reset_index(drop=True)


JSONL_ROUNDTRIP_DOCUMENTS_SQL = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS sum_chars,
       bit_xor(CAST(md5_number_lower(coalesce(text, '')) AS UBIGINT))
           AS text_hash_xor
FROM documents GROUP BY lang
"""


def corpus_curation_v5(sf_dir: str) -> pd.DataFrame:
    """Capstone curation v5 = v4 with the Gopher quality gate as the
    first corpus stage — the full modern curation recipe under ONE
    end-to-end oracle:

    1. split off the deterministic pseudo-benchmark (doc_id % 97 == 0);
    2. Gopher-rule quality filter (``_gopher_keep_batch``, map-only);
    3. hot-domain cap — <= 15 docs per source by Knuth-hash order;
    4. benchmark decontamination (shingle overlap vs the benchmark);
    5. near-dup keep-one via connected components;
    6. sequence packing over the survivors;
    7. per-source rollup: n_docs, n_tokens, first/last chunk touched.

    Every stage is the production operator, unmodified. The SQL oracle
    chains the gopher CTE (same ``_gopher_filter_sql`` literals)
    between the benchmark split and the cap, then reuses the v4 chain
    verbatim."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages import components, packing, sampling
    from ..stages.dedup import filter_out_ids, ref_shingle_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    corpus = ds.map_batches(_bench_split(False), batch_format="pyarrow")
    bench = ds.map_batches(_bench_split(True), batch_format="pyarrow") \
        .select_columns(["doc_id", "text"])

    qual = corpus.map_batches(_gopher_keep_batch,
                              batch_format="pyarrow")
    capped = sampling.cap_per_group(qual, "source", "doc_id",
                                    V4_CAP_K) \
        .materialize()  # consumed by the overlap scan AND the filter
    flagged = ref_shingle_overlap(capped, bench, "doc_id", "text", k=5)
    clean = filter_out_ids(capped, flagged, "doc_id").materialize()
    losers = components.neardup_components(clean, "doc_id", "text",
                                           k=5) \
        .filter(expr="keep == 0")
    kept = filter_out_ids(clean, losers, "doc_id")

    packed = packing.pack_chunks(
        kept.map_batches(
            lambda b: _token_count_batch(b, ("doc_id", "source")),
            batch_format="pyarrow"),
        "doc_id", "n_tokens", GATE_PACK_CHUNK_TOKENS, bucket_width=64,
        carry_cols=["source"])
    out = packed.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Min("chunk_first", alias_name="first_chunk"),
        Max("chunk_last", alias_name="last_chunk"))
    df = _with_schema(out, ["source", "n_docs", "n_tokens",
                            "first_chunk", "last_chunk"],
                      {"source": object} | {c: np.int64 for c in
                       ("n_docs", "n_tokens", "first_chunk",
                        "last_chunk")})
    return df.sort_values("source").reset_index(drop=True)


def _curation_v5_sql(cap_k: int = V4_CAP_K,
                     chunk: int = GATE_PACK_CHUNK_TOKENS) -> str:
    tok = TOKEN_RE.replace("'", "''")
    return ("WITH base AS MATERIALIZED (\n"
            "  SELECT doc_id, source, text FROM documents"
            " WHERE doc_id % 97 <> 0\n"
            "), refdocs AS MATERIALIZED (\n"
            "  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0\n"
            "), " + _shingle_cte_for("refdocs", "r")
            + f""", qual AS MATERIALIZED (
  SELECT b.doc_id, b.source, b.text
  FROM base b JOIN ({_gopher_filter_sql("base")}) g USING (doc_id)
), capped AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text, row_number() OVER (
      PARTITION BY source
      ORDER BY ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
               % 4294967296, doc_id) AS rn
    FROM qual) WHERE rn <= {cap_k}
), """ + _shingle_cte_for("capped", "c") + """, cont AS MATERIALIZED (
  SELECT DISTINCT e.doc_id
  FROM cex e JOIN (SELECT DISTINCT s FROM rex) r USING (s)
), clean AS MATERIALIZED (
  SELECT * FROM capped
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
), """ + _shingle_cte_for("clean", "k") + ", "
            + _cc_propagation_sql("kex") + f""", kept AS MATERIALIZED (
  SELECT doc_id, source, text FROM clean
  WHERE doc_id NOT IN (SELECT n FROM l8 WHERE n <> lbl)
), w AS MATERIALIZED (
  SELECT doc_id, source,
         len(regexp_extract_all(coalesce(text, ''), '{tok}')) AS nt
  FROM kept
), o AS MATERIALIZED (
  SELECT source, CAST(nt AS BIGINT) AS nt,
         CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM w
)
SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
       min(off // {chunk}) AS first_chunk,
       max(CASE WHEN nt > 0 THEN (off + nt - 1) // {chunk}
                ELSE off // {chunk} END) AS last_chunk
FROM o GROUP BY source
""")


CORPUS_CURATION_V5_SQL = _curation_v5_sql()


GATE_BM25_K1 = 1.2
GATE_BM25_B = 0.75


def bm25_search_documents(sf_dir: str,
                          terms: tuple[str, ...] = GATE_SEARCH_TERMS,
                          k: int = GATE_SEARCH_TOPK,
                          k1: float = GATE_BM25_K1,
                          b: float = GATE_BM25_B) -> pd.DataFrame:
    """Full BM25 retrieval, bit-exact to the SQL oracle — the float
    companion to ``keyword_search_documents``. Two distributed passes,
    each a column-pruned read (the 100-TB path: no materialization
    between passes):

    1. corpus-stats fold: per-block partials (doc count, total tokens,
       per-term document frequency) -> a few ints on the driver;
       idf_t = ln(1 + (N - df + 0.5)/(df + 0.5)) via ``math.log``
       (libm — verified bit-identical to DuckDB ``ln``; numpy's log
       is NOT and is deliberately avoided);
    2. scoring: per-doc BM25 from tf/dl using ONLY IEEE-exact + * /
       in a parenthesization mirrored literally by the oracle, then
       per-block partial top-k by (score DESC, doc_id) — <= k rows
       leave each block, the driver merges.

    The same discipline as ``quality_documents``' bit-exact claim:
    identical doubles, not "close"."""
    import math

    if not len(terms):
        raise ValueError("bm25 needs at least one query term")

    def stats(batch: pa.Table) -> pd.DataFrame:
        tf, dl = textfn.term_frequencies(batch.column("text"), terms)
        row = {"n": [len(dl)], "sum_dl": [int(dl.sum())]}
        for j in range(len(terms)):
            row[f"df_{j}"] = [int((tf[:, j] > 0).sum())]
        return pd.DataFrame(row)

    p = _read(sf_dir, "documents", ["text"]).map_batches(
        stats, batch_format="pyarrow").to_pandas()
    n_docs = int(p["n"].sum()) if "n" in p.columns else 0
    cols = ["doc_id", "bm25", "dl", "total_tf"]
    dtypes = {"doc_id": np.int64, "bm25": np.float64,
              "dl": np.int64, "total_tf": np.int64}
    if n_docs == 0:
        return pd.DataFrame({c: pd.Series(dtype=dtypes[c])
                             for c in cols})
    avgdl = float(int(p["sum_dl"].sum())) / float(n_docs)
    idf = [math.log(1.0 + (n_docs - int(p[f"df_{j}"].sum()) + 0.5)
                    / (int(p[f"df_{j}"].sum()) + 0.5))
           for j in range(len(terms))]
    c1, c2, c3 = k1 + 1.0, k1 * (1.0 - b), k1 * b

    def score(batch: pa.Table) -> pd.DataFrame:
        tf, dl = textfn.term_frequencies(batch.column("text"), terms)
        dlr = dl.astype(np.float64) / avgdl
        s = np.zeros(len(dl), dtype=np.float64)
        for j in range(len(terms)):
            tfj = tf[:, j].astype(np.float64)
            s = s + idf[j] * ((tfj * c1) / (tfj + (c2 + c3 * dlr)))
        out = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(),
            "bm25": s, "dl": dl, "total_tf": tf.sum(axis=1)})
        out = out[out["total_tf"] > 0]
        return out.sort_values(["bm25", "doc_id"],
                               ascending=[False, True]).head(k)

    df = _with_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            score, batch_format="pyarrow"), cols, dtypes)
    df = df.sort_values(["bm25", "doc_id"],
                        ascending=[False, True]).head(k)
    return df.sort_values("doc_id").reset_index(drop=True)


def _bm25_search_sql(terms: tuple[str, ...] = GATE_SEARCH_TERMS,
                     k: int = GATE_SEARCH_TOPK,
                     k1: float = GATE_BM25_K1,
                     b: float = GATE_BM25_B) -> str:
    tok = TOKEN_RE.replace("'", "''")
    c1, c2, c3 = k1 + 1.0, k1 * (1.0 - b), k1 * b
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(ws, x -> x ="
        f" '{t.replace(chr(39), chr(39) * 2)}')) AS BIGINT)"
        f" AS tf_{j}" for j, t in enumerate(terms))
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{j} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{j}" for j in range(len(terms)))
    idf_cols = ",\n         ".join(
        f"ln(1.0 + (n - df_{j} + 0.5) / (df_{j} + 0.5)) AS idf_{j}"
        for j in range(len(terms)))
    term_exprs = [
        f"idf_{j} * ((CAST(tf_{j} AS DOUBLE) * CAST({c1!r} AS DOUBLE))"
        f" / (CAST(tf_{j} AS DOUBLE) + (CAST({c2!r} AS DOUBLE)"
        f" + CAST({c3!r} AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl))))"
        for j in range(len(terms))]
    scoresum = term_exprs[0]
    for e in term_exprs[1:]:
        scoresum = f"({scoresum} + {e})"
    total = " + ".join(f"tf_{j}" for j in range(len(terms)))
    return f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '{tok}') AS ws
  FROM documents
), f AS (
  SELECT doc_id,
         {tf_cols},
         CAST(len(ws) AS BIGINT) AS dl
  FROM toks
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {df_cols}
  FROM f
), idf AS (
  SELECT avgdl,
         {idf_cols}
  FROM stats
)
SELECT doc_id, {scoresum} AS bm25, dl,
       CAST({total} AS BIGINT) AS total_tf
FROM f, idf
WHERE {total} > 0
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""


BM25_SEARCH_DOCUMENTS_SQL = _bm25_search_sql()


GATE_WINNOW_K = 5       # char k-gram size
GATE_WINNOW_WINDOW = 4  # rolling-min window (Schleimer et al. 2003)


def winnowing_profile_documents(sf_dir: str,
                                k: int = GATE_WINNOW_K,
                                window: int = GATE_WINNOW_WINDOW
                                ) -> pd.DataFrame:
    """Per-document winnowing fingerprint profile
    (``functions/textfn.winnowing_fingerprints``): distinct-fingerprint
    count + order-independent XOR per doc, with md5 char-k-gram hashes
    so the SQL oracle recomputes the identical fingerprint sets
    (substr + generate_series explode, window-min, DISTINCT XOR).
    Lowercasing happens ONCE via Arrow ``utf8_lower`` (utf8proc =
    DuckDB ``lower``) before the per-doc gram explode — the explode
    itself is the module's documented unavoidable per-row step, same
    as ``shingle_hashes``. Map-only; no shuffle at any scale."""

    def f(batch: pa.Table) -> pd.DataFrame:
        txt = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        ids = batch.column("doc_id").to_numpy()
        n = np.zeros(len(ids), dtype=np.int64)
        x = np.zeros(len(ids), dtype=np.uint64)
        for i, t in enumerate(txt.to_pylist()):
            fp = textfn.winnowing_fingerprints(
                t, k=k, window=window, hash_fn=textfn.md5_hash64,
                lower=False)
            if len(fp):
                n[i] = len(fp)
                x[i] = np.bitwise_xor.reduce(fp)
        return pd.DataFrame({"doc_id": ids, "n_fps": n, "fp_xor": x})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    df = _with_schema(ds.map_batches(f, batch_format="pyarrow"),
                      ["doc_id", "n_fps", "fp_xor"],
                      {"doc_id": np.int64, "n_fps": np.int64,
                       "fp_xor": np.uint64})
    return df.sort_values("doc_id").reset_index(drop=True)


def _winnowing_sql(k: int = GATE_WINNOW_K,
                   window: int = GATE_WINNOW_WINDOW) -> str:
    return f"""
WITH pos AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
), g AS (
  SELECT doc_id, i,
         CAST(md5_number_lower(substr(t, CAST(i AS INTEGER), {k}))
              AS UBIGINT) AS h
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {k - 1})) AS i
        FROM pos)
), c AS (
  SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
), w AS (
  SELECT g.doc_id,
         min(h) OVER (PARTITION BY g.doc_id ORDER BY i
                      ROWS BETWEEN {window - 1} PRECEDING
                      AND CURRENT ROW) AS m,
         i, c.ng
  FROM g JOIN c USING (doc_id)
), sel AS (
  SELECT doc_id, m FROM w
  WHERE (ng > {window} AND i >= {window})
     OR (ng <= {window} AND i = ng)
), agg AS (
  SELECT doc_id, CAST(count(DISTINCT m) AS BIGINT) AS n_fps,
         bit_xor(DISTINCT m) AS fp_xor
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_fps, 0) AS n_fps,
       coalesce(a.fp_xor, CAST(0 AS UBIGINT)) AS fp_xor
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


WINNOWING_PROFILE_DOCUMENTS_SQL = _winnowing_sql()


GATE_VOCAB_TOP = 1000


def vocabulary_documents(sf_dir: str,
                         top_v: int = GATE_VOCAB_TOP) -> pd.DataFrame:
    """Corpus vocabulary build — the tokenizer-vocab step of a
    training pipeline: global occurrence count + document frequency
    per token, dense ids assigned by (count DESC, term) rank, top-V
    kept. Scale path: per-batch partials (one row per DISTINCT term
    per block — a doc never spans blocks, so per-block distinct-doc
    counts sum to exact global df) -> ONE groupby over the term key ->
    distributed sort of the vocab-sized table -> ``limit(top_v)``;
    the corpus text never shuffles and the driver sees only the final
    V rows. Integer-exact, bit-deterministic tie-break."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks, parent, _ = textfn._explode_tokens(batch.column("text"))
        if not len(toks):
            return pd.DataFrame({
                "term": pd.Series(dtype=object),
                "n_occur": pd.Series(dtype=np.int64),
                "df": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"term": toks, "p": parent}) \
            .groupby("term", sort=False)
        out = g.size().rename("n_occur").astype(np.int64).to_frame()
        out["df"] = g["p"].nunique().astype(np.int64)
        return out.reset_index()

    ds = _read(sf_dir, "documents", ["text"])
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n_occur", alias_name="n_occur"),
                                   Sum("df", alias_name="df")) \
        .sort(["n_occur", "term"], descending=[True, False]) \
        .limit(top_v)
    df = _with_schema(agg, ["term", "n_occur", "df"],
                      {"term": object, "n_occur": np.int64,
                       "df": np.int64})
    df["n_occur"] = df["n_occur"].astype(np.int64)
    df["df"] = df["df"].astype(np.int64)
    df["term_id"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df = df[["term", "term_id", "n_occur", "df"]]
    return df.sort_values("term_id").reset_index(drop=True)


def _vocabulary_sql(top_v: int = GATE_VOCAB_TOP) -> str:
    tok = TOKEN_RE.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '{tok}'))
             AS term
  FROM documents
), agg AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_occur,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
)
SELECT term,
       CAST(row_number() OVER (ORDER BY n_occur DESC, term)
            AS BIGINT) AS term_id,
       n_occur, df
FROM agg
ORDER BY term_id
LIMIT {top_v}
"""


VOCABULARY_DOCUMENTS_SQL = _vocabulary_sql()


def surprisal_documents(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM surprisal scoring — the CCNet-style perplexity
    quality signal (Wenzek et al. 2020, "CCNet: Extracting High
    Quality Monolingual Datasets from Web Crawl Data" — public
    heuristic family) made integer-exact: each token scores
    ``BL(N) - BL(tf(t))`` bits, where ``tf`` is the token's corpus
    frequency, ``N`` the corpus token total and ``BL(n)`` the bit
    length ``floor(log2 n) + 1`` — an integer ceiling-approximation of
    ``log2(N / tf)``, so the per-doc sum is ORDER-FREE (no float
    accumulation) and matches the DuckDB oracle's
    ``length(bin(n))`` exactly. High mean surprisal = rare-token-heavy
    (gibberish / OCR noise / boilerplate-free but also low-resource),
    low = stopword soup; callers band it like a perplexity filter.

    Scale path (100 TB): ONE explode pass ships within-block
    pre-reduced ``(term, doc_id, c)`` rows (a term repeated in a doc
    is one row); a term-bucketed fold (``hash(term) % 256`` — fixed
    group count, no per-term dispatch, no vocab materialization, no
    broadcast) computes each term's global tf and collapses to per-doc
    partials inside the bucket; a doc-keyed groupby sums partials; the
    scalar ``N`` folds from the same aggregate. Text never shuffles.
    ``BL`` via ``np.frexp`` is exact below 2**53 (float conversion is
    exact there; a 100-TB corpus is ~2**45 tokens)."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash64

    num_buckets = 256

    def pairs(batch: pa.Table) -> pd.DataFrame:
        toks, parent, _ = textfn._explode_tokens(batch.column("text"))
        if not len(toks):
            return pd.DataFrame({
                "bucket": pd.Series(dtype=np.int32),
                "term": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype=np.int64),
                "c": pd.Series(dtype=np.int64)})
        ids = batch.column("doc_id").to_numpy()[parent]
        g = pd.DataFrame({"term": toks, "doc_id": ids}) \
            .groupby(["term", "doc_id"], sort=False) \
            .size().rename("c").astype(np.int64).reset_index()
        h = hash64(np.asarray(g["term"], dtype=object))
        g["bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return g[["bucket", "term", "doc_id", "c"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tf = g.groupby("term", sort=False)["c"].transform("sum") \
            .to_numpy(np.int64)
        bl = np.frexp(tf.astype(np.float64))[1].astype(np.int64)
        c = g["c"].to_numpy(np.int64)
        part = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "part_n": c, "part_bits": c * bl})
        return part.groupby("doc_id", sort=False).sum().reset_index()

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    per_doc = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pandas") \
        .groupby("doc_id") \
        .aggregate(Sum("part_n", alias_name="n_tokens"),
                   Sum("part_bits", alias_name="sum_bl")) \
        .materialize()  # doc-count-sized (one int row per doc); reused
    # twice below: once for the scalar N, once for the final scores
    total = per_doc.sum(on="n_tokens", ignore_nulls=True) or 0
    bl_tot = int(np.frexp(np.float64(total))[1]) if total else 0

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_tokens").to_numpy().astype(np.int64)
        s = b.column("sum_bl").to_numpy().astype(np.int64)
        bits = n * bl_tot - s
        mean = np.where(n > 0, (bits * 1000) // np.maximum(n, 1), 0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n),
            "surprisal_bits": pa.array(bits),
            "mean_millibits": pa.array(mean.astype(np.int64))})

    cols = ["doc_id", "n_tokens", "surprisal_bits", "mean_millibits"]
    df = _with_schema(per_doc.map_batches(finish, batch_format="pyarrow"),
                      cols, {c: np.int64 for c in cols})
    return df.sort_values("doc_id").reset_index(drop=True)


def _surprisal_sql() -> str:
    tok = TOKEN_RE.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '{tok}'))
             AS term
  FROM documents
), tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY term
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM toks
), scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(length(bin(tot.n)) - length(bin(tf.c))) AS BIGINT)
             AS surprisal_bits
  FROM toks t JOIN tf USING (term) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, surprisal_bits,
       CAST((surprisal_bits * 1000) // n_tokens AS BIGINT)
           AS mean_millibits
FROM scored
ORDER BY doc_id
"""


SURPRISAL_DOCUMENTS_SQL = _surprisal_sql()


# ---------------------------------------------------------------------------
# Regex redaction / PII scrubbing (training-data extension; reference
# parity: the regex rule machinery of config table rules — here applied
# to the VALUES instead of the table names)
# ---------------------------------------------------------------------------

_REDACT_CHAIN = ("email", "ipv4", "phone", "number")


def redact_events_props(sf_dir: str) -> pd.DataFrame:
    """PII-style regex redaction over ``events.props`` (the JSON
    sidecar): sequentially applies the email → ipv4 → phone → number
    presets (``textfn.REDACT_PRESETS``, RE2 on both engines) and rolls
    up per event_type: row count, total pattern hits (counted on the
    text as it looked when each preset ran, = nested regexp_replace
    semantics), and the order-independent XOR of per-row md5 hashes of
    the redacted text — any divergence in replacement semantics breaks
    the hash match. Map-only + per-batch partials (<= n_types rows per
    block); nothing wide, scale-safe by construction."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        txt = pc.fill_null(batch.column("props"), "")
        red, n = textfn.redact_chain(txt, _REDACT_CHAIN)
        b = pd.DataFrame({
            "event_type": batch.column("event_type").to_numpy(
                zero_copy_only=False),
            "m": n,
            "h": textfn.md5_hash64(red.to_numpy(zero_copy_only=False)),
        })
        return b.groupby("event_type", dropna=False, as_index=False).agg(
            n_rows=("m", "size"), n_matches=("m", "sum"),
            redacted_hash_xor=("h", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            "n_rows": pd.Series(dtype=np.int64),
            "n_matches": pd.Series(dtype=np.int64),
            "redacted_hash_xor": pd.Series(dtype=np.uint64)})
    out = parts.groupby("event_type", dropna=False, as_index=False).agg(
        n_rows=("n_rows", "sum"), n_matches=("n_matches", "sum"),
        redacted_hash_xor=("redacted_hash_xor",
                           lambda s: np.bitwise_xor.reduce(
                               s.to_numpy(dtype=np.uint64))))
    out["redacted_hash_xor"] = out["redacted_hash_xor"].astype(np.uint64)
    return out.sort_values("event_type").reset_index(drop=True)


def _redact_sql() -> str:
    """Build the oracle as one CTE per preset so the SQL applies the
    IDENTICAL pattern literals in the identical order, counting hits on
    each stage's input exactly like ``textfn.redact``."""
    lines = ["WITH s0 AS (SELECT event_type, coalesce(props, '') AS t"
             " FROM events)"]
    for i, name in enumerate(_REDACT_CHAIN, start=1):
        pat, rep = textfn.REDACT_PRESETS[name]
        lines.append(
            f", s{i} AS (SELECT event_type,"
            f" len(regexp_extract_all(t, '{pat}')) AS m{i},"
            + "".join(f" m{j}," for j in range(1, i))
            + f" regexp_replace(t, '{pat}', '{rep}', 'g') AS t"
            f" FROM s{i - 1})")
    total = " + ".join(f"m{i}" for i in range(1, len(_REDACT_CHAIN) + 1))
    lines.append(
        f"SELECT event_type, count(*) AS n_rows,"
        f" CAST(sum({total}) AS BIGINT) AS n_matches,"
        f" bit_xor(CAST(md5_number_lower(t) AS UBIGINT))"
        f" AS redacted_hash_xor FROM s{len(_REDACT_CHAIN)}"
        f" GROUP BY event_type")
    return "\n".join(lines)


REDACT_EVENTS_PROPS_SQL = _redact_sql()


# ---------------------------------------------------------------------------
# Declarative constraint-rule engine (pipelines/rules.py) — the
# generalized per-partition pass/fail verdict surface of the reference
# (`check/modules/check/CheckDiffResult.java:55-174`): a rule SET is
# declared once and drives BOTH the fused Ray evaluation pass and the
# SQL oracle, so parity is by construction.
# ---------------------------------------------------------------------------

from . import rules as rulesmod  # noqa: E402  (late import keeps header tidy)

# documents rules: thresholds chosen so sf0.01 exercises both verdicts
# (zh fails in_set; n_chars spills both bounds; src0-src9 fail regex).
GATE_DOC_RULES = [
    rulesmod.Rule("not_null", "text"),
    rulesmod.Rule("in_set", "lang",
                  {"values": ["de", "en", "es", "fr"]}),
    rulesmod.Rule("range", "n_chars", {"lo": 100, "hi": 400}),
    rulesmod.Rule("regex", "source", {"pattern": "^src1[0-9]$"}),
    rulesmod.Rule("unique", "doc_id"),
]

GATE_EVENT_RULES_LOCAL = [
    rulesmod.Rule("in_set", "event_type",
                  {"values": ["click", "view", "purchase", "signup"]}),
    rulesmod.Rule("range", "value", {"lo": 0.0, "hi": 250.0}),
    rulesmod.Rule("regex", "props", {"pattern": '"k": [0-9]+'}),
]
GATE_EVENT_RULES_CROSS_SQL = [
    rulesmod.Rule("unique", "event_id"),
    rulesmod.Rule("foreign_key", "user_id", {"parent_key": "c_custkey"}),
]


def rules_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language constraint verdicts over documents: four row-local
    rules fused into ONE streaming scan (per-block per-lang integer
    partials — the text column never leaves the scan tasks) plus a
    bucketed uniqueness rule as the table-level row. 21 verdict rows
    at any corpus size."""
    ds = _read(sf_dir, "documents",
               ["doc_id", "text", "lang", "n_chars", "source"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_RULES,
                                   partition_col="lang")


RULES_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_RULES, partition_col="lang")


def rules_events(sf_dir: str) -> pd.DataFrame:
    """Table-level constraint verdicts over events: three row-local
    rules in one fused pass, a bucketed uniqueness rule, and a
    byte-aware broadcast foreign-key rule against customer."""
    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "event_type", "value", "props"])
    parent = _read(sf_dir, "customer", ["c_custkey"])
    fk = rulesmod.Rule("foreign_key", "user_id",
                       {"parent": parent, "parent_key": "c_custkey"})
    rules = GATE_EVENT_RULES_LOCAL + [
        rulesmod.Rule("unique", "event_id"), fk]
    return rulesmod.evaluate_rules(ds, rules, partition_col=None)


RULES_EVENTS_SQL = rulesmod.rules_report_sql(
    "events", GATE_EVENT_RULES_LOCAL + GATE_EVENT_RULES_CROSS_SQL,
    partition_col=None,
    fk_tables={"foreign_key(user_id)": ("customer", "c_custkey")})


# aggregate-class rules (round-5): per-scope constraints over the same
# one-pass partials — the reference's table-level precondition checks
# (row counts / structure gates, CheckTableStructureService.java:65-80)
# generalized to declarative per-partition aggregate verdicts.
# Thresholds chosen so sf0.001 AND sf0.01 both exercise pass and fail
# verdicts for each aggregate kind (see BASELINE-era stats: per-lang
# counts 64..218, means 278..330, mins 47..63, maxes 536..558).
GATE_DOC_AGG_RULES = [
    rulesmod.Rule("not_null", "text"),  # row-local rides the same scan
    rulesmod.Rule("row_count", None, {"lo": 75}),
    rulesmod.Rule("null_rate", "text", {"hi": 0.0}),
    rulesmod.Rule("mean", "n_chars", {"lo": 280, "hi": 320}),
    rulesmod.Rule("sum", "n_chars", {"hi": 30000}),
    rulesmod.Rule("min", "n_chars", {"lo": 50}),
    rulesmod.Rule("max", "n_chars", {"hi": 550}),
]


def rules_aggregate_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language aggregate-constraint verdicts over documents: six
    aggregate rules (row_count / null_rate / mean / sum / min / max
    bounds) plus one row-local rule, ALL fused into the same single
    streaming scan — each block emits one tiny partial row per lang
    (counts, exact integer sums, min/max), merged on the driver, and
    the verdict recomputes each aggregate exactly as the generated
    GROUP BY oracle does. 35 verdict rows at any corpus size."""
    ds = _read(sf_dir, "documents", ["text", "lang", "n_chars"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_AGG_RULES,
                                   partition_col="lang")


RULES_AGGREGATE_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_AGG_RULES, partition_col="lang")


# dispersion + cardinality constraints (round-5 aggregate kinds):
# stddev evaluates the same explicit double expression on both
# engines over exactly-folded int partials; distinct_count is the
# exact bucketed distinct-pair shuffle
GATE_DOC_AGG_V2_RULES = [
    rulesmod.Rule("stddev", "n_chars", {"hi": 2000.0}),
    rulesmod.Rule("distinct_count", "source", {"lo": 2}),
    rulesmod.Rule("mean", "n_chars", {"lo": 1.0}),
    rulesmod.Rule("null_rate", "text", {"hi": 0.5}),
]


def rules_aggregate_v2_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language dispersion/cardinality constraint verdicts:
    stddev(n_chars) and mean(n_chars)/null_rate(text) ride ONE fused
    partials scan (sum + checked sum-of-squares + counts per lang);
    distinct_count(source) adds one bucketed distinct-pair shuffle
    (`checks.scoped_distinct_counts` — one row per distinct
    (lang, source) pair per block, never the data). The oracle
    recomputes stddev with the identical sqrt(greatest(...)) double
    expression, so integer-column verdicts are bit-parity."""
    ds = _read(sf_dir, "documents", ["text", "lang", "source",
                                     "n_chars"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_AGG_V2_RULES,
                                   partition_col="lang")


RULES_AGGREGATE_V2_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_AGG_V2_RULES, partition_col="lang")


# exact-quantile constraints (round-5 third wave): per-scope
# distribution-shape gates — "the median document must sit in this
# band, the p90 tail must not blow out, the p10 floor must hold".
# Thresholds chosen so sf0.001 AND sf0.01 both exercise pass and fail
# verdicts for every rule (p50 ranges 293..352 / 294..323, p90
# 473..514 / 424..500, p10 93..135 / 89..132 per lang).
GATE_DOC_AGG_V3_RULES = [
    rulesmod.Rule("quantile", "n_chars", {"q": 0.5, "lo": 260,
                                          "hi": 310}),
    rulesmod.Rule("quantile", "n_chars", {"q": 0.9, "hi": 490}),
    rulesmod.Rule("quantile", "n_chars", {"q": 0.1, "lo": 100}),
    rulesmod.Rule("row_count", None, {"lo": 75}),  # fused partials
]


def rules_aggregate_v3_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language EXACT-quantile constraint verdicts (p10/p50/p90 of
    n_chars in declared bands): all three quantile rules over one
    column share ONE distributed exact-quantile pass
    (``checks.exact_quantiles_by_group`` — distinct (scope, value)
    count partials, one grouped sort, one range-filtered block fetch
    per (scope, rank); the driver never sees the distribution), and
    the row_count rule rides the fused partials scan. The quantile is
    an ELEMENT of the column, so the verdict is parity-exact with the
    ``quantile_disc`` oracle for any column type — no summation-order
    caveat. 20 verdict rows at any corpus size."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_AGG_V3_RULES,
                                   partition_col="lang")


RULES_AGGREGATE_V3_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_AGG_V3_RULES, partition_col="lang")


# functional-dependency constraints (round-5 fourth wave): "does A
# determine B" — the FD assumption the reference bakes in (every row
# digest is keyed by the PK, `extract/util/HashHandler.java:37-97`)
# made checkable for arbitrary column pairs. doc_id -> lang HOLDS
# (doc_id is the PK); source -> lang and (source, lang) -> n_chars
# are heavily violated in the corpus, so both verdicts exercise.
GATE_DOC_FD_RULES = [
    rulesmod.Rule("functional_dependency", "doc_id",
                  {"determines": "lang"}),
    rulesmod.Rule("functional_dependency", "source",
                  {"determines": "lang"}),
    rulesmod.Rule("functional_dependency", ("source", "lang"),
                  {"determines": "n_chars"}),
    rulesmod.Rule("not_null", "lang"),  # row-local rides its own scan
]


def rules_fd_documents(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency constraint verdicts over documents: each
    FD rule counts the determinant groups mapping to >1 distinct
    dependent value via ONE bucketed distinct-pair shuffle
    (``checks.fd_violating_groups`` — per-block pair dedup is the
    combiner, pairs bucket by hash(determinant) so one determinant's
    pairs co-locate, each bucket emits ONE integer row). doc_id->lang
    passes (doc_id is the PK), source->lang and
    (source,lang)->n_chars fail. 4 verdict rows at any corpus size."""
    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "lang", "n_chars"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_FD_RULES,
                                   partition_col=None)


RULES_FD_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_FD_RULES, partition_col=None)


GATE_EVENT_MONO_RULES = [
    rulesmod.Rule("monotonic", "value",
                  {"key": "user_id", "order_by": ["ts", "event_id"]}),
    rulesmod.Rule("monotonic", "event_id",
                  {"key": "user_id", "order_by": ["ts", "event_id"]}),
    rulesmod.Rule("not_null", "value"),
]


def rules_monotonic_events(sf_dir: str) -> pd.DataFrame:
    """Monotonicity as a declarative rule: ``value`` regresses per
    user (fails — random amounts), ``event_id`` does not (passes —
    ids are assigned in event-time order), both under the
    deterministic (ts, event_id) order via
    ``checks.monotonic_regressions`` (per-key numpy running-max
    kernel); a row-local rule rides its own fused scan. 3 verdict
    rows at any corpus size."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "value"])
    return rulesmod.evaluate_rules(ds, GATE_EVENT_MONO_RULES,
                                   partition_col=None)


RULES_MONOTONIC_EVENTS_SQL = rulesmod.rules_report_sql(
    "events", GATE_EVENT_MONO_RULES, partition_col=None)


GATE_DOC_FD_BY_LANG_RULES = [
    rulesmod.Rule("functional_dependency", "doc_id",
                  {"determines": "source"}),  # PK: holds per lang
    rulesmod.Rule("functional_dependency", "source",
                  {"determines": "n_chars"}),  # fails per lang
    rulesmod.Rule("row_count", None, {"lo": 50}),
]


def rules_fd_by_lang_documents(sf_dir: str) -> pd.DataFrame:
    """Per-partition FD verdicts (the north rule's per-partition
    pass/fail shape applied to dependencies): each FD is evaluated
    WITHIN each language — (lang, det) groups through the same
    bucketed distinct-pair shuffle, one verdict row per (lang, rule).
    doc_id->source holds in every scope; source->n_chars fails in
    every scope; the row_count rule rides the shared partials scan
    that also supplies the per-scope row counts."""
    ds = _read(sf_dir, "documents",
               ["doc_id", "source", "lang", "n_chars"])
    return rulesmod.evaluate_rules(ds, GATE_DOC_FD_BY_LANG_RULES,
                                   partition_col="lang")


RULES_FD_BY_LANG_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_DOC_FD_BY_LANG_RULES, partition_col="lang")


def fd_violations_documents(sf_dir: str) -> pd.DataFrame:
    """FD violation EVIDENCE rows (which groups break the dependency,
    not just how many — the engine's ``Difference`` analog for FD
    verdicts): every source whose documents span more than one
    language, with the distinct-language count. Same bucketed
    distinct-pair shuffle as the verdict
    (``checks.fd_violating_groups(evidence_rows=True)``)."""
    ds = _read(sf_dir, "documents", ["source", "lang"])
    out = checks.fd_violating_groups(ds, "source", "lang",
                                     evidence_rows=True)
    df = _with_schema(out, ["source", "n_dep"],
                      {"source": object, "n_dep": np.int64})
    return df.sort_values("source").reset_index(drop=True)


FD_VIOLATIONS_DOCUMENTS_SQL = """
SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_dep
FROM documents
WHERE source IS NOT NULL
GROUP BY source
HAVING count(DISTINCT lang) > 1
ORDER BY source
"""


def rule_violations_events(sf_dir: str) -> pd.DataFrame:
    """Violation-row emission for one declared rule (the engine's
    `Difference` analog): events whose value falls outside the declared
    [0, 250] range, as streaming (event_id, value) evidence rows —
    same mask the verdict counted, applied as a filter."""
    rule = GATE_EVENT_RULES_LOCAL[1]
    ds = _read(sf_dir, "events", ["event_id", "value"])
    out = rulesmod.rule_violation_rows(ds, rule, ["event_id", "value"])
    df = _with_schema(out, ["event_id", "value"],
                      {"event_id": np.int64, "value": np.float64})
    return df.sort_values("event_id").reset_index(drop=True)


RULE_VIOLATIONS_EVENTS_SQL = f"""
SELECT event_id, value FROM events
WHERE {GATE_EVENT_RULES_LOCAL[1].violation_sql()}
ORDER BY event_id
"""


GATE_EMB_DIM = 64
GATE_EMB_LABEL_LO, GATE_EMB_LABEL_HI = 0, 9


def embedding_integrity_embeddings(sf_dir: str) -> pd.DataFrame:
    """Vector-column constraint verdict over the embeddings table
    (``checks.embedding_integrity_counts``): null vectors, dim != 64,
    non-finite elements, all-zero vectors, labels outside [0, 9],
    duplicate vec_ids — one streaming pass emitting one integer
    partial row per block, plus the bucketed uniqueness leg."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return checks.embedding_integrity_counts(
        ds, "embedding", GATE_EMB_DIM, id_col="vec_id",
        label_col="label", label_lo=GATE_EMB_LABEL_LO,
        label_hi=GATE_EMB_LABEL_HI)


EMBEDDING_INTEGRITY_EMBEDDINGS_SQL = f"""
WITH flags AS (
  SELECT
    CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS f_null,
    CASE WHEN embedding IS NOT NULL
          AND len(embedding) <> {GATE_EMB_DIM} THEN 1 ELSE 0 END AS f_dim,
    CASE WHEN embedding IS NOT NULL AND len(list_filter(embedding,
          x -> NOT isfinite(x))) > 0 THEN 1 ELSE 0 END AS f_nonfin,
    CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
          AND len(list_filter(embedding, x -> x <> 0.0)) = 0
         THEN 1 ELSE 0 END AS f_zero,
    CASE WHEN label IS NOT NULL AND (label < {GATE_EMB_LABEL_LO}
          OR label > {GATE_EMB_LABEL_HI}) THEN 1 ELSE 0 END AS f_lab
  FROM embeddings
), dup AS (
  -- null ids are excluded from the duplicate check, matching the
  -- engine's UNIQUE semantics (null key parts never form a dup group)
  SELECT count(*) AS n FROM (SELECT count(*) OVER
    (PARTITION BY vec_id) AS c FROM embeddings
    WHERE vec_id IS NOT NULL) WHERE c > 1
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(f_null), 0) AS BIGINT) AS n_null_vec,
       CAST(coalesce(sum(f_dim), 0) AS BIGINT) AS n_dim_mismatch,
       CAST(coalesce(sum(f_nonfin), 0) AS BIGINT) AS n_nonfinite,
       CAST(coalesce(sum(f_zero), 0) AS BIGINT) AS n_zero_norm,
       CAST(coalesce(sum(f_lab), 0) AS BIGINT) AS n_label_oob,
       CAST((SELECT n FROM dup) AS BIGINT) AS n_dup_ids,
       CAST(CASE WHEN coalesce(sum(f_null + f_dim + f_nonfin + f_zero
            + f_lab), 0) + (SELECT n FROM dup) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS passed
FROM flags
"""


# scaled-bench rule set: the four GATE_DOC_RULES row-locals PLUS two
# content-scanning regex rules over the full text — a representative
# constraint mix (pure metadata rules are so cheap per byte that a
# metadata-only leg measures parquet decode bandwidth, not the engine;
# content rules are what real validation sets run)
BENCH_DOC_RULES = None  # built lazily below (rulesmod import order)


def _bench_doc_rules():
    global BENCH_DOC_RULES
    if BENCH_DOC_RULES is None:
        BENCH_DOC_RULES = [
            r for r in GATE_DOC_RULES
            if r.kind not in ("unique", "foreign_key")] + [
            rulesmod.Rule("regex", "text",
                          {"pattern": "[0-9][0-9][0-9]|vector|window"}),
            rulesmod.Rule("regex", "text",
                          {"pattern": r"[A-Za-z0-9._%+-]+@"
                                      r"[A-Za-z0-9.-]+\.[A-Za-z]+"}),
        ]
    return BENCH_DOC_RULES


BENCH_DOC_RULES_HEAVY = None


def _bench_doc_rules_heavy():
    """4 full-text content-regex RE2 rules (big case-insensitive
    alternations, bounded repeats, word boundaries) — the
    compute-bound point of the scaling curve (round-4 verdict #6): the
    same engine path as the standard mix but ~3x its per-byte automaton
    work with none of its bandwidth-bound null/domain/range masks, so
    if efficiency rises here toward the text leg's 0.94, the standard
    mix's 0.46 ceiling is memory bandwidth, not the engine."""
    global BENCH_DOC_RULES_HEAVY
    if BENCH_DOC_RULES_HEAVY is None:
        BENCH_DOC_RULES_HEAVY = [
            rulesmod.Rule("regex", "text", {"pattern": (
                r"(?i)(privacy policy|all rights reserved|copyright|"
                r"terms of (service|use)|cookie|subscribe|newsletter|"
                r"click here|read more|sign (in|up)|log ?in)")}),
            rulesmod.Rule("regex", "text", {"pattern": (
                r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}|"
                r"[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}")}),
            rulesmod.Rule("regex", "text", {"pattern": (
                r"(?i)https?://[a-z0-9./_%-]+|www\.[a-z0-9./_%-]+|"
                r"[a-z0-9-]+\.(com|org|net|edu|gov|io)\b")}),
            rulesmod.Rule("regex", "text", {"pattern": (
                r"\b(?i)(the|and|for|with|that|this|from|have|was|"
                r"are|not|but|all|can|will|one|out|about|which|when)"
                r"\b.{0,40}\b(data|model|system|value|table|index|"
                r"query|stream|batch|shard)\b")}),
        ]
    return BENCH_DOC_RULES_HEAVY


def rules_documents_scaled(sf_dir: str, repeat: int = 1024,
                           mix: str = "standard") -> pd.DataFrame:
    """Bench: constraint-eval throughput — the north metric's
    "validated docs/sec" in its purest form. Six row-local rules
    (null / domain / range / metadata regex + two content regexes
    over the full text, ``_bench_doc_rules``) are evaluated over
    ``repeat`` copies of the documents table: each task reads the
    parquet shard ONCE and evaluates every copy in its block
    individually (8 copies/task — decode amortizes, task count stays
    far from the driver-submission floor), emitting per-lang integer
    partial rows; the driver folds partials into the verdict report
    (counts = ``repeat`` × the single-copy verdict, pinned by test).
    The cross-row uniqueness leg is benched separately
    (``uniqueness_lineitem``) — this measures the fused scan."""
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    local = _bench_doc_rules_heavy() if mix == "heavy" \
        else _bench_doc_rules()
    # several copies per task: the parquet decode amortizes and the
    # task count stays low enough that driver-side submission never
    # becomes the serial bottleneck (1024 one-row tasks hit a ~6 s
    # scheduling/decode floor at 16 cpus); every copy's rule masks are
    # still evaluated individually — only the read is shared. Sized so
    # ~4 task waves cover the cluster (per-task dispatch costs ~20 ms:
    # at 16 cpus, 256 tasks burned 1.3 s of pure dispatch — the
    # mp-control gap found in round 5); floor of 8 keeps decode
    # amortized at small cpu counts.
    import os

    import ray

    # cluster_resources() raises before ray.init; a standalone caller
    # relies on the Dataset's auto-init (which grabs all cores), so
    # size the waves from os.cpu_count in that case
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else int(os.cpu_count() or 8)
    copies_per_task = max(8, -(-repeat // (4 * ncpu)))
    n_tasks = max(1, -(-repeat // copies_per_task))  # ceil

    def shard_eval(batch) -> pa.Table:
        import pyarrow.parquet as pq

        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        t = pq.read_table(
            path, columns=["doc_id", "text", "lang", "n_chars", "source"],
            use_threads=False)
        outs = [rulesmod.row_local_partials(t, local, "lang")
                for _ in range(len(batch["id"]))]
        return pa.concat_tables(outs)

    parts = rd.range(repeat, override_num_blocks=n_tasks) \
        .map_batches(shard_eval, batch_format="numpy", batch_size=None) \
        .to_pandas()
    merged = rulesmod.merge_partials(parts, len(local))
    rows = rulesmod.partials_to_report(merged, local)
    df = pd.DataFrame(rows, columns=rulesmod.REPORT_COLUMNS)
    return (df.astype({"n_rows": np.int64, "n_violations": np.int64,
                       "passed": np.int64})
              .sort_values(["scope", "rule_id"]).reset_index(drop=True))


def drift_manygroups_scaled(sf_dir: str,
                            n_groups: int = 16384) -> pd.DataFrame:
    """Bench: per-partition drift at 16k groups (round-4 verdict #7).
    events.event_id hashes into ``n_groups`` partitions; the partial
    count (blocks x groups-per-block) crosses DRIVER_DRIFT_MAX_PARTIALS
    naturally, so the AUTO route takes the bucketed distributed fold —
    the many-partitions shape of the north rule's "KS/PSI drift tests
    per partition" at 100-TB group cardinalities. The taken route rides
    along as a column so the recorded bench row is self-evidencing."""
    ds = _read(sf_dir, "events", ["event_id", "value"]) \
        .repartition(64)

    def add_grp(batch: pa.Table) -> pa.Table:
        uid = batch.column("event_id").to_numpy(zero_copy_only=False)
        grp = np.char.add("g", (uid % n_groups).astype(np.int64)
                          .astype(str))
        return pa.table({"grp": pa.array(grp),
                         "value": batch.column("value")})

    keyed = ds.map_batches(add_grp, batch_format="pyarrow")
    # batch_size=None: one batch per 64-way repartitioned block, so the
    # partials stage parallelizes across all of them (a fixed batch
    # size would coalesce the blocks back into ~7 tasks)
    rep = checks.drift_by_group(keyed, "grp", ["value"],
                                batch_size=None)
    rep = rep.copy()
    rep["route"] = rep.attrs.get("merge_route", "?")
    return rep


def _ensure_cdc_log(sf_dir: str, n_events: int) -> str:
    """Deterministic Debezium-JSON change log over real order keys,
    cached in /tmp (fixture-style setup, outside the timed path)."""
    import json as _json
    import os as _os

    tag = f"{_os.path.basename(_os.path.normpath(sf_dir))}_{n_events}"
    log_path = f"/tmp/graft_cdc_log_{tag}.jsonl"
    if _os.path.exists(log_path):
        return log_path
    import pyarrow.parquet as pq

    keys = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey"]) \
        .column("o_orderkey").to_numpy()
    keys = np.sort(keys)
    picked = keys[(np.arange(n_events) * 7919) % len(keys)]
    tmp = log_path + ".tmp"
    with open(tmp, "w") as f:
        for i, k in enumerate(picked):
            f.write(_json.dumps({"payload": {
                "before": None,
                "after": {"o_orderkey": str(int(k)), "o_comment": "upd"},
                "source": {"table": "orders",
                           "ts_ms": 1675319298000 + i},
                "op": "u", "ts_ms": 1675319299000 + i,
            }}) + "\n")
    _os.replace(tmp, log_path)
    return log_path


def cdc_window_throughput_scaled(sf_dir: str, n_events: int = 65536,
                                 count_period: int = 8192
                                 ) -> pd.DataFrame:
    """Bench: CDC events/s through the FULL incremental chain
    (round-4 verdict #8) — parse the Debezium change log, window by
    the hybrid count/time rule (``ChangeLogWindow``), and for every
    flushed batch re-extract both sides by broadcast semi-join and run
    the digest compare with the two-phase re-check armed. Same table
    on both sides: every window must verify clean. events/s =
    ``n_events`` / recorded seconds."""
    from . import incremental

    log_path = _ensure_cdc_log(sf_dir, n_events)
    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]

    def fac():
        return _read(sf_dir, "orders", cols)

    results = incremental.incremental_from_change_log(
        fac, fac, ["o_orderkey"], log_path, "orders",
        cfg=incremental.IncrementConfig(
            count_period=count_period, time_period_s=3600.0,
            max_diff_count=2 * count_period))
    return pd.DataFrame([
        {"window": i, "checked": r.checked_keys, "result": r.result,
         "diffs": int(len(r.violations))}
        for i, r in enumerate(results)])


# data-mixing gate: downsample the dominant lang, upsample the rare
# one, default in between — rates chosen so every branch is exercised
GATE_MIX_RATES = {"en": 0.05, "zh": 0.5}
GATE_MIX_DEFAULT = 0.2


def stratified_sample_documents(sf_dir: str) -> pd.DataFrame:
    """Per-language stratified sample of documents
    (``stages/sampling.stratified_sample``): the training-mix step —
    deterministic Knuth-hash keep with per-group thresholds, nested
    strata (raising a rate only adds rows), zero shuffle."""
    from ..stages import sampling

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = sampling.stratified_sample(ds, "doc_id", "lang",
                                     GATE_MIX_RATES, GATE_MIX_DEFAULT)
    df = _with_schema(out, ["doc_id", "lang"],
                      {"doc_id": np.int64, "lang": object})
    return df.sort_values("doc_id").reset_index(drop=True)


def _stratified_sample_sql() -> str:
    from ..stages.sampling import stratified_threshold_case_sql

    case = stratified_threshold_case_sql("lang", GATE_MIX_RATES,
                                         GATE_MIX_DEFAULT)
    return f"""
SELECT doc_id, lang FROM documents
WHERE ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
      % 4294967296 < {case}
ORDER BY doc_id
"""


STRATIFIED_SAMPLE_DOCUMENTS_SQL = _stratified_sample_sql()


GATE_CHUNK_WINDOW = 40
GATE_CHUNK_STRIDE = 30


def chunk_windows_documents(sf_dir: str) -> pd.DataFrame:
    """Sliding-window token chunking of documents
    (``stages/chunking.window_chunks``): 40-token windows every 30
    tokens (10-token overlap), window text reassembled byte-exact —
    the long-context training-prep step, proven against a
    generate_series + list-slice SQL replica."""
    from ..stages.chunking import window_chunks

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = window_chunks(ds, "doc_id", "text",
                        GATE_CHUNK_WINDOW, GATE_CHUNK_STRIDE)
    df = _with_schema(out, ["doc_id", "win_no", "n_tok", "win_text"],
                      {"doc_id": np.int64, "win_no": np.int64,
                       "n_tok": np.int64, "win_text": object})
    return df.sort_values(["doc_id", "win_no"]).reset_index(drop=True)


CHUNK_WINDOWS_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts, len(string_split(text, ' ')) AS n
  FROM documents WHERE text IS NOT NULL AND text <> ''
), wins AS (
  SELECT doc_id, ts, n,
         CASE WHEN n <= {GATE_CHUNK_WINDOW} THEN 1
              ELSE (n - {GATE_CHUNK_WINDOW} + {GATE_CHUNK_STRIDE} - 1)
                   // {GATE_CHUNK_STRIDE} + 1 END AS c
  FROM toks
), expl AS (
  SELECT doc_id, ts, n, unnest(range(0, c)) AS win_no FROM wins
)
SELECT doc_id, win_no,
       least({GATE_CHUNK_WINDOW},
             n - win_no * {GATE_CHUNK_STRIDE}) AS n_tok,
       array_to_string(
         ts[win_no * {GATE_CHUNK_STRIDE} + 1 :
            least(win_no * {GATE_CHUNK_STRIDE}
                  + {GATE_CHUNK_WINDOW}, n)], ' ') AS win_text
FROM expl
ORDER BY doc_id, win_no
"""


def corpus_curation_v6(sf_dir: str) -> pd.DataFrame:
    """Capstone curation v6 = the v5 recipe with the two newest
    operators composed in — the full mix-and-chunk pipeline under ONE
    end-to-end oracle:

    1. deterministic pseudo-benchmark split (doc_id % 97 == 0);
    2. Gopher-rule quality gate;
    3. **stratified per-language mix** (GATE_MIX_RATES — the data-mix
       step, nested-strata Knuth kernel);
    4. hot-domain cap (<= 15 docs per source, hash order);
    5. benchmark n-gram decontamination;
    6. near-dup keep-one via connected components;
    7. **sliding-window chunking** (40/30 tokens, overlap) of the
       survivors, carrying source onto every window row;
    8. per-source rollup: chunked docs, windows, window tokens,
       deepest window index.

    Every stage is the production operator, unmodified."""
    from ray.data.aggregate import Count, Max, Sum

    from ..stages import components, sampling
    from ..stages.chunking import window_chunks
    from ..stages.dedup import filter_out_ids, ref_shingle_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang", "text"])
    corpus = ds.map_batches(_bench_split(False), batch_format="pyarrow")
    bench = ds.map_batches(_bench_split(True), batch_format="pyarrow") \
        .select_columns(["doc_id", "text"])

    qual = corpus.map_batches(_gopher_keep_batch, batch_format="pyarrow")
    mixed = sampling.stratified_sample(qual, "doc_id", "lang",
                                       GATE_MIX_RATES, GATE_MIX_DEFAULT)
    capped = sampling.cap_per_group(mixed, "source", "doc_id",
                                    V4_CAP_K).materialize()
    flagged = ref_shingle_overlap(capped, bench, "doc_id", "text", k=5)
    clean = filter_out_ids(capped, flagged, "doc_id").materialize()
    losers = components.neardup_components(clean, "doc_id", "text",
                                           k=5).filter(expr="keep == 0")
    kept = filter_out_ids(clean, losers, "doc_id")

    chunks = window_chunks(kept, "doc_id", "text", GATE_CHUNK_WINDOW,
                           GATE_CHUNK_STRIDE, carry_cols=["source"])

    def tag_first(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_first", pc.cast(pc.equal(batch.column("win_no"), 0),
                                pa.int64()))

    out = chunks.map_batches(tag_first, batch_format="pyarrow") \
        .groupby("source").aggregate(
            Sum("is_first", alias_name="n_docs"),
            Count(alias_name="n_windows"),
            Sum("n_tok", alias_name="n_window_tokens"),
            Max("win_no", alias_name="max_win_no"))
    df = _with_schema(out, ["source", "n_docs", "n_windows",
                            "n_window_tokens", "max_win_no"],
                      {"source": object} | {c: np.int64 for c in
                       ("n_docs", "n_windows", "n_window_tokens",
                        "max_win_no")})
    return df.sort_values("source").reset_index(drop=True)


def _curation_v6_sql(cap_k: int = V4_CAP_K) -> str:
    from ..stages.sampling import stratified_threshold_case_sql

    case = stratified_threshold_case_sql("lang", GATE_MIX_RATES,
                                         GATE_MIX_DEFAULT)
    w, s = GATE_CHUNK_WINDOW, GATE_CHUNK_STRIDE
    return ("WITH base AS MATERIALIZED (\n"
            "  SELECT doc_id, source, lang, text FROM documents"
            " WHERE doc_id % 97 <> 0\n"
            "), refdocs AS MATERIALIZED (\n"
            "  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0\n"
            "), " + _shingle_cte_for("refdocs", "r")
            + f""", qual AS MATERIALIZED (
  SELECT b.doc_id, b.source, b.lang, b.text
  FROM base b JOIN ({_gopher_filter_sql("base")}) g USING (doc_id)
), mixed AS MATERIALIZED (
  SELECT doc_id, source, text FROM qual
  WHERE ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
        % 4294967296 < {case}
), capped AS MATERIALIZED (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text, row_number() OVER (
      PARTITION BY source
      ORDER BY ((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
               % 4294967296, doc_id) AS rn
    FROM mixed) WHERE rn <= {cap_k}
), """ + _shingle_cte_for("capped", "c") + """, cont AS MATERIALIZED (
  SELECT DISTINCT e.doc_id
  FROM cex e JOIN (SELECT DISTINCT s FROM rex) r USING (s)
), clean AS MATERIALIZED (
  SELECT * FROM capped
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
), """ + _shingle_cte_for("clean", "k") + ", "
            + _cc_propagation_sql("kex") + f""", kept AS MATERIALIZED (
  SELECT doc_id, source, text FROM clean
  WHERE doc_id NOT IN (SELECT n FROM l8 WHERE n <> lbl)
), toks AS MATERIALIZED (
  SELECT doc_id, source, string_split(text, ' ') AS ts,
         len(string_split(text, ' ')) AS n
  FROM kept WHERE text IS NOT NULL AND text <> ''
), wins AS (
  SELECT doc_id, source, n,
         CASE WHEN n <= {w} THEN 1
              ELSE (n - {w} + {s} - 1) // {s} + 1 END AS c
  FROM toks
), expl AS (
  SELECT doc_id, source, n, unnest(range(0, c)) AS win_no FROM wins
)
SELECT source,
       CAST(sum(CASE WHEN win_no = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(least({w}, n - win_no * {s})) AS BIGINT)
           AS n_window_tokens,
       CAST(max(win_no) AS BIGINT) AS max_win_no
FROM expl GROUP BY source
""")


CORPUS_CURATION_V6_SQL = _curation_v6_sql()


def bijection_documents_embeddings(sf_dir: str) -> pd.DataFrame:
    """Cross-table 1:1 integrity (every document has exactly one
    embedding row and vice versa) — the index-ingest invariant a
    vector store must hold against its corpus. Both directions reuse
    the byte-aware broadcast anti-join (``checks.referential_
    violations``); output is one row of integer counts."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    vecs = _read(sf_dir, "embeddings", ["vec_id"])
    n_docs, n_vecs = docs.count(), vecs.count()
    docs_wo = checks.referential_violations(
        docs, "doc_id", vecs, "vec_id").count()
    vecs_wo = checks.referential_violations(
        vecs, "vec_id", docs, "doc_id").count()
    bij = int(docs_wo == 0 and vecs_wo == 0 and n_docs == n_vecs)
    return pd.DataFrame([{
        "n_docs": n_docs, "n_vecs": n_vecs,
        "n_docs_without_vec": docs_wo,
        "n_vecs_without_doc": vecs_wo,
        "bijective": bij,
    }]).astype(np.int64)


BIJECTION_DOCUMENTS_EMBEDDINGS_SQL = """
SELECT
  CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
  CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vecs,
  CAST((SELECT count(*) FROM documents d WHERE d.doc_id IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM embeddings e
                        WHERE e.vec_id = d.doc_id)) AS BIGINT)
      AS n_docs_without_vec,
  CAST((SELECT count(*) FROM embeddings e WHERE e.vec_id IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM documents d
                        WHERE d.doc_id = e.vec_id)) AS BIGINT)
      AS n_vecs_without_doc,
  CAST(CASE WHEN
    (SELECT count(*) FROM documents d WHERE d.doc_id IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM embeddings e
                     WHERE e.vec_id = d.doc_id)) = 0
    AND (SELECT count(*) FROM embeddings e WHERE e.vec_id IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM documents d
                     WHERE d.doc_id = e.vec_id)) = 0
    AND (SELECT count(*) FROM documents)
        = (SELECT count(*) FROM embeddings)
    THEN 1 ELSE 0 END AS BIGINT) AS bijective
"""


DECILE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def length_decile_profile_documents(sf_dir: str) -> pd.DataFrame:
    """Length-distribution profile: global EXACT deciles of n_chars
    (``checks.exact_quantiles``, quantile_disc semantics), then every
    doc binned by how many decile boundaries it exceeds and counted
    per (lang, bin) — the curriculum/length-balance view of a corpus.
    Two streaming passes: the quantile kernel reads only the value
    column; the binning pass is a fused per-batch partial count
    (boundaries are nine driver scalars closed over the batch fn, not
    a shuffle). Bin rule shared with SQL: bin = #(boundary < value),
    integer-exact. Null lengths are excluded on BOTH sides (they have
    no place on the length axis); null langs report under the rule
    engine's ``<null>`` scope."""
    from .rules import NULL_SCOPE

    ds_q = _read(sf_dir, "documents", ["n_chars"])
    got = checks.exact_quantiles(ds_q, "n_chars", DECILE_QS)
    if any(got.get(q) is None for q in DECILE_QS):
        # no non-null lengths at all -> no length axis (SQL: the
        # boundary CTE is NULL and the outer WHERE drops every row)
        return pd.DataFrame({"lang": pd.Series(dtype=object),
                             "bin": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64)})
    bounds = np.array([got[q] for q in DECILE_QS], dtype=np.int64)

    def binify(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("n_chars")))
        x = batch.column("n_chars").to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, x, side="left")  # #(bound < x)
        lang = pc.fill_null(
            batch.column("lang").cast(pa.large_string()), NULL_SCOPE)
        t = pa.table({"lang": lang,
                      "bin": pa.array(b.astype(np.int64)),
                      "n_part": pa.array(np.ones(len(x), np.int64))})
        g = t.group_by(["lang", "bin"]).aggregate([("n_part", "sum")])
        return g.rename_columns(["lang", "bin", "n_part"])

    parts = _read(sf_dir, "documents", ["lang", "n_chars"]) \
        .map_batches(binify, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["lang", "bin"], sort=True)["n_part"] \
        .sum().reset_index(name="n")
    return out.astype({"bin": np.int64, "n": np.int64}) \
        .sort_values(["lang", "bin"]).reset_index(drop=True)


def _length_decile_sql() -> str:
    qcols = ", ".join(
        f"quantile_disc(n_chars, {q}) AS b{i}"
        for i, q in enumerate(DECILE_QS, 1))
    case = " + ".join(
        f"CASE WHEN d.n_chars > b.b{i} THEN 1 ELSE 0 END"
        for i in range(1, 10))
    return f"""
WITH b AS (SELECT {qcols} FROM documents
           WHERE n_chars IS NOT NULL)
SELECT coalesce(CAST(lang AS VARCHAR), '<null>') AS lang,
       CAST({case} AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM documents d, b
WHERE d.n_chars IS NOT NULL
GROUP BY 1, bin
ORDER BY lang, bin
"""


LENGTH_DECILE_PROFILE_DOCUMENTS_SQL = _length_decile_sql()


def top_bigrams_by_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Top-k adjacent-token bigrams per language by exact corpus
    frequency — the n-gram language-model statistic one step up from
    ``top_terms_by_lang``, same two-stage exact plan (per-batch
    partials with a bucket column, one bucketed groupby, per-bucket
    top-k partials merged on the driver). Bigrams are built fully
    vectorized: pair i = (token[i], token[i+1]) within one doc —
    doc-boundary pairs are masked off the flattened token values, no
    per-doc loop."""
    from ..functions import hashing

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        ok = pc.and_(pc.and_(pc.is_valid(txt), pc.not_equal(txt, "")),
                     pc.is_valid(batch.column("lang")))
        batch = batch.filter(ok)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lists = pc.split_pattern(txt, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        offsets = np.asarray(lists.offsets, dtype=np.int64)
        values = lists.values
        n_tok = len(values)
        if n_tok < 2:
            return pa.table({"lang": pa.array([], pa.large_string()),
                             "bigram": pa.array([], pa.large_string()),
                             "n_part": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        # candidate pair i pairs values[i], values[i+1]; drop pairs
        # spanning a doc boundary (i+1 == some offset)
        mask = np.ones(n_tok - 1, dtype=bool)
        inner = offsets[1:-1]
        mask[inner[inner > 0] - 1] = False
        lefts = values.slice(0, n_tok - 1)
        rights = values.slice(1)
        big = pc.binary_join_element_wise(
            lefts.cast(pa.large_string()),
            rights.cast(pa.large_string()),
            pa.scalar(" ", pa.large_string()))
        n_per = np.diff(offsets)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        lang_per_pair = np.repeat(langs, np.maximum(n_per - 1, 0))
        flat = pa.table({
            "lang": pa.array(lang_per_pair),
            "bigram": big.filter(pa.array(mask)),
        })
        gb = flat.group_by(["lang", "bigram"]).aggregate(
            [([], "count_all")])
        bg = gb.column("bigram")
        if isinstance(bg, pa.ChunkedArray):
            bg = bg.combine_chunks()
        h = hashing.hash64(bg.cast(pa.large_string()))
        return pa.table({
            "lang": gb.column("lang"), "bigram": gb.column("bigram"),
            "n_part": gb.column("count_all"),
            "bucket": pa.array((h % np.uint64(64)).astype(np.int32)),
        })

    return _bucketed_topk_by_lang(
        ds.map_batches(partial, batch_format="pyarrow"), "bigram", k)


TOP_BIGRAMS_BY_LANG_SQL = """
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS ts FROM documents
  WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL
), idx AS (
  SELECT lang, ts, unnest(range(1, len(ts))) AS i FROM toks
), big AS (
  SELECT lang, ts[i] || ' ' || ts[i + 1] AS bigram FROM idx
), c AS (
  SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
  FROM big GROUP BY 1, 2
)
SELECT lang, bigram, n FROM c
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n DESC, bigram) <= 5
"""


# freshness cutoff: rows older than this are "stale" (fixed literal —
# the engine takes the reference instant as a parameter, never the
# wall clock, so runs are reproducible and oracle-checkable)
GATE_FRESHNESS_CUTOFF = "2024-01-20 00:00:00"


def freshness_events(sf_dir: str) -> pd.DataFrame:
    """Per-event-type freshness/staleness profile — the data-quality
    check every ingestion pipeline runs (is each stream still
    arriving? how much of it predates the cutoff?): n_rows, exact
    min/max timestamps (element-exact, no float arithmetic), null-ts
    count and the count of rows strictly older than the declared
    cutoff. One fused map_batches pass of per-type integer/timestamp
    partials; min/max fold on the driver."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    cutoff = np.datetime64(GATE_FRESHNESS_CUTOFF.replace(" ", "T"))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ts = df["ts"]
        g = df.assign(
            n_part=1,
            null_part=ts.isna().astype(np.int64),
            stale_part=(ts < pd.Timestamp(cutoff)).astype(np.int64),
        ).groupby("event_type", sort=False, dropna=False).agg(
            n_part=("n_part", "sum"),
            null_part=("null_part", "sum"),
            stale_part=("stale_part", "sum"),
            min_ts=("ts", "min"), max_ts=("ts", "max"))
        return pa.Table.from_pandas(g.reset_index(),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # dropna=False: a NULL event_type group must match the SQL GROUP BY
    out = parts.groupby("event_type", sort=True, dropna=False).agg(
        n_rows=("n_part", "sum"), n_null_ts=("null_part", "sum"),
        n_stale=("stale_part", "sum"),
        min_ts=("min_ts", "min"), max_ts=("max_ts", "max")) \
        .reset_index()
    for c in ("n_rows", "n_null_ts", "n_stale"):
        out[c] = out[c].astype(np.int64)
    return out[["event_type", "n_rows", "n_null_ts", "n_stale",
                "min_ts", "max_ts"]]


FRESHNESS_EVENTS_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_ts,
       CAST(sum(CASE WHEN ts < TIMESTAMP '{GATE_FRESHNESS_CUTOFF}'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
       min(ts) AS min_ts, max(ts) AS max_ts
FROM events GROUP BY event_type ORDER BY event_type
"""


GATE_CONSISTENCY_RULES = [
    rulesmod.Rule("compare_cols", "n_chars",
                  {"right": "text", "op": "==", "right_fn": "length"}),
]


def consistency_documents(sf_dir: str) -> pd.DataFrame:
    """Cross-field consistency verdicts: the declared invariant
    n_chars == length(text) per language — the rule engine's
    ``compare_cols`` kind (closed transform registry so the Arrow and
    SQL evaluations agree by construction)."""
    ds = _read(sf_dir, "documents", ["n_chars", "text", "lang"])
    return rulesmod.evaluate_rules(ds, GATE_CONSISTENCY_RULES,
                                   partition_col="lang")


CONSISTENCY_DOCUMENTS_SQL = rulesmod.rules_report_sql(
    "documents", GATE_CONSISTENCY_RULES, partition_col="lang")


GATE_COMPLETENESS_COLS = ("text", "lang", "source")
_WS_ONLY_RE = "^[\\t\\n\\r ]+$"  # RE2 literal shared with the oracle


def completeness_documents(sf_dir: str) -> pd.DataFrame:
    """String-column completeness profile: per column the DISJOINT
    classes null / empty ('') / whitespace-only — the web-text DQ
    detail ``profile_counts`` (null/min/max) doesn't separate: an
    empty text is not a null text, and a run of blanks is neither.
    One fused pass; every block emits one wide integer partial row."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"n_rows": pa.array([len(batch)], pa.int64())}
        for c in GATE_COMPLETENESS_COLS:
            col = batch.column(c)
            valid = pc.is_valid(col)
            n = len(batch)
            nn = n - (pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
            empty = pc.and_(valid, pc.equal(col, ""))
            ws = pc.and_(pc.and_(valid, pc.invert(
                pc.fill_null(pc.equal(col, ""), False))),
                pc.fill_null(pc.match_substring_regex(
                    col, _WS_ONLY_RE), False))
            out[f"{c}__null"] = pa.array(
                [int(nn)], pa.int64())
            out[f"{c}__empty"] = pa.array(
                [pc.sum(pc.cast(empty, pa.int64())).as_py() or 0],
                pa.int64())
            out[f"{c}__ws"] = pa.array(
                [pc.sum(pc.cast(ws, pa.int64())).as_py() or 0],
                pa.int64())
        return pa.table(out)

    ds = _read(sf_dir, "documents", list(GATE_COMPLETENESS_COLS))
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.sum()
    rows = [{"col": c, "n_rows": int(tot["n_rows"]),
             "n_null": int(tot[f"{c}__null"]),
             "n_empty": int(tot[f"{c}__empty"]),
             "n_ws_only": int(tot[f"{c}__ws"])}
            for c in GATE_COMPLETENESS_COLS]
    return pd.DataFrame(rows).astype(
        {k: np.int64 for k in ("n_rows", "n_null", "n_empty",
                               "n_ws_only")}).sort_values("col") \
        .reset_index(drop=True)


def _completeness_sql() -> str:
    selects = []
    for c in GATE_COMPLETENESS_COLS:
        selects.append(f"""
SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_null,
  CAST(sum(CASE WHEN {c} = '' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_empty,
  CAST(sum(CASE WHEN {c} <> ''
            AND regexp_matches({c}, '{_WS_ONLY_RE}')
           THEN 1 ELSE 0 END) AS BIGINT) AS n_ws_only
FROM documents""")
    return ("SELECT * FROM (" + "\nUNION ALL\n".join(selects)
            + ") ORDER BY col")


COMPLETENESS_DOCUMENTS_SQL = _completeness_sql()


# ---------------------------------------------------------------------------
# From-scratch BPE tokenizer (functions/bpe.py, round 5) — trained on
# the corpus's own word-frequency table (deterministic merge order:
# max pair count, lexicographic tie-break), encoded as a map-only
# broadcast lookup. The oracle replays training AND encoding in pure
# DuckDB SQL: the merge loop is recursion-unrolled as one CTE block
# per merge rank over the sentinel-string representation (whose merge
# step is exactly `replace`, identical left-to-right non-overlapping
# semantics in Python and DuckDB).
# ---------------------------------------------------------------------------

from ..functions import bpe as bpefn  # noqa: E402

GATE_BPE_MERGES = 48

# (sf_dir, n_merges) -> trained BpeTokenizer. The three BPE gate
# queries train the identical tokenizer on the identical corpus; the
# memo (same pattern as _bench_doc_rules) makes the full-text word
# count + merge loop run once per process instead of once per query.
_BPE_TOK_CACHE: dict = {}


def _gate_bpe_tokenizer(sf_dir: str):
    key = (sf_dir, GATE_BPE_MERGES)
    tok = _BPE_TOK_CACHE.get(key)
    if tok is None:
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        wf = bpefn.word_freq_from_dataset(ds, "text")
        tok = bpefn.BpeTokenizer.from_word_freq(wf, GATE_BPE_MERGES)
        _BPE_TOK_CACHE.clear()  # hold at most one corpus's tables
        _BPE_TOK_CACHE[key] = tok
    return tok


def bpe_tokenize_documents(sf_dir: str) -> pd.DataFrame:
    """Train a 48-merge BPE on documents' own word-frequency table
    (one streaming pass: per-block Arrow partial counts, driver-side
    vocabulary-bounded fold + merge loop), then encode every document
    in a second map-only pass with the word->ids table broadcast once
    via ``ray.put``. Output per doc: token count + md5 of the
    comma-joined id sequence — value-matched against an oracle that
    re-derives the same merges from the same corpus in SQL."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = _gate_bpe_tokenizer(sf_dir)
    # broadcast the corpus word->ids table plus a word_ids-free
    # encoder (merges + sym ids only) for the OOV fallback: with a
    # min_freq floor, floored-out words are absent from word_ids but
    # present in the text — replay the merges for those (standard BPE
    # inference) instead of KeyError-ing inside a Ray task
    ref = ray.put((tok.word_ids,
                   bpefn.BpeTokenizer(tok.merges, tok.sym_id, {})))

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        import ray

        wids, oov = ray.get(ref)  # zero-copy local object-store read
        n_toks, digests = [], []
        for t in batch["text"]:
            ids = [i for w in bpefn.words_of(t)
                   for i in (wids.get(w) or oov.encode_word(w))]
            n_toks.append(len(ids))
            digests.append(bpefn.ids_md5(ids))
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "n_tokens": n_toks, "ids_md5": digests})

    out = ds.map_batches(enc, batch_format="pandas")
    df = _with_schema(out, ["doc_id", "n_tokens", "ids_md5"],
                      {"doc_id": np.int64, "n_tokens": np.int64})
    return df.sort_values("doc_id").reset_index(drop=True)


BPE_TOKENIZE_DOCUMENTS_SQL = bpefn.oracle_sql(GATE_BPE_MERGES)


def bpe_pack_documents(sf_dir: str) -> pd.DataFrame:
    """Tokenizer-grade sequence packing: the BPE tokenizer (trained on
    the corpus exactly as in ``bpe_tokenize_documents``) supplies the
    per-document token weights that ``stages/packing.pack_chunks``
    prefix-sums into 2048-token training-chunk spans — replacing the
    whitespace proxy of ``pack_chunks_documents`` with real subword
    counts. Only the word -> token-count dict broadcasts (one int per
    corpus word); text never leaves the count pass."""
    import ray

    from ..stages import packing

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = _gate_bpe_tokenizer(sf_dir)
    # word -> token COUNT (one int per corpus word) plus the
    # word_ids-free encoder for out-of-table (min_freq-floored) words
    ref = ray.put(({w: len(ids) for w, ids in tok.word_ids.items()},
                   bpefn.BpeTokenizer(tok.merges, tok.sym_id, {})))

    def count(batch: pa.Table) -> pa.Table:
        import ray

        wn, oov = ray.get(ref)
        n = [sum(wn.get(w) or len(oov.encode_word(w))
                 for w in bpefn.words_of(t))
             for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    weights = ds.map_batches(count, batch_format="pyarrow")
    out = packing.pack_chunks(weights, "doc_id", "n_tokens",
                              GATE_PACK_CHUNK_TOKENS, bucket_width=64)
    df = _with_schema(out, ["doc_id", "n_tokens", "offset",
                            "chunk_first", "chunk_last"],
                      {c: np.int64 for c in
                       ("doc_id", "n_tokens", "offset",
                        "chunk_first", "chunk_last")})
    return df.sort_values("doc_id").reset_index(drop=True)


BPE_PACK_DOCUMENTS_SQL = bpefn.oracle_pack_sql(
    GATE_BPE_MERGES, GATE_PACK_CHUNK_TOKENS)


def bpe_merge_table_documents(sf_dir: str) -> pd.DataFrame:
    """The trained BPE merge table itself — (rank, lhs, rhs, merged)
    in training order. Value-matching this against the SQL chain's
    per-rank best{k} selections checks TRAINING parity directly
    (count-desc / lexicographic tie-break order), independent of the
    encode-digest gates."""
    tok = _gate_bpe_tokenizer(sf_dir)
    return pd.DataFrame(
        [{"rank": i + 1, "lhs": l, "rhs": r, "merged": l + r}
         for i, (l, r) in enumerate(tok.merges)],
        columns=["rank", "lhs", "rhs", "merged"]) \
        .astype({"rank": np.int64})


BPE_MERGE_TABLE_DOCUMENTS_SQL = bpefn.oracle_vocab_sql(GATE_BPE_MERGES)


# ---------------------------------------------------------------------------
# Round-5 additions: aggregate reconciliation ("quick verify"),
# sampled digest compare, volume-by-day anomaly profile
# ---------------------------------------------------------------------------

from . import reconcile as reconcilemod  # noqa: E402  (late import keeps header tidy)


def reconcile_orders_pair(sf_dir: str) -> pd.DataFrame:
    """Aggregate reconciliation of the orders pair — the triage step
    that runs BEFORE the Merkle digest compare: one streaming scan per
    side computing per-column count/nulls/sum/min/max partials (one
    tiny row per block, no shuffle), diffed on the driver into a long
    per-(column, metric) verdict table. The sink carries the same
    deletes/updates/inserts as ``compare_orders_pair``, so n_rows and
    the mutated columns' aggregates mismatch while untouched columns
    reconcile — localizing the damage to columns for the cost of a
    scan. (Reference analog: the row-count/structure preconditions of
    CheckTableStructureService generalized to content aggregates.)"""
    source = _read(sf_dir, "orders", ORDER_COLS)
    sink = _read(sf_dir, "orders", ORDER_COLS) \
        .map_batches(_orders_sink_batch, batch_format="pyarrow")
    return reconcilemod.reconcile_aggregates(source, sink)


def _reconcile_oracle_sql() -> str:
    """Generate the reconcile oracle: same sink CTE as
    COMPARE_ORDERS_PAIR_SQL, one aggregate row per side, unioned into
    the engine's long (col, metric, src_val, snk_val, is_match)
    verdict shape. All values rendered as VARCHAR: integers via CAST
    (== str(int)), floats via DuckDB's shortest-round-trip rendering
    (== Python repr — verified for the float min/max values),
    timestamps via integer epoch_us."""
    spec = [("_table", "n_rows", "count(*)")]
    for c in ("o_orderkey", "o_custkey"):
        spec += [(c, "nulls", f"count(*) - count({c})"),
                 (c, "sum", f"sum({c})"),
                 (c, "min", f"min({c})"), (c, "max", f"max({c})")]
    for c in ("o_orderstatus", "o_orderpriority", "o_totalprice"):
        spec += [(c, "nulls", f"count(*) - count({c})"),
                 (c, "min", f"min({c})"), (c, "max", f"max({c})")]
    spec += [("o_orderdate", "nulls", "count(*) - count(o_orderdate)"),
             ("o_orderdate", "min", "epoch_us(min(o_orderdate))"),
             ("o_orderdate", "max", "epoch_us(max(o_orderdate))")]
    cols = ", ".join(
        f"COALESCE(CAST({expr} AS VARCHAR), '<null>') AS m{i}"
        for i, (_, _, expr) in enumerate(spec))
    pairs = "\nUNION ALL ".join(
        f"SELECT '{col}' AS col, '{metric}' AS metric, "
        f"s.m{i} AS src_val, k.m{i} AS snk_val FROM s, k"
        for i, (col, metric, _) in enumerate(spec))
    sink_cte = """
    SELECT o_orderkey,
           o_custkey,
           o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
    """
    return (f"WITH sink AS ({sink_cte}),\n"
            f"s AS (SELECT {cols} FROM orders),\n"
            f"k AS (SELECT {cols} FROM sink),\n"
            f"pairs AS (\n{pairs}\n)\n"
            f"SELECT col, metric, src_val, snk_val, "
            f"src_val = snk_val AS is_match FROM pairs")


RECONCILE_ORDERS_PAIR_SQL = _reconcile_oracle_sql()

SAMPLED_COMPARE_RATE = 0.25


def compare_orders_sampled(sf_dir: str) -> pd.DataFrame:
    """Sampled digest compare — the fast pre-check between the
    aggregate reconcile and the full compare: both sides keep a
    deterministic ~25% Knuth-hash sample BY THEIR OWN PK (stateless
    map_batches filter, no shuffle), then the standard Merkle digest
    compare runs on the sample. Which rows are checked is a pure
    function of the key — identical on both sides, on any cluster
    size — so a diff found here is a real diff, and expected diff
    coverage is exactly the sample rate. At 10^12 rows this turns the
    "did last night's load drift?" question into a quarter-cost run
    with the same machinery."""
    from ..stages import sampling

    rate = SAMPLED_COMPARE_RATE
    source = sampling.stable_sample(
        _read(sf_dir, "orders", ORDER_COLS), "o_orderkey", rate)
    sink = sampling.stable_sample(
        _read(sf_dir, "orders", ORDER_COLS)
        .map_batches(_orders_sink_batch, batch_format="pyarrow"),
        "o_orderkey", rate)
    n = max(1, int(_num_rows(sf_dir, "orders") * rate))
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=64)
    res = cmp.compare_tables(source, sink, cfg, table="orders_sampled")
    v = res.violations[["key", "kind"]].sort_values(["key", "kind"])
    return v.reset_index(drop=True)


COMPARE_ORDERS_SAMPLED_SQL = """
WITH sink_full AS (
    SELECT o_orderkey,
           o_custkey,
           o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
),
src AS (
    SELECT * FROM orders
    WHERE ((CAST(o_orderkey AS UBIGINT) % 4294967296) * 2654435761)
          % 4294967296 < 1073741824
),
snk AS (
    SELECT * FROM sink_full
    WHERE ((CAST(o_orderkey AS UBIGINT) % 4294967296) * 2654435761)
          % 4294967296 < 1073741824
)
SELECT CAST(COALESCE(s.o_orderkey, k.o_orderkey) AS VARCHAR) AS key,
       CASE WHEN k.o_orderkey IS NULL THEN 'insert'
            WHEN s.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS kind
FROM src s FULL OUTER JOIN snk k ON s.o_orderkey = k.o_orderkey
WHERE k.o_orderkey IS NULL OR s.o_orderkey IS NULL
   OR s.o_custkey <> k.o_custkey
   OR s.o_orderstatus <> k.o_orderstatus
   OR s.o_totalprice <> k.o_totalprice
   OR s.o_orderdate <> k.o_orderdate
   OR s.o_orderpriority <> k.o_orderpriority
"""

# Benford expectation in parts-per-million, computed ONCE here and
# inlined verbatim into the SQL oracle — both engines carry the SAME
# integer literals, so there is no cross-engine libm question at all
_BENFORD_PPM = {d: int(round(__import__("math").log10(1 + 1 / d) * 1e6))
                for d in range(1, 10)}


def benford_digits_orders(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit over o_totalprice — the classic
    numeric-column fraud/quality screen (Newcomb 1881 / Benford 1938;
    a standard audit in data-validation suites): the leading decimal
    digit of naturally-occurring amounts should follow
    P(d) = log10(1 + 1/d). Emits one row per digit with the observed
    count and the expected parts-per-million, leaving the tolerance
    verdict to the caller (an aggregate ``range`` rule over the
    per-digit share fits the rule engine directly).

    Exactness: the digit is extracted INTEGER-only — floor to int64,
    then repeated //10 (max 19 whole-array passes), matching the
    SQL's substr-of-VARCHAR on the same BIGINT; no log10 on the data
    path. Values below 1, non-finite, or >= 2^63 are excluded on both
    engines (stated). Shuffle: one (digit, n) partial row per block,
    one 9-group fold."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def digit_counts(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        v = v[np.isfinite(v) & (v >= 1.0) & (v < 9.2e18)]
        i = np.floor(v).astype(np.int64)
        while True:
            big = i >= 10
            if not big.any():
                break
            i[big] //= 10
        digit, n = np.unique(i, return_counts=True)
        return pa.table({"digit": pa.array(digit, pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    out = ds.map_batches(digit_counts, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    out["expected_ppm"] = out["digit"].map(_BENFORD_PPM) \
        .astype(np.int64)
    return out.sort_values("digit").reset_index(drop=True)


BENFORD_DIGITS_ORDERS_SQL = f"""
SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
            1, 1) AS BIGINT) AS digit,
       count(*) AS n,
       CASE CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                 AS VARCHAR), 1, 1) AS BIGINT)
{chr(10).join(f'         WHEN {d} THEN {p}'
              for d, p in _BENFORD_PPM.items())}
       END AS expected_ppm
FROM orders
WHERE o_totalprice IS NOT NULL AND isfinite(o_totalprice)
  AND o_totalprice >= 1 AND o_totalprice < 9.2e18
GROUP BY 1, 3 ORDER BY digit
"""


VOLUME_GAP_DAY = "2024-01-03"


def volume_anomaly_events(sf_dir: str) -> pd.DataFrame:
    """Row-volume-by-day anomaly profile over events, with a synthetic
    feed gap injected on one day (90% of its rows dropped,
    deterministically by user_id) so the flag path is exercised: the
    starved day must flag anomalous, healthy days must not. The flag
    is evaluated in pure integer arithmetic (count under half / over
    double the all-days mean) — bit-reproducible in SQL with no float
    mean or variance estimator. Scale shape: per-batch day
    value_counts partials, one tiny groupby over ~10^3-10^4 distinct
    days even at 10^12 rows."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def starve(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        hit = (pc.equal(day, VOLUME_GAP_DAY)
               .to_numpy(zero_copy_only=False) & (uid % 10 != 0))
        return batch.filter(pa.array(~hit))

    return reconcilemod.daily_volume_profile(
        ds.map_batches(starve, batch_format="pyarrow"), "ts")


VOLUME_ANOMALY_EVENTS_SQL = f"""
WITH ev AS (
    SELECT ts FROM events
    WHERE NOT (strftime(ts, '%Y-%m-%d') = '{VOLUME_GAP_DAY}'
               AND user_id % 10 <> 0)
),
per_day AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_rows
    FROM ev GROUP BY 1
),
tot AS (SELECT sum(n_rows) AS t, count(*) AS d FROM per_day)
SELECT day, CAST(n_rows AS BIGINT) AS n_rows,
       (2 * n_rows * d < t OR n_rows * d > 2 * t) AS anomaly
FROM per_day, tot
"""


def reconcile_orders_scaled(sf_dir: str, repeat: int = 16) -> pd.DataFrame:
    """Bench-only scaled aggregate reconciliation: the quick-verify
    triage scan over ``repeat`` key-remapped copies of orders per side
    (same shard builder as the flagship compare). Measures the mode's
    whole cost at scale — two streaming scans emitting ONE partial row
    per block, no shuffle, driver fold over O(blocks) rows — i.e. the
    cheapest "are these 10^12 rows plausibly equal?" answer the engine
    offers."""
    side = _scaled_orders_side_builder(sf_dir, repeat)
    return reconcilemod.reconcile_aggregates(side(), side())


def reconcile_orders_by_status(sf_dir: str) -> pd.DataFrame:
    """Per-group aggregate reconciliation of the orders pair, grouped
    by o_orderstatus over o_custkey — the quick-verify triage at
    partition granularity: the same sink mutations as
    ``compare_orders_pair`` shift each status group's row count and
    custkey sum while leaving min/max/nulls intact, so the verdict
    localizes the damage to (partition, metric) pairs for the cost of
    two partial-row shuffles."""
    # source scan prunes to the two columns reconciled; the sink side
    # must read ORDER_COLS because the mutation fixture touches keys
    # and prices before the group partials drop them
    source = _read(sf_dir, "orders", ["o_orderstatus", "o_custkey"])
    sink = _read(sf_dir, "orders", ORDER_COLS) \
        .map_batches(_orders_sink_batch, batch_format="pyarrow")
    return reconcilemod.reconcile_aggregates_by_group(
        source, sink, "o_orderstatus", "o_custkey")


def _reconcile_by_group_oracle_sql() -> str:
    """Per-group reconcile oracle: grouped aggregates per side, FULL
    OUTER JOIN on the group key, long (grp, metric, src_val, snk_val,
    is_match) verdict rows. Groups keep SQL semantics via the house
    '<null>' mapping; a group on one side only renders '<absent>'."""
    side = ("SELECT COALESCE(CAST(o_orderstatus AS VARCHAR), '<null>') "
            "AS g, count(*) AS n, "
            "count(*) - count(o_custkey) AS nulls, "
            "sum(o_custkey) AS sm, min(o_custkey) AS mn, "
            "max(o_custkey) AS mx FROM {src} GROUP BY 1")
    metrics = [("n_rows", "n"), ("nulls", "nulls"), ("sum", "sm"),
               ("min", "mn"), ("max", "mx")]
    legs = "\nUNION ALL ".join(
        f"SELECT grp, '{m}' AS metric, "
        f"CASE WHEN has_s THEN COALESCE(CAST(s_{c} AS VARCHAR), "
        f"'<null>') ELSE '<absent>' END AS src_val, "
        f"CASE WHEN has_k THEN COALESCE(CAST(k_{c} AS VARCHAR), "
        f"'<null>') ELSE '<absent>' END AS snk_val FROM j"
        for m, c in metrics)
    sink_cte = """
    SELECT o_orderkey,
           o_custkey,
           o_orderstatus,
           o_totalprice + CASE WHEN o_orderkey % 89 = 0 THEN 1.0 ELSE 0.0 END
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 101 = 0
    """
    return (f"WITH sink AS ({sink_cte}),\n"
            f"s AS ({side.format(src='orders')}),\n"
            f"k AS ({side.format(src='sink')}),\n"
            f"j AS (SELECT COALESCE(s.g, k.g) AS grp,\n"
            f"  s.g IS NOT NULL AS has_s, k.g IS NOT NULL AS has_k,\n"
            f"  s.n AS s_n, s.nulls AS s_nulls, s.sm AS s_sm,\n"
            f"  s.mn AS s_mn, s.mx AS s_mx,\n"
            f"  k.n AS k_n, k.nulls AS k_nulls, k.sm AS k_sm,\n"
            f"  k.mn AS k_mn, k.mx AS k_mx\n"
            f"  FROM s FULL OUTER JOIN k ON s.g = k.g),\n"
            f"legs AS (\n{legs}\n)\n"
            f"SELECT grp, metric, src_val, snk_val, "
            f"src_val = snk_val AS is_match FROM legs")


RECONCILE_ORDERS_BY_STATUS_SQL = _reconcile_by_group_oracle_sql()


def schema_profile_tables(sf_dir: str) -> pd.DataFrame:
    """Metadata-ONLY schema + row-count profile of every catalog table
    — one row per column from parquet FOOTERS alone (no data scan; the
    reference's up-front catalog load, `MetaDataService.java:75-243`,
    as a validation product). The oracle recomputes data_type from
    DuckDB's own read of the same files and n_rows with a real
    count(*), so the gate cross-checks (a) the Arrow->DuckDB type-name
    mapping and (b) that footer counts equal true counts."""
    from ..sources.parquet import schema_profile

    names = ["customer", "documents", "embeddings", "events",
             "lineitem", "nation", "orders", "part", "region",
             "supplier"]
    return schema_profile(
        {n: f"{sf_dir}/{n}.parquet" for n in names})


SCHEMA_PROFILE_TABLES_SQL = """
WITH counts AS (
  SELECT 'customer' AS t, count(*) AS n_rows FROM customer
  UNION ALL SELECT 'documents', count(*) FROM documents
  UNION ALL SELECT 'embeddings', count(*) FROM embeddings
  UNION ALL SELECT 'events', count(*) FROM events
  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
  UNION ALL SELECT 'nation', count(*) FROM nation
  UNION ALL SELECT 'orders', count(*) FROM orders
  UNION ALL SELECT 'part', count(*) FROM part
  UNION ALL SELECT 'region', count(*) FROM region
  UNION ALL SELECT 'supplier', count(*) FROM supplier
)
SELECT c.table_name, CAST(c.ordinal_position AS BIGINT) AS ordinal,
       c.column_name, c.data_type, ct.n_rows
FROM information_schema.columns c
JOIN counts ct ON ct.t = c.table_name
WHERE c.table_name IN ('customer', 'documents', 'embeddings',
                       'events', 'lineitem', 'nation', 'orders',
                       'part', 'region', 'supplier')
ORDER BY c.table_name, ordinal
"""


def null_patterns_documents(sf_dir: str) -> pd.DataFrame:
    """Missingness co-occurrence over documents with deterministic
    null injection on BOTH engines (testdata carries no nulls, so the
    gate mutates identically: lang 'de' -> NULL, source NULL on
    doc_id % 7 == 0 — the sink-CTE pattern the compare gates use).
    Exercises `checks.null_pattern_profile` across all four patterns
    incl. the correlated one."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])

    def inject(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        lang = pc.if_else(pc.equal(lang, "de"),
                          pa.nulls(len(batch), lang.type), lang)
        doc_id = batch.column("doc_id")
        is7 = pc.equal(
            pc.subtract(doc_id,
                        pc.multiply(pc.divide(doc_id,
                                              pa.scalar(7, pa.int64())),
                                    pa.scalar(7, pa.int64()))),
            pa.scalar(0, pa.int64()))
        src = pc.if_else(is7, pa.nulls(len(batch),
                                       batch.column("source").type),
                         batch.column("source"))
        return pa.table({"lang": lang, "source": src})

    mutated = ds.map_batches(inject, batch_format="pyarrow")
    out = checks.null_pattern_profile(mutated, ["lang", "source"])
    return out.to_pandas().sort_values(
        ["lang_null", "source_null"]).reset_index(drop=True)


NULL_PATTERNS_DOCUMENTS_SQL = """
WITH t AS (
  SELECT NULLIF(lang, 'de') AS lang,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS source
  FROM documents
)
SELECT lang IS NULL AS lang_null, source IS NULL AS source_null,
       count(*) AS n
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""


def w1_drift_documents(sf_dir: str) -> pd.DataFrame:
    """Exact Wasserstein-1 drift of each language's n_chars
    distribution vs the rest — the integrated-drift sibling of
    `ks_exact_events` (`checks.w1_exact_by_group`; W1 = w1_num /
    (n_a*n_b) in character units). Integer-exact end to end, so the
    oracle reproduces it bit-for-bit from cumulative window sums."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return checks.w1_exact_by_group(ds, "lang", "n_chars")


W1_DRIFT_DOCUMENTS_SQL = """
WITH counts AS (
  SELECT lang AS g, n_chars AS v, count(*) AS c FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2
),
axis AS (SELECT v, sum(c) AS tv FROM counts GROUP BY v),
grp AS (SELECT g, sum(c) AS n_a FROM counts GROUP BY g),
tot AS (SELECT sum(c) AS n FROM counts),
grid AS (
  SELECT gr.g, a.v, a.tv, COALESCE(c.c, 0) AS c
  FROM grp gr CROSS JOIN axis a
  LEFT JOIN counts c ON c.g = gr.g AND c.v = a.v
),
cums AS (
  SELECT g, v,
         sum(c) OVER (PARTITION BY g ORDER BY v) AS ca,
         sum(tv) OVER (PARTITION BY g ORDER BY v) AS ct,
         lead(v) OVER (PARTITION BY g ORDER BY v) AS v_next
  FROM grid
)
SELECT c.g AS lang,
       CAST(COALESCE(sum(abs(c.ca * (t.n - gr.n_a) - (c.ct - c.ca) * gr.n_a)
                         * (c.v_next - c.v)), 0) AS BIGINT) AS w1_num,
       CAST(gr.n_a AS BIGINT) AS n_a,
       CAST(t.n - gr.n_a AS BIGINT) AS n_b
FROM cums c
JOIN grp gr ON gr.g = c.g
CROSS JOIN tot t
WHERE c.v_next IS NOT NULL
GROUP BY c.g, gr.n_a, t.n
ORDER BY lang
"""


def outliers_events_by_type(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Tukey-fence (1.5x IQR) outlier audit on value —
    `checks.iqr_outlier_counts`: exact discrete q1/q3, identical
    float64 fence arithmetic on both engines, exact outside-fence
    counts. Double column, still bit-exact vs the quantile_disc
    oracle (quantiles are ELEMENTS; fences share the expression)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return checks.iqr_outlier_counts(ds, "event_type", "value")


OUTLIERS_EVENTS_BY_TYPE_SQL = """
WITH f AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND isfinite(value)
    AND event_type IS NOT NULL
),
q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM f GROUP BY event_type
)
SELECT f.event_type, q.q1, q.q3,
       CAST(count(*) FILTER (
           WHERE f.value < q.q1 - 1.5 * (q.q3 - q.q1)
              OR f.value > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT)
           AS n_out,
       CAST(count(*) AS BIGINT) AS n
FROM f JOIN q USING (event_type)
GROUP BY f.event_type, q.q1, q.q3
ORDER BY f.event_type
"""


def correlation_lineitem(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag Pearson correlation of quantity vs extended
    price — the derived-column sanity profile
    (`checks.grouped_correlation`; price tracks quantity, so a
    per-partition r collapse flags a broken feed). Both doubles are
    floored to int64 IDENTICALLY on both engines, making the six
    moment sums exact and the final r the same float64 expression
    bit-for-bit."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "qty": pc.cast(pc.floor(batch.column("l_quantity")),
                           pa.int64()),
            "price": pc.cast(pc.floor(batch.column("l_extendedprice")),
                             pa.int64()),
        })

    return checks.grouped_correlation(
        ds.map_batches(to_int, batch_format="pyarrow"),
        "l_returnflag", "qty", "price")


CORRELATION_LINEITEM_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
  WHERE l_returnflag IS NOT NULL
    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
m AS (
  SELECT l_returnflag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM t GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CASE WHEN n < 2 OR n * sxx - sx * sx <= 0
                 OR n * syy - sy * sy <= 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS r
FROM m ORDER BY l_returnflag
"""


def fanout_lineitem_orders(sf_dir: str) -> pd.DataFrame:
    """Exact lineitem-per-order fanout histogram
    (`checks.fanout_histogram`) — the relationship-cardinality
    profile: (fanout, n_keys) rows, e.g. how many orders carry 1, 2,
    ... line items. A fan-out explosion or a dropped child feed moves
    this distribution before any row-level check fires."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    return checks.fanout_histogram(ds, "l_orderkey")


FANOUT_LINEITEM_ORDERS_SQL = """
SELECT n AS fanout, CAST(count(*) AS BIGINT) AS n_keys
FROM (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
  FROM lineitem WHERE l_orderkey IS NOT NULL
  GROUP BY l_orderkey
)
GROUP BY n ORDER BY n
"""


def format_profile_strings(sf_dir: str) -> pd.DataFrame:
    """Format-inference profile (`checks.format_profile`) across four
    string columns of three tables — the schema-inference validator:
    every non-null value classified into the FIRST matching ordered
    format class (int / float / date / json_object / token / words /
    ... / other), counts per (table.column, format). The SQL oracle's
    CASE chain is GENERATED from the same `checks.FORMAT_CLASSES`
    registry, so parity is by construction."""
    frames = []
    for table, col in [("customer", "c_name"),
                       ("orders", "o_orderpriority"),
                       ("part", "p_name"),
                       ("events", "props")]:
        prof = checks.format_profile(_read(sf_dir, table, [col]), [col])
        prof["col"] = f"{table}.{col}"
        frames.append(prof)
    return pd.concat(frames, ignore_index=True) \
        .sort_values(["col", "format"]).reset_index(drop=True)


def _format_profile_oracle_sql() -> str:
    from .checks import format_case_sql

    legs = "\nUNION ALL\n".join(
        f"SELECT '{t}.{c}' AS col, {format_case_sql(c)} AS format,\n"
        f"       CAST(count(*) AS BIGINT) AS n\n"
        f"FROM {t} WHERE {c} IS NOT NULL GROUP BY 2"
        for t, c in [("customer", "c_name"),
                     ("orders", "o_orderpriority"),
                     ("part", "p_name"),
                     ("events", "props")])
    return legs + "\nORDER BY col, format"


FORMAT_PROFILE_STRINGS_SQL = _format_profile_oracle_sql()


def manifest_verify_orders(sf_dir: str) -> pd.DataFrame:
    """Portable-manifest temporal verification
    (`stages/manifest.py`): fingerprint orders ONCE to parquet
    signatures, then verify (a) the same table — clean — and (b) the
    standard mutated sink — dirty — against that manifest alone, no
    live source side. One row per case: (caso, result, manifest_rows,
    live_rows, dirty). Partition/bucket-level exactness is pinned by
    pytest fault injection; the SQL oracle value-matches the row
    counts from the generating predicates plus the verdict literals."""
    import shutil
    import tempfile

    from ..stages import manifest as M

    n = _num_rows(sf_dir, "orders")
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=64)
    d = tempfile.mkdtemp(prefix="manifest_orders_", dir="/tmp")
    try:
        M.write_manifest(_read(sf_dir, "orders", ORDER_COLS), cfg, d,
                         table="orders")
        clean = M.verify_against_manifest(
            _read(sf_dir, "orders", ORDER_COLS), d)
        dirty = M.verify_against_manifest(
            _read(sf_dir, "orders", ORDER_COLS)
            .map_batches(_orders_sink_batch, batch_format="pyarrow"), d)
        rows = [
            {"caso": "clean", "result": clean["result"],
             "manifest_rows": np.int64(clean["manifestRows"]),
             "live_rows": np.int64(clean["liveRows"]),
             "dirty": clean["dirtyPartitions"] > 0},
            {"caso": "mutated", "result": dirty["result"],
             "manifest_rows": np.int64(dirty["manifestRows"]),
             "live_rows": np.int64(dirty["liveRows"]),
             "dirty": dirty["dirtyPartitions"] > 0},
        ]
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


MANIFEST_VERIFY_ORDERS_SQL = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
m AS (SELECT CAST(count(*) FILTER (WHERE o_orderkey % 97 <> 0) +
             count(*) FILTER (WHERE o_orderkey % 101 = 0) AS BIGINT)
          AS n_mut FROM orders)
SELECT 'clean' AS caso, 'success' AS result,
       n.n_rows AS manifest_rows, n.n_rows AS live_rows,
       FALSE AS dirty
FROM n
UNION ALL
SELECT 'mutated', 'failed', n.n_rows, m.n_mut, TRUE
FROM n, m
ORDER BY caso
"""


def manifest_update_orders(sf_dir: str) -> pd.DataFrame:
    """Incremental-manifest capstone: manifest(orders) + the known
    change window applied via the self-inverse XOR fold
    (`stages/manifest.update_manifest`) must verify the MUTATED table
    clean and the ORIGINAL table dirty — fingerprint kept current
    from changes alone, zero table rescans. Oracle = predicate row
    counts + verdict literals (byte-equality with re-fingerprint is
    pinned by pytest)."""
    import os
    import shutil
    import tempfile

    from ..stages import manifest as M

    n = _num_rows(sf_dir, "orders")
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=64)
    d = tempfile.mkdtemp(prefix="manifest_upd_", dir="/tmp")
    try:
        base = os.path.join(d, "base")
        M.write_manifest(_read(sf_dir, "orders", ORDER_COLS), cfg,
                         base, table="orders")
        # the standard sink mutation as a change window: removed =
        # dropped keys (%97) + pre-images of bumped prices (%89, not
        # dropped); added = post-images of bumps + remapped phantoms
        # (%101)
        full = _read(sf_dir, "orders", ORDER_COLS) \
            .to_arrow_refs()
        import ray as _ray

        t = pa.concat_tables([x for x in _ray.get(full) if x.num_rows])
        key = t.column("o_orderkey").to_numpy()
        drop = key % 97 == 0
        bump = (key % 89 == 0) & ~drop
        removed = pa.concat_tables([t.filter(pa.array(drop)),
                                    t.filter(pa.array(bump))])
        bumped = t.filter(pa.array(bump))
        price = bumped.column("o_totalprice").to_numpy() + 1.0
        bumped = bumped.set_column(
            bumped.schema.get_field_index("o_totalprice"),
            "o_totalprice", pa.array(price, pa.float64()))
        phantom = t.filter(pa.array(key % 101 == 0))
        pkeys = phantom.column("o_orderkey").to_numpy() + 100_000_000
        phantom = phantom.set_column(
            phantom.schema.get_field_index("o_orderkey"),
            "o_orderkey", pa.array(pkeys, pa.int64()))
        added = pa.concat_tables([bumped, phantom])
        upd = os.path.join(d, "upd")
        M.update_manifest(base, removed=removed, added=added,
                          out_dir=upd)
        mut = _read(sf_dir, "orders", ORDER_COLS) \
            .map_batches(_orders_sink_batch, batch_format="pyarrow")
        clean = M.verify_against_manifest(mut, upd)
        dirty = M.verify_against_manifest(
            _read(sf_dir, "orders", ORDER_COLS), upd)
        return pd.DataFrame([
            {"caso": "updated_vs_mutated", "result": clean["result"],
             "manifest_rows": np.int64(clean["manifestRows"]),
             "live_rows": np.int64(clean["liveRows"])},
            {"caso": "updated_vs_original", "result": dirty["result"],
             "manifest_rows": np.int64(dirty["manifestRows"]),
             "live_rows": np.int64(dirty["liveRows"])},
        ])
    finally:
        shutil.rmtree(d, ignore_errors=True)


MANIFEST_UPDATE_ORDERS_SQL = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
m AS (SELECT CAST(count(*) FILTER (WHERE o_orderkey % 97 <> 0) +
             count(*) FILTER (WHERE o_orderkey % 101 = 0) AS BIGINT)
          AS n_mut FROM orders)
SELECT 'updated_vs_mutated' AS caso, 'success' AS result,
       m.n_mut AS manifest_rows, m.n_mut AS live_rows
FROM m
UNION ALL
SELECT 'updated_vs_original', 'failed', m.n_mut, n.n_rows
FROM n, m
ORDER BY caso
"""


def manifest_columns_orders(sf_dir: str) -> pd.DataFrame:
    """Column-granular manifest capstone
    (`stages/manifest.write_column_manifest`): fingerprint orders per
    column, then verify (a) the same table — clean — and (b) a sink
    whose ONLY change is the price bump (no dropped/added keys) —
    exactly ['o_totalprice'] dirty, no row skew. One row per case:
    (caso, result, dirty_cols, row_skew). Oracle = literals (the
    column-isolation semantics are pinned by pytest incl. the
    within-bucket swap test)."""
    import os
    import shutil
    import tempfile

    from ..stages import manifest as M

    n = _num_rows(sf_dir, "orders")
    cfg = DigestConfig.for_rows(("o_orderkey",), n,
                                partition_capacity=50_000,
                                bucket_capacity=64)
    d = tempfile.mkdtemp(prefix="manifest_cols_", dir="/tmp")
    try:
        M.write_column_manifest(
            _read(sf_dir, "orders", ORDER_COLS), cfg, d,
            compare_cols=["o_totalprice", "o_orderstatus"],
            table="orders")

        def bump_only(batch: pa.Table) -> pa.Table:
            key = batch.column("o_orderkey").to_numpy()
            price = batch.column("o_totalprice").to_numpy().copy()
            price = np.where(key % 89 == 0, price + 1.0, price)
            return batch.set_column(
                batch.schema.get_field_index("o_totalprice"),
                "o_totalprice", pa.array(price, pa.float64()))

        clean = M.verify_columns_against_manifest(
            _read(sf_dir, "orders", ORDER_COLS), d)
        dirty = M.verify_columns_against_manifest(
            _read(sf_dir, "orders", ORDER_COLS)
            .map_batches(bump_only, batch_format="pyarrow"), d)
        return pd.DataFrame([
            {"caso": "clean", "result": clean["result"],
             "dirty_cols": ",".join(clean["dirtyColumns"]),
             "row_skew": bool(clean["rowSkew"])},
            {"caso": "price_bump", "result": dirty["result"],
             "dirty_cols": ",".join(dirty["dirtyColumns"]),
             "row_skew": bool(dirty["rowSkew"])},
        ])
    finally:
        shutil.rmtree(d, ignore_errors=True)


MANIFEST_COLUMNS_ORDERS_SQL = """
SELECT 'clean' AS caso, 'success' AS result, '' AS dirty_cols,
       FALSE AS row_skew
UNION ALL
SELECT 'price_bump', 'failed', 'o_totalprice', FALSE
ORDER BY caso
"""


def sequence_gaps_events(sf_dir: str) -> pd.DataFrame:
    """Sequence-completeness audit of event_id
    (`checks.sequence_gap_audit`) over a GAPPY derived stream: keep
    event_id % 7 != 0 (the injected feed loss), so the audit reports
    the exact hole count — (max-min+1) - n_distinct — plus duplicate
    count (0 here)."""
    ds = _read(sf_dir, "events", ["event_id"])

    def drop7(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id")
        keep = pc.not_equal(
            pc.subtract(eid, pc.multiply(
                pc.divide(eid, pa.scalar(7, pa.int64())),
                pa.scalar(7, pa.int64()))),
            pa.scalar(0, pa.int64()))
        return batch.filter(keep)

    res = checks.sequence_gap_audit(
        ds.map_batches(drop7, batch_format="pyarrow"), "event_id")
    return pd.DataFrame([{k: np.int64(v) for k, v in res.items()}])


SEQUENCE_GAPS_EVENTS_SQL = """
WITH t AS (SELECT event_id FROM events
           WHERE event_id IS NOT NULL AND event_id % 7 <> 0)
SELECT CAST(min(event_id) AS BIGINT) AS vmin,
       CAST(max(event_id) AS BIGINT) AS vmax,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(max(event_id) - min(event_id) + 1
            - count(DISTINCT event_id) AS BIGINT) AS n_missing,
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
           AS n_duplicate
FROM t
"""
