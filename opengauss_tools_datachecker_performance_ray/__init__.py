"""Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of openGauss gs_datachecker's
extract-and-compare validation (reference: opengauss-mirror/
openGauss-tools-datachecker-performance, surveyed in SURVEY.md) as
``ray.data.Dataset`` pipelines over Parquet tables:

- per-column canonicalization + 64-bit row digests
  (reference: datachecker-extract ResultSetHandler / HashHandler),
- XOR bucket signatures + Merkle-pruned table-pair compare with
  insert/update/delete-classified violation rows
  (reference: datachecker-check Bucket / MerkleTree / SliceCheckWorker),
- column-stats sketches (count / null-rate / min / max / HLL distinct /
  t-digest quantiles), uniqueness, referential and distribution-drift
  checks (north-rule extensions; the reference has none of these),
- dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search and text-analysis stages for training-data pipelines.

Nothing in this package calls ``ray.init()``; callers own the session.
"""

__version__ = "0.1.0"
