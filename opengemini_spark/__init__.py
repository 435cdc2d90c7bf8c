"""opengemini_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of openGemini (time-series + log analytics).

Architecture (see SURVEY.md): openGemini's storage engine (TSSP/WAL/inverted
index), MPP exchanges, and goroutine pipeline executor are *replaced* by
Parquet time-partitioned tables, Catalyst, and Spark shuffle. This package
supplies only what Spark lacks:

- ``operators/``  — time-window aggregation with fill (time spine), selector
  aggregates (first/last/top/bottom + companion columns), the transform
  function family (derivative/moving_average/...), per-series limits.
- ``functions/``  — the scalar function registry (math/string/ip/json).
- ``datapipe/``   — large-scale training-data pipeline ops: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), similarity search (cosine top-k,
  LSH-bucketed ANN), text analysis (lang-id, quality, tokens, fingerprint),
  multimodal column plumbing.
- ``sources/``    — InfluxDB line-protocol parser (batch + streaming).
- ``streaming/``  — CREATE STREAM ≈ Structured Streaming windowed agg with
  watermark; continuous queries as scheduled batch.
- ``results/``    — InfluxDB-compatible JSON result shaping.
"""

__version__ = "0.1.0"
