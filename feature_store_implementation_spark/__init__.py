"""feature_store_implementation_spark — a PySpark-native feature-store /
analytics engine with the query and data-processing capabilities of the
reference ``iamnityatiwari/Feature-Store-Implementation`` (FastAPI + SQLite +
pandas), re-expressed Spark-first.

Layout
------
- :mod:`.session` — SparkSession builder tuned for local[N] testing and
  cluster-scale defaults (AQE, Arrow, shuffle partitions).
- :mod:`.registry` — raw-table / feature / feature-version metadata catalog
  (reference: models.py:9-62, main.py:37-135), parquet-backed here, Delta/
  Iceberg in production.
- :mod:`.store` — the offline store: feature_values partitioned by
  feature_version_id (reference: models.py:65-80, compute.py:61-88) plus the
  stringly-typed value codec (compute.py:74-79, main.py:321-325).
- :mod:`.compute` — the computation surface replacing the reference's
  ``exec``-sandbox (compute.py:9-58): Spark SQL expressions and registered
  DataFrame transforms.
- :mod:`.serving` — feature-vector serving: one-plan versioned/latest reads
  (reference: main.py:249-336, minus the N+1 loop) and the TTL cache
  (cache.py:12-48).
- :mod:`.operators` — relational + large-scale-pipeline operators: as-of
  joins, dedup (exact/MinHash/SimHash/Jaccard/embedding), similarity search,
  text analysis, multimodal plumbing.
- :mod:`.functions` — column-level helpers (vector math via higher-order
  functions, value codecs).
- :mod:`.streaming` — Structured Streaming feature pipelines over the
  ``events`` table shape.
"""

__version__ = "0.1.0"
