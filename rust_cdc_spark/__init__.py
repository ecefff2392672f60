"""rust_cdc_spark — a PySpark-native CDC analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MySQL-CDC pipeline (``Asura7969/rust-cdc``), re-expressed
Spark-first:

- **sources/**   — CDC event sources: binlog-style event replay (batch +
  Structured Streaming), parquet table loaders.
- **operators/** — CDC semantics (regex table routing, last-image-per-key
  collapse, MERGE upsert) plus large-scale data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).
- **functions/** — column-level functions: MySQL→Spark type mapping and
  binlog value decode, text featurization, vector math.
- **streaming/** — Structured Streaming wiring: replay source,
  foreachBatch upsert pipeline, watermarked dedup.
- **plans/**     — plan inspection helpers (pushdown / broadcast checks).

Everything is DataFrame-in/DataFrame-out; no driver-side loops over data.
"""

from rust_cdc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
