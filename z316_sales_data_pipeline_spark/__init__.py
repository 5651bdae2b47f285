"""z316_sales_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline
``EmporioZingaro/Z316_Sales_Data_Pipeline`` (TinyERP webhooks → GCS →
BigQuery star schema), plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) required
by the 100 TB north star.

Layout
------
- ``session``     — tuned SparkSession builder (AQE, Arrow, UTC).
- ``sources``     — table loaders and JSON/streaming ingest (SURVEY §2.A).
- ``functions``   — scalar column-expression builders (SURVEY §2.F) and
                    text/vector function libraries.
- ``operators``   — joins, aggregations, windows, set ops, dedup,
                    similarity (SURVEY §2.D/E/G/H + north-star ops).
- ``plans``       — end-to-end analytical DAGs (sales star schema,
                    reconciliation) (SURVEY §3).
- ``streaming``   — Structured Streaming drivers (SURVEY §2.I).
- ``sinks``       — partitioned/overwrite/delete-emulation writers
                    (SURVEY §2.B).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs appear only where column
algebra genuinely cannot express the semantics (documented per use).
"""

__version__ = "0.1.0"
