"""Parquet table sources (SURVEY §2.A — scans).

The reference's scans (A2 file source, A4 paginated full scan, A7 SQL
scan) all collapse, Spark-side, to a single declarative
``spark.read.parquet`` per table: Catalyst owns column pruning and
predicate pushdown from there. Pagination / triggering are transport
details that do not survive into the engine (SURVEY A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any scale factor we
# target; fact tables shuffle on their keys. Used by plans to pick
# join strategies explicitly instead of trusting the size estimator.
DIMENSION_TABLES = {"region", "nation", "customer", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS). Depending on the Spark
        # build/conf this surfaces either as a raw nanosecond long
        # (legacy nanosAsLong path) or as a micros-truncated
        # timestamp_ntz — handle both. The nanos in the driver data are
        # exact multiples of 1000, so either truncation is lossless and
        # matches duckdb's micros view of the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type == "timestamp_ntz":
            # session tz is UTC, so NTZ wall time == the UTC instant the
            # micros-long path produced; cast keeps downstream window /
            # watermark code on one timestamp type
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    if name == "embeddings":
        # promote once at the source: float-precision dot-product terms
        # round the 6th decimal differently from the DuckDB oracle's
        # DOUBLE[] arithmetic on boundary values — double-precision
        # products make every downstream cosine bit-identical
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL API surface."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
