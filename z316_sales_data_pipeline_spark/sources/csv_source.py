"""Lenient CSV source with corrupt-record quarantine (SURVEY §2.A
breadth beyond the reference's JSON-only transport).

The ingestion contract every lake source follows here: explicit schema
(never inference — a schema-inference pass reads the data twice and
can silently widen types between runs), PERMISSIVE parse where a bad
row becomes NULLs plus the raw line in ``_corrupt_record``, and a
split into (clean, quarantine) frames so bad input is preserved for
replay instead of dropped — the C5 validate-or-delete semantics applied
at the source boundary.

Scale: one narrow scan; the split is two filters over the same cached
parse (no second read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_lenient(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """PERMISSIVE CSV read with the corrupt-record column attached."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", options.pop("header", True))
        .options(**options)
        .csv(path)
    )


def split_quarantine(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows_with_raw_line).

    Spark requires the parsed frame to be cached before filtering on
    the corrupt column (the column is populated at parse time, and an
    uncached re-read may prune it) — documented Spark behavior, so the
    cache here is contractual, not an optimization.
    """
    parsed = parsed.cache()
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine
