"""CSV source with corrupt-record quarantine.

The reference has no CSV path (its inputs are HTTP JSON + Mongo), but a
landing directory fed by arbitrary producers will contain delimited files
sooner or later — this is the S1/S2-adjacent ingest surface for them.

Design: explicit schema (never inference in the engine proper), PERMISSIVE
mode with a ``_corrupt_record`` capture column so malformed lines become
quarantine rows instead of job failures — the CSV analogue of the error-row
rejection the reference does on API payloads (SURVEY §2.2 P10,
dags/fetch_weather.py:60-62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-enforced CSV read; malformed lines land in ``_corrupt_record``
    (all data columns null) instead of failing the job.

    Scale note: CSV is splittable (uncompressed / bzip2), so big files still
    parallelize; the schema keeps the parse single-pass with no inference
    scan. Gzip'd CSVs are NOT splittable — one task per file — so producers
    should write many medium files, never one giant .gz.
    """
    full = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantine rows) — the P10
    error-row rejection split for CSV ingest. Caching the input before the
    two passes is the caller's call (one extra scan vs memory)."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
