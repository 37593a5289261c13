"""Parquet table loaders for the testdata star schema (TESTDATA.md).

Thin by design: ``spark.read.parquet`` already gives vectorized scans, column
pruning and predicate pushdown; anything more would fight Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; scans stay pruned/pushed-down via Catalyst."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as epoch-nanos
        # BIGINT — normalize to Spark's µs timestamp (floor-truncate, which
        # matches DuckDB's strftime µs truncation of the same ns values).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div`, NOT float `/`: epoch-ns (~1.7e18) exceeds
            # double's 2^53 exact-integer range, so floor(ts/1000.0) is off
            # by ±1 µs on ~10% of rows.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
