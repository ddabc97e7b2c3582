"""Checkpoint / lineage table IO (resume + metrics contract, FIXTURES.md §3).

pmOCR encodes row state in filenames (`*_OCR.*` done, `*_OCR_ERR.*`
failed, /root/reference/pmocr.sh:2088-2096, 2002-2010); here state lives
in an append-only parquet table (Iceberg-shaped — swap `.write.parquet`
for `.writeTo(...).append()` when an Iceberg catalog is on the
classpath; the v1 image has no Iceberg jars, see pyspark_guide.md).

Schema: (partition_id, doc_id, status, span_count, error_count, error,
run_id, ts) — ts is a JOB-SUPPLIED timestamp, never wall clock
(determinism ban, SURVEY.md §7.4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("span_count", T.IntegerType()),
        T.StructField("error_count", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def checkpoint_rows(results: DataFrame, run_id: str, job_ts: str) -> DataFrame:
    """Derive lineage rows from a batch result frame (S5/S6 sinks)."""
    return results.select(
        F.spark_partition_id().alias("partition_id"),
        "doc_id",
        "status",
        F.col("span_count").cast("int").alias("span_count"),
        F.col("error_count").cast("int").alias("error_count"),
        "error",
        F.lit(run_id).alias("run_id"),
        F.lit(job_ts).cast("timestamp").alias("ts"),
    )


def read_checkpoint(spark: SparkSession, path: str) -> DataFrame | None:
    """Load the checkpoint table, or None on first run."""
    if not os.path.exists(path) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(path) for f in fs
    ):
        return None
    return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)


def append_checkpoint(rows: DataFrame, path: str) -> None:
    """Append lineage rows.

    ORDERING HAZARD: if `rows` derives from a plan that itself reads
    `path` (the resume anti-join), materialize/write all other outputs
    of that plan BEFORE calling this — Spark re-reads the directory on
    any cache-miss recompute, and the freshly appended rows would
    anti-join the batch's own docs away.
    """
    rows.write.mode("append").parquet(path)


def partition_metrics(checkpoint: DataFrame) -> DataFrame:
    """Per-partition lineage metrics (north_rule: prove skew is broken).

    pmOCR analog: per-subprocess .error/.warn marker files folded into
    exit codes (pmocr.sh:268-278, 389-404) — here a groupBy.
    """
    return (
        checkpoint.groupBy("run_id", "partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("span_count").alias("spans"),
            F.sum("error_count").alias("errors"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("failed_docs"),
        )
        .orderBy("run_id", "partition_id")
    )
