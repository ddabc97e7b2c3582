"""Checkpoint / lineage table IO (resume + metrics contract, FIXTURES.md §3).

pmOCR encodes row state in filenames (`*_OCR.*` done, `*_OCR_ERR.*`
failed, /root/reference/pmocr.sh:2088-2096, 2002-2010); here state lives
in an append-only parquet table (Iceberg-shaped — swap `.write.parquet`
for `.writeTo(...).append()` when an Iceberg catalog is on the
classpath; the v1 image has no Iceberg jars, see pyspark_guide.md).

Schema: (partition_id, doc_id, status, span_count, error_count, error,
retry_count, run_id, ts) — ts is a JOB-SUPPLIED timestamp, never wall
clock (determinism ban, SURVEY.md §7.4.3). retry_count counts failed
attempts so far for the doc (P2 retry-with-postponement,
pmocr.sh:1154-1193); pre-retry tables read as NULL -> treated as 0.
"""

from __future__ import annotations

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
        T.StructField("retry_count", T.IntegerType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def checkpoint_rows(
    results: DataFrame, run_id: str, job_ts: str, prior: DataFrame | None = None
) -> DataFrame:
    """Derive lineage rows from a batch result frame (S5/S6 sinks).

    `prior` is the checkpoint table as of this run's resume read; a doc's
    retry_count = prior failed attempts + 1 if this attempt failed too.
    The prior table is SEMI-JOINED down to this batch's doc_ids before
    the groupBy: lineage grows without bound (streaming re-reads it every
    epoch), so aggregating the whole history per batch would invert the
    'tiny lookup map' assumption over time — after the semi-join the
    aggregate is bounded by the batch size regardless of lineage age.
    (Periodic compaction to latest-row-per-doc is the complementary
    100 TB hygiene; the semi-join keeps each epoch correct without it.)
    """
    rows = results.select(
        F.spark_partition_id().alias("partition_id"),
        "doc_id",
        "status",
        F.col("span_count").cast("int").alias("span_count"),
        F.col("error_count").cast("int").alias("error_count"),
        "error",
        F.lit(run_id).alias("run_id"),
        F.lit(job_ts).cast("timestamp").alias("ts"),
    )
    if prior is None:
        prior_rc = None
    else:
        prior_rc = (
            prior.join(results.select("doc_id"), "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.coalesce(F.max("retry_count"), F.lit(0)).alias("_prior_rc"))
        )
    if prior_rc is not None:
        rows = rows.join(prior_rc, "doc_id", "left")
    else:
        rows = rows.withColumn("_prior_rc", F.lit(0))
    return rows.select(
        "partition_id",
        "doc_id",
        "status",
        "span_count",
        "error_count",
        "error",
        (
            F.coalesce(F.col("_prior_rc"), F.lit(0))
            + F.when(F.col("status") == "failed", 1).otherwise(0)
        )
        .cast("int")
        .alias("retry_count"),
        "run_id",
        "ts",
    )


def read_checkpoint(spark: SparkSession, path: str) -> DataFrame | None:
    """Load the checkpoint table, or None on first run.

    Probes via spark.read (works on hdfs://, s3a://, ... — an os.path
    probe would silently disable resume off the driver-local FS).
    recursiveFileLookup picks up both flat batch appends and the
    streaming sink's per-epoch subdirectories.
    """
    try:
        # path resolution (file listing) happens inside .parquet(), so a
        # missing dir raises here, not at first downstream use
        return (
            spark.read.schema(CHECKPOINT_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )
    except Exception as e:  # AnalysisException: PATH_NOT_FOUND on first run
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


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
