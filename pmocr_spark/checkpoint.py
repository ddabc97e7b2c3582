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
            # a missing table is only a first run if no interrupted
            # compaction left the real table parked at .compact.bak —
            # treating that as 'first run' would silently reprocess the
            # whole corpus and drop all retry/quarantine history
            bak = f"{path}.compact.bak"
            try:
                jvm = spark._jvm  # noqa: SLF001
                hp = jvm.org.apache.hadoop.fs.Path(bak)
                fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
                bak_exists = bool(fs.exists(hp))
            except Exception:  # noqa: BLE001 — non-JVM-resolvable scheme
                import os

                bak_exists = os.path.exists(bak)
            if bak_exists:
                raise RuntimeError(
                    f"lineage table {path!r} is missing but {bak!r} exists — "
                    "a compaction was interrupted between its two renames. "
                    f"Restore it (rename {bak!r} back to {path!r}) before "
                    "running; proceeding would reprocess every doc and lose "
                    "retry/quarantine history."
                ) from e
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


def latest_row_order():
    """The canonical 'which lineage row is latest' ordering, shared by
    resume_filter and compaction so they can never disagree: ts first,
    then terminal success beats 'failed' on a ts tie, then lexical
    status — fully deterministic for any row multiset."""
    return F.struct(
        F.col("ts").alias("ts"),
        F.when(F.col("status") == "failed", F.lit(0)).otherwise(F.lit(1)).alias("p"),
        F.col("status").alias("s"),
    )


def compact_rows(checkpoint: DataFrame) -> DataFrame:
    """Latest-row-per-doc view of the lineage table (same schema).

    Keeps each doc's winning row (latest_row_order) verbatim — so the
    winning status/ts/run_id survive, including the streaming '#eN'
    epoch tag the replay filter keys on — with retry_count lifted to the
    doc's GLOBAL max, which is exactly what resume_filter and
    checkpoint_rows aggregate. Resume/retry/backoff behavior over the
    compacted table is therefore identical to the full history.

    One groupBy(doc_id) — the same shuffle resume_filter already pays
    per run, paid once to make every FUTURE run's lineage scan O(docs)
    instead of O(runs x docs)."""
    # latest_row_order alone can tie (same ts AND same status — e.g. a
    # batch run and a stream epoch stamped with one job_ts); rows tied
    # there have identical status, so resume_filter is already
    # deterministic, but the WHOLE-ROW winner here must be too — extend
    # the ordering with run_id (then partition_id) so compaction keeps
    # the same row on every run over the same multiset
    full_order = F.struct(
        latest_row_order().alias("o"),
        F.col("run_id").alias("r"),
        F.col("partition_id").alias("pid"),
    )
    win = checkpoint.groupBy("doc_id").agg(
        F.max_by(
            F.struct(*[c for c in checkpoint.columns if c != "doc_id"]),
            full_order,
        ).alias("w"),
        F.coalesce(F.max("retry_count"), F.lit(0)).alias("_rc"),
    )
    return win.select(
        F.col("w.partition_id").alias("partition_id"),
        "doc_id",
        F.col("w.status").alias("status"),
        F.col("w.span_count").alias("span_count"),
        F.col("w.error_count").alias("error_count"),
        F.col("w.error").alias("error"),
        F.col("_rc").cast("int").alias("retry_count"),
        F.col("w.run_id").alias("run_id"),
        F.col("w.ts").alias("ts"),
    )


def compact_checkpoint(spark: SparkSession, path: str) -> int:
    """Rewrite the lineage table at `path` to latest-row-per-doc.

    The 100 TB hygiene pass the per-epoch semi-join defers (see
    checkpoint_rows): an append-only lineage grows one row per doc per
    run forever; every resume re-scans it. Compaction bounds the table
    at one row per doc. Returns the compacted row count.

    Swap protocol (replace_dir): write to <path>.compact.tmp, rename
    the old dir to <path>.compact.bak, rename tmp into place, delete
    bak. A crash between the renames leaves the .bak to restore by
    hand — never a half-written table at `path` ON RENAME-ATOMIC
    FILESYSTEMS (HDFS, local). On object stores (s3a://) dir 'rename'
    is a non-atomic copy, so the guarantee degrades to
    eventually-consistent-with-bak — prefer an Iceberg table commit
    there.

    Run this with no concurrent writer (batch: between runs; streaming:
    stream stopped, last epoch committed). Compacting UNDER a stream
    that later crash-replays an old epoch would re-derive that epoch's
    retry counts from the compacted row only.
    """
    full = read_checkpoint(spark, path)
    if full is None:
        return 0
    compacted = compact_rows(full).persist()
    n = compacted.count()  # materialize BEFORE touching `path` (read is lazy)
    replace_dir(spark, compacted, path, tag=".compact")
    compacted.unpersist()
    return n


def replace_dir(spark: SparkSession, df: DataFrame, path: str, tag: str = ".swap") -> None:
    """Replace the table dir at `path` with `df` via write-aside + rename
    (scheme-agnostic through the Hadoop FS API; ATOMIC only where dir
    rename is — HDFS/local, not object stores, see compact_checkpoint).

    IMPORTANT: `df` must already be materialized (persisted + counted,
    or read from elsewhere) — it is written BEFORE `path` is touched,
    but a lazy plan still scanning `path` would race its own rename.

    Orphan hygiene (round-3 ADVICE): a stale <path><tag>.tmp from a
    crashed earlier run is deleted up front, the bak-exists refusal
    happens BEFORE the (expensive) tmp write, and the tmp is removed on
    every failure path so no run leaves both artifacts behind."""
    tmp, bak = f"{path}{tag}.tmp", f"{path}{tag}.bak"
    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    hp = jvm.org.apache.hadoop.fs.Path
    fs = hp(path).getFileSystem(conf)
    if fs.exists(hp(bak)):
        raise RuntimeError(
            f"{bak} exists — a previous swap did not finish; "
            "restore or remove it before retrying"
        )
    if fs.exists(hp(tmp)):
        fs.delete(hp(tmp), True)  # orphan from a crashed run
    df.write.mode("overwrite").parquet(tmp)
    if not fs.rename(hp(path), hp(bak)):
        fs.delete(hp(tmp), True)
        raise RuntimeError(f"could not move {path} aside to {bak}")
    if not fs.rename(hp(tmp), hp(path)):
        fs.rename(hp(bak), hp(path))  # roll back
        fs.delete(hp(tmp), True)
        raise RuntimeError(f"could not move new table into {path}")
    fs.delete(hp(bak), True)


def write_sidecar(spark: SparkSession, path: str, name: str, meta: dict) -> None:
    """Write/refresh an underscore-prefixed JSON params sidecar inside a
    parquet table dir (invisible to Spark readers; via Hadoop FS so it
    works on any scheme the table does). The generic version of the
    dedup-index sidecar pattern — any persisted operator state whose
    parameters are part of its identity stores them this way."""
    import json

    jvm = spark._jvm  # noqa: SLF001
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    out = fs.create(hp, True)
    try:
        out.write(bytearray(json.dumps(meta).encode()))
    finally:
        out.close()


def read_sidecar(spark: SparkSession, path: str, name: str) -> dict | None:
    """Read a params sidecar written by write_sidecar; None if absent.
    Read errors on an EXISTING sidecar propagate (corruption must not
    degrade into 'no params recorded')."""
    import json

    jvm = spark._jvm  # noqa: SLF001
    hp = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(hp):
        return None
    stream = fs.open(hp)
    try:
        raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(raw.decode())


def dir_has_data(spark: SparkSession, path: str) -> bool:
    """Does `path` hold any non-hidden entries (real table data beyond
    sidecars)? The explicit-probe replacement for try/except around a
    read — a bare except turns ANY read failure (corrupt footer,
    transient FS error, permissions) into 'nothing persisted yet'."""
    jvm = spark._jvm  # noqa: SLF001
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(hp):
        return False
    for st in fs.listStatus(hp):
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


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
