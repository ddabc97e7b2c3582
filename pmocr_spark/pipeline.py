"""Batch OCR-extraction plan (the engine core).

pmOCR's batch mode (`--batch`, /root/reference/pmocr.sh:2546-2593 ->
OCR_Dispatch:2111 -> ExecTasks:795 -> OCR():1854) re-expressed as one
declarative DataFrame plan:

  read documents
    -> anti-join checkpoint (F2 already-processed exclusion, pmocr.sh:2126-2144)
    -> explode(spans) (span granularity dissolves media-heavy-doc skew)
    -> kind allow-list filter (F1, default.conf:14) — cheap, BEFORE any UDF
    -> route: text spans (F5 searchable-text bypass, pmocr.sh:2162-2165)
              | media spans -> join media_blobs -> salted repartition
                            -> fused pandas-UDF OCR (M1-M3)
    -> union -> groupBy(doc_id) ordered reassembly by offset
    -> per-target projections txt / csv (X1) / pdf  (Q1 fan-out, one OCR pass)
    -> results + checkpoint/lineage rows (S4-S6)

Catalyst gives predicate pushdown / column pruning / AQE for free; the
only hand-enforced plan shapes are (a) cheap filters upstream of the
pandas UDF, (b) the salted span-level repartition, (c) error-as-data
structs (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codecs import AUDIO_KINDS, MEDIA_KINDS, VIDEO_KINDS
from .operators.html_extract import HTML_KINDS
from .udfs import ocr_extract

#: Spark-side mirror of codecs.normalize_text (JVM regex, no UDF).
def normalize_text_col(col):
    """Text-span passthrough normalization, JVM-side (pmocr.sh:2162-2165).

    Must match codecs.normalize_text exactly (property-tested in
    tests/test_codecs.py): CRLF/CR -> LF, strip trailing [ \\t] per line,
    strip trailing newlines.
    """
    t = F.regexp_replace(col, "\r\n|\r", "\n")
    t = F.regexp_replace(t, "[ \t]+\n", "\n")
    t = F.regexp_replace(t, "[ \t]+$", "")
    return F.regexp_replace(t, "\n+$", "")


def csv_hack_col(col):
    """X1 CSV rewrite: runs of >=2 spaces -> ';' (pmocr.sh:2017/2031 —
    the sed regex `s/   */;/g` matches 2+ spaces, not the comment's 4+)."""
    return F.regexp_replace(col, "  +", ";")


def salted_repartition(df: DataFrame, num_partitions: int, *key_cols: str) -> DataFrame:
    """Uniform repartition on a salted hash of the key columns.

    At 10^12-doc scale a media-heavy document (archetype A5) would pin
    one task if partitioning were by doc_id; hashing the span-level key
    (doc_id, offset) spreads its spans across all partitions
    (BASELINE.json north_rule; SURVEY.md §7.4.4).
    """
    # repartition on the raw 64-bit hash: pre-modding to [0, n) and
    # letting Spark hash AGAIN would map n values onto n partitions with
    # birthday collisions (measured: 6 of 16 partitions empty, hottest 2x)
    salt = F.xxhash64(*[F.col(c) for c in key_cols])
    return df.repartition(num_partitions, salt)


#: P2 retry policy defaults — pmOCR postpones a transiently-failed file up
#: to 3 times, at least 300 s apart, before quarantining it for good
#: (pmocr.sh:1154-1193, 816-817).
MAX_RETRIES = 3
RETRY_BACKOFF_S = 300


def resume_filter(
    documents: DataFrame,
    checkpoint: DataFrame | None,
    job_ts: str | None = None,
    max_retries: int = MAX_RETRIES,
    retry_backoff_s: int = RETRY_BACKOFF_S,
) -> DataFrame:
    """F2 + P2: exclude docs already done, quarantined, or postponed.

    pmOCR analog: `find ! -name "*_OCR.*" ! -name "*_OCR_ERR.*"`
    (pmocr.sh:2126-2144, 2183) plus retry-with-postponement — a failed
    file is re-admitted after >= retry_backoff_s, at most max_retries
    times, then quarantined forever (pmocr.sh:1154-1193, 816-817).

    retry_count in lineage counts FAILED ATTEMPTS so far; a doc is
    EXCLUDED when its latest lineage row says:
      - status done/skipped (terminal success), or
      - status failed with retry_count > max_retries — i.e. the initial
        attempt plus max_retries retries all failed (quarantine), or
      - status failed but this run's job_ts is within the backoff window
        (postponed — picked up by a later run, not this one).
    With job_ts=None the backoff check is skipped (pure count policy).
    The latest-state lookup is one groupBy(doc_id) of the lineage table —
    the same shuffle the old distinct-free anti-join avoided, but now
    load-bearing (latest status + retry count), keyed on the same column
    the join needs.
    """
    if checkpoint is None:
        return documents
    # ts ties (same doc written twice under one job_ts — a re-run the CLI
    # warns about) would make a bare max_by("status","ts") pick an
    # ARBITRARY row; break ties deterministically: terminal success
    # ('done'/'skipped') beats 'failed', then lexical status, so a doc
    # that ever succeeded at that instant never reprocesses. The same
    # ordering drives lineage compaction (checkpoint.compact_rows), so
    # resume over a compacted table is bit-identical.
    from .checkpoint import latest_row_order

    latest = checkpoint.groupBy("doc_id").agg(
        F.max_by("status", latest_row_order()).alias("status"),
        F.coalesce(F.max("retry_count"), F.lit(0)).alias("retry_count"),
        F.max("ts").alias("last_ts"),
    )
    blocked = (F.col("status") != "failed") | (F.col("retry_count") > max_retries)
    if job_ts is not None:
        now = F.lit(job_ts).cast("timestamp")
        blocked = blocked | (
            now < F.col("last_ts") + F.make_dt_interval(secs=F.lit(retry_backoff_s))
        )
    seen = latest.filter(blocked).select("doc_id")
    return documents.join(seen, "doc_id", "left_anti")


def extract_spans(
    documents: DataFrame,
    media_blobs: DataFrame,
    checkpoint: DataFrame | None = None,
    num_partitions: int | None = None,
    broadcast_spans: bool = True,
    job_ts: str | None = None,
    ocr_udf=None,
) -> DataFrame:
    """Core extraction: per-span OCR/passthrough, NOT yet reassembled.

    ocr_udf overrides the decode UDF (udfs.make_ocr_extract — explicit
    P3 time-budget policy); default is the env-driven instance.

    Returns span-level frame (doc_id, offset, kind, text, media_ref, error):
    kind='text' rows with error IS NULL are successful extractions;
    kind='skipped' rows are disallowed-kind spans (F1) retained so the
    document still checkpoints (pmOCR never picks up a disallowed
    extension — the table analog keeps the span, minus its content).
    """
    spark = documents.sparkSession
    num_partitions = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    pending = resume_filter(documents, checkpoint, job_ts=job_ts)

    # explode_outer, not explode: a doc with spans=[] must still flow
    # through (as one 'skipped' pseudo-span at offset 0) — plain explode
    # drops it from BOTH output and lineage, so resume would reprocess it
    # forever. normalize kind ONCE (lower-case, NULL -> '') so the F1
    # allow-list and the text/media routing can never disagree on case,
    # and a null kind lands in the skipped route instead of vanishing
    # from both isin() branches (filter(NULL) is false on each side).
    spans = pending.select("doc_id", F.explode_outer("spans").alias("s")).select(
        "doc_id",
        F.lower(F.coalesce(F.col("s.kind"), F.lit(""))).alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.coalesce(F.col("s.offset"), F.lit(0)).alias("offset"),
    )
    # F1 allow-list (case-insensitive, default.conf:14) — pushed upstream of
    # the blob join and the UDF so disallowed kinds never cost a decode.
    # Disallowed spans become kind='skipped' rows (no text, no error): the
    # doc still reassembles and checkpoints instead of vanishing from both
    # output and lineage (which would make resume reprocess it forever).
    # html spans ride the media route (blob join -> fused UDF, which
    # magic-dispatches them to the boilerplate-strip extractor) — same
    # plan, zero extra scans (operators/html_extract.py). audio spans
    # (round 5) ride it too: decode_blob magic-dispatches PMAU blobs to
    # the audio codec, so interleaved text+image+html+audio documents
    # reassemble through ONE decode path. video spans (round 5, third
    # pass) complete the set: PMVI blobs magic-dispatch to
    # transcribe_video inside the same fused UDF.
    allowed = (
        list(MEDIA_KINDS) + list(HTML_KINDS) + list(AUDIO_KINDS)
        + list(VIDEO_KINDS) + ["text"]
    )
    skipped = spans.filter(~F.col("kind").isin(allowed)).select(
        "doc_id",
        "offset",
        F.lit("skipped").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        "media_ref",
        F.lit(None).cast("string").alias("error"),
    )
    spans = spans.filter(F.col("kind").isin(allowed))

    # F5 route: text spans bypass OCR entirely (cheap JVM normalization)
    text_spans = spans.filter(F.col("kind") == "text").select(
        "doc_id",
        "offset",
        F.lit("text").alias("kind"),
        normalize_text_col(F.col("text")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(None).cast("string").alias("error"),
    )

    # media route. Rule #1 at scale: NEVER move the blob bytes. A naive
    # `spans LEFT JOIN blobs` lets the planner shuffle the multi-GB blob
    # side once the span side outgrows the broadcast threshold (measured:
    # 2.1GB shuffle write + 9x run time + GC storms at 300k docs). So:
    #   - broadcast_spans=True (default; right for any per-batch span set
    #     that fits a broadcast, i.e. micro-batches and bench scale):
    #     blobs INNER JOIN broadcast(spans) — the join runs in-place over
    #     the blob scan partitions (maxPartitionBytes-sized, so every
    #     core stays busy) and blob bytes never shuffle. Spans without a
    #     blob are recovered by a cheap anti-join on the pruned ref
    #     column (error-struct rows, quarantine path preserved).
    #   - broadcast_spans=False (the 10^12-doc full-batch path, where
    #     even the span side is too big to broadcast): salted span
    #     repartition + shuffle join on media_ref — span-unique keys
    #     make the blob shuffle uniform; pair with media_ref-bucketed
    #     tables to eliminate that shuffle entirely (bucketing DDL in
    #     sources/binary.py docstring).
    media_spans = spans.filter(F.col("kind") != "text").select("doc_id", "offset", "kind", "media_ref")
    blob_cols = media_blobs.select("media_ref", "content")
    if broadcast_spans:
        matched = blob_cols.join(F.broadcast(media_spans), "media_ref", "inner")
        # guide §2.5 input-skew repair: a single-row-group blob file
        # scans as ONE task and the fused decode UDF (which inherits the
        # scan partitioning through the broadcast join) then runs on one
        # core. spread() repartitions ONLY when the frame is narrower
        # than the core count — at real scale (many row groups) it is a
        # no-op, so "blob bytes never shuffle" still holds exactly where
        # it matters; on a narrow input moving the (small) blob set once
        # buys the whole cluster for the decode stage.
        from .partitioning import spread

        matched = spread(matched, heavy=True)
        # anti-join against the PRUNED ref column (scan never reads
        # content here); no broadcast hint — AQE picks broadcast while
        # the ref set fits, shuffle of just the refs when it doesn't
        missing = media_spans.join(
            blob_cols.select("media_ref"), "media_ref", "left_anti"
        ).withColumn("content", F.lit(None).cast("binary"))
        with_blobs = matched.unionByName(missing)
    else:
        media_spans = salted_repartition(media_spans, num_partitions, "doc_id", "offset")
        with_blobs = media_spans.join(blob_cols, "media_ref", "left")

    ocr = with_blobs.withColumn("ocr", (ocr_udf or ocr_extract)(F.col("content"))).select(
        "doc_id",
        "offset",
        F.when(F.col("ocr.error").isNotNull(), F.lit("error")).otherwise(F.lit("text")).alias("kind"),
        F.col("ocr.text").alias("text"),
        "media_ref",
        F.col("ocr.error").alias("error"),
    )
    return text_spans.unionByName(ocr).unionByName(skipped)


def reassemble(span_results: DataFrame) -> DataFrame:
    """Ordered per-document reassembly + multi-target projections.

    Ordering comes from data (`offset`), never partition order:
    sort_array(collect_list(struct(offset, ...))) is deterministic under
    any shuffle/partitioning (SURVEY.md §7.4.1) — collect_list order is
    arbitrary, the sort fixes it. `order` is then densified 0..n-1.
    """
    packed = F.struct("offset", "kind", "text", "media_ref", "error")
    grouped = span_results.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(packed)).alias("sorted_spans")
    )
    ok = lambda x: x["error"].isNull()  # noqa: E731
    return grouped.select(
        "doc_id",
        F.transform(
            "sorted_spans",
            lambda x, i: F.struct(
                i.cast("int").alias("order"),
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
            ),
        ).alias("spans"),
        F.size("sorted_spans").alias("span_count"),
        F.size(F.filter("sorted_spans", lambda x: x["error"].isNotNull())).alias("error_count"),
        F.size(F.filter("sorted_spans", lambda x: x["kind"] == "skipped")).alias("_skipped_count"),
        # F.get (not element_at): NULL on empty array even under ANSI mode
        F.get(F.filter("sorted_spans", lambda x: x["error"].isNotNull()), 0)["error"].alias("error"),
        F.array_join(
            F.transform(F.filter("sorted_spans", ok), lambda x: x["text"]), "\n"
        ).alias("txt"),
    ).select(
        "*",
        csv_hack_col(F.col("txt")).alias("csv"),
        # status: failed beats skipped beats done; a doc whose spans are
        # ALL disallowed-kind is 'skipped' — terminal in lineage (pmOCR
        # simply never picks such a file up; marking it keeps resume from
        # reprocessing it forever), but distinct from a real conversion
        F.when(F.col("error_count") > 0, F.lit("failed"))
        .when(F.col("_skipped_count") == F.col("span_count"), F.lit("skipped"))
        .otherwise(F.lit("done"))
        .alias("status"),
    ).drop("_skipped_count")


def project_targets(
    results: DataFrame,
    targets: list[str],
    job_ts: str,
    suffix: str = "_OCR",
    addition: str | None = None,
) -> DataFrame:
    """Q1 multi-target projection shared by batch CLI and the streaming
    monitor: output_name column (F7) + per-target columns, one OCR pass.
    The pdf target is a REAL container blob (udfs.encode_pdf_pages);
    decode(pdf) == txt round-trips."""
    from . import functions as fx
    from . import udfs

    out = results.withColumn(
        "output_name",
        fx.output_name(
            F.col("doc_id"),
            job_ts.replace(" ", "T"),
            suffix=suffix,
            ext=f".{targets[0]}" if targets else ".txt",
            addition=addition,
        ),
    )
    cols = ["doc_id", "output_name", "spans", "span_count", "error_count", "status"]
    cols += [t for t in ("txt", "csv") if t in targets]
    if "pdf" in targets:
        ok_pages = F.transform(
            F.filter("spans", lambda s: s["text"].isNotNull()), lambda s: s["text"]
        )
        out = out.withColumn("pdf", udfs.encode_pdf_pages(F.col("doc_id"), ok_pages))
        cols.append("pdf")
    return out.select(*cols)


def run_batch(
    spark: SparkSession,
    documents: DataFrame,
    media_blobs: DataFrame,
    checkpoint: DataFrame | None = None,
    num_partitions: int | None = None,
    broadcast_spans: bool = True,
    job_ts: str | None = None,
    ocr_udf=None,
) -> DataFrame:
    """Full batch pass -> document-level results (spans + txt/csv + status).

    job_ts (the run's fixed timestamp) enables the P2 retry-backoff check
    against the checkpoint's last-attempt timestamps; None skips it.
    """
    span_results = extract_spans(
        documents, media_blobs, checkpoint, num_partitions, broadcast_spans,
        job_ts=job_ts, ocr_udf=ocr_udf,
    )
    return reassemble(span_results)
