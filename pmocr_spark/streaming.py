"""Streaming "monitor" mode (pmOCR --service, SURVEY.md §2.8 W1-W7).

pmOCR watches directories with inotify or an emulated poller
(/root/reference/pmocr.sh:2268-2275, 1579-1670) and debounces dispatch
runs via USR1 signals (pmocr.sh:2195-2224). All of that machinery is
subsumed by Structured Streaming micro-batches:

  W1 inotify source        -> readStream file source (seen-files map)
  W2 30s emulation poller  -> Trigger.ProcessingTime("30 seconds")
  W3 event debounce        -> micro-batch coalescing (free)
  W4 forced periodic run   -> Trigger.AvailableNow reconciliation pass
  W5 liveness/recovery     -> checkpointLocation + query restart
  W6 in-use file deferral  -> file source only lists complete files
  W7 per-dir monitors      -> one independent query per landing dir,
                              shared session (cli.launch_monitors,
                              repeatable --monitor DIR=TARGETS)

The per-batch transform is EXACTLY the batch plan (pipeline.extract_spans
/ reassemble) applied inside foreachBatch — identical semantics, one
code path, per pmOCR where service mode calls the same OCR_Dispatch
(pmocr.sh:2195-2224).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import checkpoint as ckpt
from . import pipeline

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _has_committed_offsets(spark: SparkSession, checkpoint_dir: str) -> bool:
    """True when the streaming offsets checkpoint has committed batches
    (i.e. a restart would CONTINUE epoch ids rather than restart at 0).
    Probes through the Hadoop FS API so hdfs://, s3a://, ... work; falls
    back to a driver-local os.path probe."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(f"{checkpoint_dir}/offsets")
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath)) and len(fs.listStatus(jpath)) > 0
    except Exception:  # noqa: BLE001 — non-JVM-resolvable path scheme
        import os

        d = os.path.join(checkpoint_dir, "offsets")
        return os.path.isdir(d) and bool(os.listdir(d))


def _index_has_epoch_dirs(spark, path: str) -> bool:
    """Does a persisted index dir contain epoch-N subdirs (stream-
    accumulated history, epoch-visibility-filtered on probe)? Flat
    layouts — CLI-built or flattened by the compact modes — return
    False: their rows read as seed rows visible to every epoch, so a
    fresh-checkpoint restart cannot hide or overwrite them."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return False
        return any(
            st.isDirectory() and st.getPath().getName().startswith("epoch-")
            for st in fs.listStatus(jpath)
        )
    except Exception:  # noqa: BLE001 — non-JVM-resolvable path scheme
        import os

        if not os.path.isdir(path):
            return False
        return any(
            e.startswith("epoch-") and os.path.isdir(os.path.join(path, e))
            for e in os.listdir(path)
        )


def _epoch_dedup(spark, results: DataFrame, index_dir: str, epoch_id: int) -> DataFrame:
    """Cross-epoch near-dup pass for one streaming micro-batch (see the
    monitor docstring): probe this epoch's successfully extracted txt
    against the prior-epoch band index, persist this epoch's bands, and
    return (doc_id, dup_of) for the batch's near-dup docs.

    Replay idempotence: bands carry an `epoch` column and land in an
    epoch-keyed subdir with mode=overwrite; the probe filters
    epoch < epoch_id, so a crash-replay of epoch E neither sees E's
    crashed bands nor duplicates them. The index accumulates one subdir
    per epoch; the CLI's --compact-dedup-index flattens and caps it
    (read_index uses recursiveFileLookup, so both layouts read)."""
    from .operators import dedup_index as di

    txt_docs = results.filter(F.col("status") == "done").select(
        "doc_id", F.col("txt").alias("text")
    )
    have_index = di.index_exists(spark, index_dir)
    if have_index:
        # a read failure on an EXISTING index propagates loudly — it
        # must not degrade into "first epoch" (zero dup verdicts) and
        # overwrite the params sidecar with defaults
        prior, params = di.read_index(spark, index_dir)
        if "epoch" in prior.columns:  # CLI-built flat indexes have no epoch col
            # epoch NULL = seed rows (CLI-built/merged before the stream
            # started): visible to every epoch. epoch >= epoch_id = this
            # epoch's own crashed bands on a replay: excluded.
            prior = prior.filter(
                F.col("epoch").isNull() | (F.col("epoch") < epoch_id)
            )
    else:
        prior, params = None, {
            "n_hashes": di.N_MINHASH,
            "band_size": di.BAND_SIZE,
            "max_bucket": di.MAX_BAND_BUCKET,
        }
    band_kwargs = {k: params[k] for k in ("n_hashes", "band_size") if k in params}
    # UNCAPPED band rows on disk (the cap-as-policy discipline the CLI
    # modes follow): a per-epoch cap drops a boilerplate flood's bands
    # irreversibly, so later epochs could never match those docs and a
    # --compact-dedup-index would diverge from a one-shot build over the
    # union. The cap is applied TRANSIENTLY to the probe view below.
    new_bands = di.build_index(txt_docs, max_bucket=None, **band_kwargs).persist()
    try:
        return _epoch_dedup_body(
            spark, di, txt_docs, new_bands, prior, params, band_kwargs,
            have_index, index_dir, epoch_id,
        )
    finally:
        # unpersist on EVERY exit: a raising probe (corrupt index, the
        # loud path) under a ProcessingTime trigger retries each 30s —
        # without this, one cached frame leaks per attempt
        new_bands.unpersist()


def _epoch_dedup_body(
    spark, di, txt_docs, new_bands, prior, params, band_kwargs,
    have_index, index_dir, epoch_id,
):
    if have_index:
        hits = di.probe_index(
            txt_docs,
            # transient capped VIEW (same as the CLI probe mode): bounds
            # the join fan-out of buckets that grew hot ACROSS epochs
            # without waiting for a manual compaction
            di.cap_index(prior, params.get("max_bucket")),
            new_bands=new_bands,
            broadcast_probe=True,  # one micro-batch: the small regime
            index_params=params,
            **band_kwargs,
        )
        # deterministic keeper per dup doc: the smallest matched id
        dup_map = hits.groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))
    else:
        dup_map = spark.createDataFrame([], "doc_id string, dup_of string")
    # Materialize with the LINEAGE CUT, not just persist+count: a merely
    # persisted dup_map can be re-executed after the keeper-band write
    # below (cache eviction, executor loss), and on a flat CLI-seeded
    # index — whose read has no epoch column, hence no epoch<E replay
    # filter — the re-executed probe would re-list the index WITH this
    # epoch's own bands and flag within-batch pairs nondeterministically.
    # localCheckpoint(eager) pins the verdicts; losing the checkpointed
    # partitions fails the epoch loudly (replay recovers) instead.
    dup_map = dup_map.localCheckpoint(eager=True)
    keepers = new_bands.join(dup_map.select("doc_id"), "doc_id", "left_anti")
    (
        keepers.withColumn("epoch", F.lit(epoch_id).cast("long"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/epoch-{epoch_id}")
    )
    # drop the session's cached file listing for the index path: a
    # replayed epoch's overwrite replaces part files, and a stale
    # FileStatusCache entry would make the next epoch's read fail with
    # FILE_NOT_EXIST on the old file names
    spark.catalog.refreshByPath(index_dir)
    if not have_index or params.get("source") == "defaults":
        # also heals the sidecar after an epoch-0 crash-replay (bands
        # written, meta not yet) — read_index marks the fallback read
        # with source='defaults'
        di.write_meta(spark, index_dir, params)
    return dup_map


def _epoch_substr_dedup(
    spark, results: DataFrame, index_dir: str, epoch_id: int
) -> DataFrame:
    """Cross-epoch SUBSTRING dedup for one streaming micro-batch: strip
    this epoch's extracted txt of (a) within-batch cross-doc duplicated
    spans and (b) spans whose grams were already seen by ANY earlier
    epoch (the re-crawled-boilerplate regime — nav chrome and license
    blocks that DOM-heuristic extraction misses recur across crawls),
    then append this epoch's distinct gram hashes to the persisted index.

    Same replay discipline as _epoch_dedup: gram rows carry an `epoch`
    column in epoch-keyed overwrite subdirs; the probe reads only
    epoch NULL (CLI/maintenance-seeded flat rows) or epoch < E, so a
    crash-replay of E produces byte-identical cleaned text. The index's
    gram width k lives in its sidecar (GRAM_META) — probing with a
    different k finds nothing, so a mismatch is refused loudly.

    Non-destructive: returns (doc_id, txt_clean, words_removed) for the
    epoch output to LEFT-join — txt stays the exact extraction (the span
    equality invariant), txt_clean is the curation view."""
    from . import checkpoint as ckpt
    from .operators import substring_dedup as sd

    txt_docs = results.filter(F.col("status") == "done").select(
        "doc_id", F.col("txt").alias("text")
    )
    meta = None
    if ckpt.dir_has_data(spark, index_dir):
        meta = ckpt.read_sidecar(spark, index_dir, sd.GRAM_META)
        if meta is not None and meta.get("k") != sd.DEFAULT_K:
            raise ValueError(
                f"gram index at {index_dir!r} was built with k={meta.get('k')}, "
                f"this stream strips with k={sd.DEFAULT_K} — grams are "
                "incomparable and every probe would silently find nothing"
            )
    # WRITE-FIRST ordering: this epoch's grams land before the probe is
    # even planned. A materialize-then-write order is NOT safe for a
    # lazy prior: if the cleaned frame is ever re-executed after the
    # write (cache eviction, executor loss), the probe would re-read the
    # index WITH this batch's own grams and strip every batch document
    # to '' — with the write up front, the epoch<E filter below excludes
    # them deterministically on first execution and on every re-run, and
    # a crash-replay of E just re-overwrites the same subdir.
    (
        sd.corpus_grams(txt_docs, k=sd.DEFAULT_K)
        .withColumn("epoch", F.lit(epoch_id).cast("long"))
        .write.mode("overwrite")
        .parquet(f"{index_dir}/epoch-{epoch_id}")
    )
    # drop any stale file listing (replays rewrite part files)
    spark.catalog.refreshByPath(index_dir)
    if meta is None:
        ckpt.write_sidecar(spark, index_dir, sd.GRAM_META, {"k": sd.DEFAULT_K})
    prior = sd.read_gram_index(spark, index_dir)
    # the epoch column always exists here (this epoch's subdir just
    # landed); compacted/seeded flat rows read as epoch NULL = history
    prior = prior.filter(F.col("epoch").isNull() | (F.col("epoch") < epoch_id))
    return sd.substring_dedup_incremental(txt_docs, prior, k=sd.DEFAULT_K).select(
        "doc_id",
        F.col("new_text").alias("txt_clean"),
        F.col("n_removed").alias("words_removed"),
    )


def monitor(
    spark: SparkSession,
    input_dir: str,
    media_blobs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    lineage_dir: str,
    run_id: str = "stream",
    job_ts: str = "2024-01-01T00:00:00Z",
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    alerts_dir: str | None = None,
    alert_threshold: int = 1,
    epoch_ts_step_s: int = 30,
    targets: list[str] | None = None,
    suffix: str = "_OCR",
    filename_addition: str | None = None,
    broadcast_spans: bool = True,
    num_partitions: int | None = None,
    allow_lineage_takeover: bool = False,
    metrics_dir: str | None = None,
    ocr_udf=None,
    dedup_index_dir: str | None = None,
    substr_index_dir: str | None = None,
    input_format: str = "parquet",
):
    """Start the streaming monitor over a landing directory of parquet
    document files. Returns the StreamingQuery.

    - effectively exactly-once per doc: Spark's file-source seen-map (the
      W2 poller snapshot diff, pmocr.sh:1626) + the lineage anti-join
      (resume semantics identical to batch mode) + IDEMPOTENT epoch
      writes: both the results and the lineage rows of epoch E land in an
      `epoch-E` subdirectory with mode=overwrite, and the anti-join
      excludes epoch E's own prior rows, so a crash-replay of E rewrites
      byte-identical output instead of appending duplicates. Read the
      output with spark.read.option("recursiveFileLookup", "true").
    - failure quarantine + retry: failed docs land in lineage with
      status='failed'; a RE-DROPPED doc (the file source never re-presents
      old files, so retry requires new input — pmOCR's rescan analog) is
      readmitted once the P2 backoff has elapsed on the DETERMINISTIC
      epoch clock: every epoch E stamps job_ts + E*epoch_ts_step_s (the
      trigger interval), never wall clock, so postponement/quarantine
      semantics match batch mode while staying replay-stable (a replayed
      epoch re-stamps the identical ts). After MAX_RETRIES re-admissions
      the doc is never reprocessed (S6).
    - alert sink (S7, pmOCR SendAlert pmocr.sh:428-480): when a batch has
      >= alert_threshold failed docs and alerts_dir is set, one alert row
      (run_id, epoch_id, failed_docs, docs, first_error, ts) is written —
      idempotent per epoch, same overwrite scheme.
    - cross-epoch near-dup suppression (round 4): with dedup_index_dir
      set, every epoch's successfully extracted documents are probed
      against the persisted banded-MinHash index (operators/dedup_index)
      built from ALL PRIOR epochs; near-dup docs get a non-null `dup_of`
      column in the epoch output (annotate, not drop — downstream
      filters on dup_of IS NULL), and the batch's keeper bands are added
      to the index. Replay-idempotent: bands land in an `epoch-E`
      subdir with mode=overwrite and carry an `epoch` column, and the
      probe reads only rows with epoch < E — a crash-replay of E can
      never see its own crashed attempt's bands, so dup verdicts are
      byte-identical on replay. Within-epoch dups are deliberately NOT
      flagged here (the one-shot q18 path and the stateful exact dedup
      cover intra-batch); this index catches the re-crawl across
      triggers/days. Maintain the index with the CLI's
      --compact-dedup-index (hot-bucket cap over the accumulated rows).
    - cross-epoch SUBSTRING dedup: with substr_index_dir set, each
      epoch's extracted txt is stripped of duplicated >= k-word spans —
      within the batch AND against every prior epoch's gram index
      (_epoch_substr_dedup) — and the epoch output gains txt_clean /
      words_removed columns (txt itself stays the exact extraction).
    """
    # Epoch-collision guard: run_id is the STREAM IDENTITY. A stream
    # restarted on a FRESH offsets checkpoint restarts epoch ids at 0;
    # if the lineage dir already holds another identity's epoch rows,
    # the per-epoch replay filter would hide them from the resume
    # anti-join and the epoch-N overwrite would destroy that run's
    # results for every colliding epoch. Refuse that combination —
    # only a true replay of the SAME stream (same run_id, e.g. wiped
    # offsets over unchanged input) or a checkpoint-continuing restart
    # (offsets present, epoch ids keep advancing — crash recovery may
    # legitimately change run_id there) proceeds; pass
    # allow_lineage_takeover=True to override deliberately.
    if not _has_committed_offsets(spark, checkpoint_dir):
        prior = ckpt.read_checkpoint(spark, lineage_dir)
        same_identity_replay = False
        if prior is not None:
            foreign = prior.filter(
                F.col("run_id").rlike("#e\\d+$")
                & ~F.col("run_id").startswith(f"{run_id}#e")
            )
            # a true replay (wiped offsets, lineage intact, same run_id)
            # leaves this identity's own epoch rows behind — epoch
            # overwrites are byte-identical there, so the index guard
            # below must not fire for it
            same_identity_replay = (
                prior.filter(F.col("run_id").startswith(f"{run_id}#e")).limit(1).count() > 0
            )
            if not allow_lineage_takeover and foreign.limit(1).count() > 0:
                raise ValueError(
                    f"lineage at {lineage_dir!r} contains epoch rows from a "
                    f"different stream identity than run_id={run_id!r}, and the "
                    f"offsets checkpoint {checkpoint_dir!r} is fresh — epoch ids "
                    "would restart at 0 and overwrite that stream's epoch "
                    "output/lineage. Reuse the prior --stream-checkpoint (or the "
                    "prior --run-id for a true replay), point at fresh "
                    "lineage/output dirs, or pass allow_lineage_takeover=True."
                )
        # Same collision applies to the persisted cross-epoch INDEX dirs:
        # a fresh-checkpoint restart restarts epoch ids at 0, so the
        # probe's epoch<E filter would hide ALL prior history (every
        # stored row has epoch >= 0) and the epoch-0 overwrite would
        # destroy the prior run's epoch-0 bands/grams. Epoch-less rows
        # (CLI-seeded, or a --compact-*-index flatten) are safe — they
        # read as seed rows visible to every epoch — so the recovery
        # path is: stop, compact the index, restart.
        for idx_dir, flag, compact_flag in (
            (dedup_index_dir, "--dedup-index", "--compact-dedup-index"),
            (substr_index_dir, "--dedup-substrings-index", "--compact-substr-index"),
        ):
            if (
                idx_dir
                and not allow_lineage_takeover
                and not same_identity_replay
                and _index_has_epoch_dirs(spark, idx_dir)
            ):
                raise ValueError(
                    f"{flag} dir {idx_dir!r} holds epoch-keyed subdirs from a "
                    f"prior stream, and the offsets checkpoint {checkpoint_dir!r} "
                    "is fresh — restarted epoch ids would hide that history from "
                    "every probe and overwrite its epoch-0 rows. Run "
                    f"{compact_flag} {idx_dir} first (flattens history to "
                    "always-visible seed rows), reuse the prior "
                    "--stream-checkpoint, or pass allow_lineage_takeover=True."
                )

    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if input_format == "jsonl":
        # web-pipeline interchange drops (sources/jsonl.py): same
        # explicit span schema — streaming schema inference is doubly
        # forbidden (it would re-scan the landing dir every restart)
        stream = reader.json(input_dir)
    elif input_format == "orc":
        # Hive/ORC interchange drops: Spark's native ORC file source
        # takes the same explicit schema (no inference re-scan)
        stream = reader.orc(input_dir)
    else:
        stream = reader.parquet(input_dir)

    from datetime import datetime, timedelta

    base_ts = datetime.fromisoformat(job_ts.replace("T", " ").replace("Z", ""))

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # '#e<N>' epoch tag: unambiguous suffix for the replay filter (a
        # plain '-<N>' could false-match a batch run_id like 'run-0'
        # sharing the lineage dir)
        epoch_run = f"{run_id}#e{epoch_id}"
        # deterministic epoch clock (see docstring): monotonic across
        # epochs so the retry backoff can actually elapse, identical on
        # replay of the same epoch
        epoch_ts = (base_ts + timedelta(seconds=epoch_id * epoch_ts_step_s)).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        lineage = ckpt.read_checkpoint(spark, lineage_dir)
        if lineage is not None:
            # replay safety: epoch E's own rows must not anti-join E's
            # docs away (the replay would overwrite output with nothing).
            # Match the EPOCH SUFFIX, not the exact run_id: a restart
            # with a different --run-id while epoch E sat uncommitted
            # would otherwise keep the crashed attempt's rows, exclude
            # every doc, and overwrite epoch E with empty tables.
            # persist: the resume filter AND checkpoint_rows' retry-count
            # lookup each aggregate this ever-growing table — one scan,
            # not two per epoch.
            lineage = lineage.filter(~F.col("run_id").rlike(f"#e{epoch_id}$")).persist()
        results = pipeline.run_batch(
            spark,
            batch_df,
            media_blobs,
            checkpoint=lineage,
            num_partitions=num_partitions,
            broadcast_spans=broadcast_spans,
            job_ts=epoch_ts,
            ocr_udf=ocr_udf,
        )
        results.persist()
        dup_map = None
        clean_map = None
        try:
            out = pipeline.project_targets(
                results,
                list(targets) if targets else ["txt", "csv"],
                epoch_ts,
                suffix=suffix,
                addition=filename_addition,
            )
            if dedup_index_dir is not None:
                dup_map = _epoch_dedup(
                    spark, results, dedup_index_dir, epoch_id
                )
                out = out.join(dup_map, "doc_id", "left")
            if substr_index_dir is not None:
                clean_map = _epoch_substr_dedup(
                    spark, results, substr_index_dir, epoch_id
                )
                out = out.join(clean_map, "doc_id", "left")
            out.write.mode("overwrite").parquet(f"{output_dir}/epoch-{epoch_id}")
            rows = ckpt.checkpoint_rows(results, run_id=epoch_run, job_ts=epoch_ts, prior=lineage)
            rows.write.mode("overwrite").parquet(f"{lineage_dir}/epoch-{epoch_id}")
            if alerts_dir is not None:
                # the batch's TOTAL drop count (the S7 contract), not the
                # post-resume-filter result count — '1 of 6 dropped files
                # failed' must not read as '100% of a 1-doc batch failed'
                n_docs = batch_df.count()
                n_failed = results.filter(F.col("status") == "failed").count()
                if n_failed >= alert_threshold:  # no empty epoch-N dirs
                    alert = (
                        results.filter(F.col("status") == "failed")
                        .agg(
                            F.count("*").alias("failed_docs"),
                            F.min_by("error", "doc_id").alias("first_error"),
                        )
                        .select(
                            F.lit(run_id).alias("run_id"),
                            F.lit(epoch_id).cast("long").alias("epoch_id"),
                            "failed_docs",
                            F.lit(n_docs).cast("long").alias("docs"),
                            "first_error",
                            F.lit(epoch_ts).cast("timestamp").alias("ts"),
                        )
                    )
                    alert.write.mode("overwrite").parquet(f"{alerts_dir}/epoch-{epoch_id}")
            if metrics_dir is not None:
                # per-partition skew report over the full lineage (incl.
                # this epoch) — the north-rule observability story for
                # the long-running mode; overwrite: it is a derived view.
                # Reuse the ALREADY-READ prior lineage (persisted above,
                # replay-filtered) + this epoch's rows instead of
                # re-reading the whole table — the re-read was an
                # O(total history) scan per epoch, the same unbounded
                # growth the checkpoint_rows semi-join avoids (round-3
                # ADVICE).
                full = rows if lineage is None else lineage.unionByName(rows)
                ckpt.partition_metrics(full).write.mode("overwrite").parquet(metrics_dir)
        finally:
            results.unpersist()
            if dup_map is not None:
                dup_map.unpersist()
            if clean_map is not None:
                clean_map.unpersist()
            if lineage is not None:
                lineage.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    trigger = trigger if trigger is not None else {"availableNow": True}
    writer = writer.trigger(**trigger)
    return writer.start()


def hourly_event_counts(events_stream: DataFrame) -> DataFrame:
    """Windowed streaming agg with watermark (late-data handling, W6
    analog): tumbling 1h counts per event_type."""
    # parquet stores NTZ timestamps; watermarks require TimestampType —
    # cast is exact under the session's pinned UTC timezone
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).cast("long").alias("hour_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_across_batches(
    spans_stream: DataFrame,
    output_mode: str = "update",
):
    """Custom stateful streaming operator: cross-batch exact dedup by
    content hash via applyInPandasWithState (SURVEY §2.8; the engine's
    analog of a streaming `seen` set — pmOCR's poller snapshot diff W2
    generalized to content identity instead of path identity).

    Input: a stream of (doc_id, text). Emits each (hash, doc_id) the
    FIRST time a given text hash is seen across all micro-batches;
    subsequent duplicates update nothing. State per hash group: the
    keeper doc_id + duplicate count.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    keyed = spans_stream.select(
        F.md5(F.col("text").cast("binary")).alias("h"), "doc_id"
    )

    def dedup_fn(key, pdfs, state: GroupState):
        (h,) = key
        if state.exists:
            keeper, dups = state.get
        else:
            keeper, dups = None, 0
        new_ids = []
        for pdf in pdfs:
            new_ids.extend(pdf["doc_id"].tolist())
        new_ids.sort()
        first_seen = keeper is None
        if first_seen and new_ids:
            keeper = new_ids[0]
            dups += len(new_ids) - 1
        else:
            dups += len(new_ids)
        state.update((keeper, dups))
        if first_seen and keeper is not None:
            yield pd.DataFrame({"h": [h], "keep_id": [keeper], "dup_count": [dups]})
        else:
            yield pd.DataFrame({"h": [], "keep_id": [], "dup_count": []})

    return keyed.groupBy("h").applyInPandasWithState(
        dedup_fn,
        outputStructType="h string, keep_id string, dup_count long",
        stateStructType="keeper string, dups long",
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )
