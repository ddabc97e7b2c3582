"""Incremental MinHash/LSH dedup against a persisted index.

A training-data pipeline rarely deduplicates one static corpus once: new
crawl batches arrive and must be checked against EVERYTHING ingested so
far. Recomputing signatures for the whole corpus per batch is O(corpus)
per batch; the right shape is a persisted banded-signature index:

    index = build_index(corpus_docs)            # once, O(corpus)
    ...store index (parquet/Iceberg, ideally bucketed by (band, key))...
    new_bands = build_index(new_docs)           # per batch, O(batch)
    hits = probe_index(new_docs, index, new_bands=new_bands)
    keep = new_bands.join(dups, "doc_id", "left_anti")
    index = merge_index(index, keep)            # re-applies the bucket cap

    The index's banding parameters (n_hashes/band_size) are part of its
    identity: probe with the SAME values it was built with (probe_index
    validates the band-id range and raises on mismatch).

Scale notes (100 TB): the index has n_bands rows per doc and is joined
on (band, key) — store it bucketed by those columns (see
operators/bucketed.py) and the probe's shuffle disappears on the index
side; a batch-small probe side broadcasts (broadcast_probe=True), a
corpus-sized one (backfill, self-probe) must NOT — default to no hint
and let AQE pick at runtime. Hot buckets
(boilerplate floods) are capped exactly like the one-shot q18 path: a
bucket with > max_bucket members is near-pure false-positive mass and
would cost k²/2 join fan-out.

This module is also the single home of the shingle/minhash/band
construction — queries.py (q17/q18/q58/q59 and the shingle helper)
delegates here so the subtle arrays_zip/null-tail idiom exists once.

pmOCR has no content-dedup analog (its work-avoidance is path identity,
pmocr.sh:2126-2144); this is a training-data-pipeline operator per the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: one-shot q18 parity: 12 hashes in 4 bands of 3, buckets capped at 100
N_MINHASH = 12
BAND_SIZE = 3
MAX_BAND_BUCKET = 100


def tokens_col(text_col: str = "text"):
    """Lower-cased whitespace tokens of a text column (the engine's
    canonical tokenization — mirrors the DuckDB oracle's
    string_split_regex(lower(trim(text)), '\\s+'))."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def ngram_rows(
    d: DataFrame, n_words: int, alias: str = "ng", id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded word n-grams: (id_col, <alias>).

    Shuffle-free construction shared by shingling (n=3), bigram LM
    counts (n=2) and contamination 4-grams: zip the token array against
    its own 1..n-1-shifted slices (arrays_zip + slice — codegen'd array
    ops), explode, drop the null-padded tail (which also drops docs with
    < n tokens). All tokens of a doc live in its one input row, so no
    Window/shuffle is needed to pair neighbors."""
    n = F.size(F.col("w"))
    fields = [F.col("w").alias("t0")] + [
        F.slice("w", k + 1, F.greatest(n - k, F.lit(0))).alias(f"t{k}")
        for k in range(1, n_words)
    ]
    return (
        d.select(F.col(id_col).alias(id_col), tokens_col(text_col).alias("w"))
        .select(id_col, F.explode(F.arrays_zip(*fields)).alias("s"))
        .filter(F.col(f"s.t{n_words - 1}").isNotNull())
        .select(
            id_col,
            F.concat_ws(" ", *[f"s.t{k}" for k in range(n_words)]).alias(alias),
        )
    )


def minhash_bands(
    shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Banded MinHash signature rows (id, band, key) from exploded
    shingles. One groupBy(id) computes all n_hashes min-hashes as agg
    columns (no row amplification); bands of band_size hashes md5-fold
    into one key. Buckets with > max_bucket members are dropped (None
    disables the cap) — they are boilerplate floods whose k²/2 join
    fan-out buys almost no true positives."""
    mins = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}|"), F.col(shingle_col)).cast("binary"))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = shingles.groupBy(id_col).agg(*mins)
    band_cols = []
    for b in range(n_hashes // band_size):
        parts = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat(F.lit(f"{b}|"), *parts).cast("binary")).alias("key"),
            )
        )
    bands = sig.select(id_col, F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    if max_bucket is not None:
        big = (
            bands.groupBy("band", "key")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("band", "key")
        )
        bands = bands.join(big, ["band", "key"], "left_anti")
    return bands


def build_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", **band_kwargs
) -> DataFrame:
    """(id, band, key) index rows for a document frame: 3-gram shingles
    -> banded MinHash. Persist the result as the corpus dedup index
    (bucket by (band, key) for shuffle-free probes at scale).

    No shingle distinct (round 4): duplicate shingles cannot change a
    min-hash, and the signature groupBy's map-side combiner absorbs them
    — the former .distinct() was a full exchange of the largest
    intermediate for identical output."""
    sh = ngram_rows(docs, 3, "shingle", id_col=id_col, text_col=text_col)
    return minhash_bands(sh, id_col=id_col, **band_kwargs)


def probe_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    new_bands: DataFrame | None = None,
    broadcast_probe: bool | None = None,
    index_params: dict | None = None,
    **band_kwargs,
) -> DataFrame:
    """Near-dup hits of a NEW batch against the persisted index:
    (doc_id, dup_of, n_bands) — one row per (new doc, indexed doc) pair
    sharing >= 1 band bucket, with the shared-bucket count as a crude
    confidence. Self-matches (same id on both sides, e.g. probing the
    corpus against its own index) are excluded.

    Join strategy — `broadcast_probe` (the round-3 verdict's scale fix;
    the old unconditional broadcast OOMs when a backfill batch is
    corpus-sized):
      * True  — force-broadcast the probe side. Right when the batch is
        known-small (the steady-state incremental regime).
      * False/None (default) — no hint: AQE picks broadcast at runtime
        iff the built probe side is actually under the threshold, else a
        shuffled join. With a (band,key)-bucketed index table the index
        side still never shuffles (operators/bucketed.py recipe).
        Corpus-sized probes (q47's self-probe, backfills) MUST take
        this path.

    Pass `new_bands` (from build_index over the same docs) to reuse the
    signature computation across probe and merge — the docstring recipe
    would otherwise pay the shingle->minhash->band pipeline twice per
    batch.

    The banding parameters must match the ones the index was built
    with. Pass `index_params` (the dict read_index returns) to validate
    exactly — catches same-band-count mismatches like 12/3 vs 8/2 that
    the range check cannot. Without it (sidecar-less index) the guard
    falls back to comparing the two sides' band-id ranges."""
    effective = {
        "n_hashes": band_kwargs.get("n_hashes", N_MINHASH),
        "band_size": band_kwargs.get("band_size", BAND_SIZE),
    }
    if index_params is not None and index_params.get("source") != "defaults":
        stored = {k: index_params.get(k) for k in ("n_hashes", "band_size")}
        if stored != effective:
            raise ValueError(
                f"index was built with {stored} but the probe uses "
                f"{effective} — probe with the parameters the index was "
                "built with (read_index returns them)"
            )
    if new_bands is None:
        new_bands = build_index(new_docs, id_col=id_col, text_col=text_col, **band_kwargs)
    if index_params is None or index_params.get("source") == "defaults":
        # sidecar-less fallback: compare actual band-id ranges (one
        # pruned single-column agg per side). Runs ALSO when read_index
        # substituted the defaults (source='defaults') — those params
        # are a guess, not the build's, so the exact check above was
        # skipped and an API-built index with non-default geometry
        # would otherwise probe silently wrong (e.g. after the crash
        # window between replace_dir and write_meta)
        idx_max = index.agg(F.max("band").alias("m")).collect()[0]["m"]
        new_max = new_bands.agg(F.max("band").alias("m")).collect()[0]["m"]
        if idx_max is not None and new_max is not None and idx_max != new_max:
            raise ValueError(
                f"index has band ids 0..{idx_max} but the probe side has "
                f"0..{new_max} — the index was built with different "
                "n_hashes/band_size; probe with the parameters it was "
                "built with"
            )
    idx = index.select(
        F.col(id_col).alias("dup_of"), F.col("band").alias("band"), F.col("key").alias("key")
    )
    probe_side = F.broadcast(new_bands) if broadcast_probe else new_bands
    return (
        idx.join(probe_side, ["band", "key"])
        .filter(F.col(id_col) != F.col("dup_of"))
        .groupBy(id_col, "dup_of")
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


def write_index(
    index: DataFrame,
    path: str,
    n_hashes: int = N_MINHASH,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = MAX_BAND_BUCKET,
    mode: str = "overwrite",
) -> None:
    """Persist an index WITH its banding parameters: the (band, key)
    values are meaningless without n_hashes/band_size (probing with
    different ones silently finds nothing), so they travel as a
    `_dedup_index_meta.json` sidecar inside the table dir — Spark
    ignores underscore-prefixed files on read, and read_index hands the
    params back so later batch jobs probe with the right ones."""
    index.write.mode(mode).parquet(path)
    write_meta(
        index.sparkSession,
        path,
        {"n_hashes": n_hashes, "band_size": band_size, "max_bucket": max_bucket},
    )


def write_meta(spark, path: str, meta: dict) -> None:
    """Write/refresh the `_dedup_index_meta.json` params sidecar inside
    an index table dir (also used after in-place maintenance rewrites —
    e.g. the CLI's merge/compact modes replace the dir and must restore
    the sidecar the swap discarded)."""
    from pmocr_spark import checkpoint as _ckpt

    meta = {k: v for k, v in meta.items() if k != "source"}
    _ckpt.write_sidecar(spark, path, "_dedup_index_meta.json", meta)


def index_exists(spark, path: str) -> bool:
    """Does a persisted index (any data beyond hidden sidecars) exist at
    `path`? The streaming monitor uses this instead of try/except around
    read_index: a bare except turned ANY read failure (corrupt footer,
    transient FS error, permissions) into 'first epoch, no index yet' —
    silently probing nothing and then overwriting the params sidecar
    with defaults. With an explicit probe, read errors on an existing
    index propagate loudly."""
    from pmocr_spark import checkpoint as _ckpt

    return _ckpt.dir_has_data(spark, path)


def read_index(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a persisted index and its banding parameters. Returns
    (index, params); pass `**params` (minus max_bucket if probing an
    uncapped build) as band_kwargs to probe_index/build_index so the
    new batch is banded the way the index was. A pre-sidecar index
    reads with the defaults and a params['source']='defaults' marker."""
    from pmocr_spark import checkpoint as _ckpt

    # recursiveFileLookup: the streaming monitor's index accumulates one
    # epoch-keyed subdir per trigger (replay-idempotent overwrites);
    # flat (CLI-built / compacted) layouts read identically under it.
    # mergeSchema: a CLI-seeded flat index (no epoch column) plus the
    # stream's epoch-N subdirs (epoch column) is a MIXED-schema table —
    # without the merge, single-footer inference either drops the epoch
    # column (replay filter silently skipped) or reads flat rows with
    # epoch=NULL under a filter that drops them (seeded corpus silently
    # excluded from every probe). Index footers are small; the merge
    # cost is negligible next to the probe join.
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", "true")
        .parquet(path)
    )
    params = _ckpt.read_sidecar(spark, path, "_dedup_index_meta.json")
    if params is None:
        params = {
            "n_hashes": N_MINHASH,
            "band_size": BAND_SIZE,
            "max_bucket": MAX_BAND_BUCKET,
            "source": "defaults",
        }
    return df, params


def cap_index(
    index: DataFrame, max_bucket: int | None = MAX_BAND_BUCKET, id_col: str = "doc_id"
) -> DataFrame:
    """Drop rows in hot (band, key) buckets with > max_bucket DISTINCT
    members — the periodic compaction pass. One groupBy over the index
    plus an anti-join; run it every N merges, not per merge (see
    merge_index). Distinct, not count(*): a streaming-accumulated index
    can carry the same (id, band, key) under several epoch values
    (re-dropped files re-band under the new epoch), and row counting
    would read a 60-doc bucket as 120 and wrongly drop it."""
    if max_bucket is None:
        return index
    big = (
        index.groupBy("band", "key")
        .agg(F.count_distinct(F.col(id_col)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "key")
    )
    return index.join(big, ["band", "key"], "left_anti")


def merge_index(
    index: DataFrame,
    new_index: DataFrame,
    max_bucket: int | None = MAX_BAND_BUCKET,
    apply_cap: bool = True,
) -> DataFrame:
    """Union the existing index with a new batch's rows (idempotent:
    duplicate (id, band, key) rows collapse). With apply_cap=True
    (default, matches the original semantics) the hot-bucket cap is
    RE-APPLIED to the merged table: per-batch caps cannot see a
    boilerplate flood arriving 90 docs per batch across 50 batches, so
    without a merged-table cap such a bucket grows unbounded and every
    future probe against it fans out k-fold — the join bomb the cap
    exists to prevent.

    The cap pass is an O(index) groupBy, so steady-state batch merges
    should pass apply_cap=False (append-cheap: union + distinct only)
    and run cap_index() as a periodic compaction every N batches — hit
    parity with always-cap holds as long as a compaction runs before
    the index is probed (tests/test_dedup_index.py pins this). This is
    the round-3 verdict's steady-state-merge-cost fix.

    allowMissingColumns: a streaming-accumulated index carries an
    `epoch` column that a CLI batch's fresh bands lack — the strict
    union raised AnalysisException on exactly the indexes the service
    mode produces. Batch-merged rows read epoch=NULL, which the
    streaming probe treats as seed rows (visible to every epoch).

    Idempotence keys on (id, band, key) IGNORING epoch: a plain
    distinct() would keep one row per epoch value for a re-dropped doc,
    double-counting it in every bucket it touches. The collapsed row
    keeps the EARLIEST visibility — NULL (seed, visible to every epoch)
    beats any numeric epoch, else min(epoch) — so replay filters see
    the band exactly as early as any surviving source row allowed."""
    merged = index.unionByName(new_index, allowMissingColumns=True)
    if "epoch" in merged.columns:
        id_col = [c for c in merged.columns if c not in ("band", "key", "epoch")][0]
        any_null = F.count(F.lit(1)) > F.count("epoch")  # count(col) skips NULLs
        merged = merged.groupBy(id_col, "band", "key").agg(
            F.when(any_null, F.lit(None).cast("long")).otherwise(F.min("epoch")).alias("epoch")
        )
    else:
        merged = merged.distinct()
    if apply_cap:
        merged = cap_index(merged, max_bucket)
    return merged
