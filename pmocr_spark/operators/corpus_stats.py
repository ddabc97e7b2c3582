"""Corpus datasheet: the one-report summary a dataset release ships
with ("Datasheets for Datasets", Gebru et al. CACM'21; Dolma's and
FineWeb's released corpus reports are the practice this mirrors —
public).

Design for 10^12 docs:

- ONE pass over the corpus builds a cached per-doc feature frame
  (tokens/chars/hash/lang/quality — all codegen expressions, no
  Python); every aggregate below reads that cached frame, so the raw
  table is scanned once.
- Distribution statistics use approx sketches (approx_percentile /
  approx_count_distinct) — exact percentiles would global-sort the
  corpus; the sketches are mergeable map-side state.
- The word-level block (top words, type counts) is the only explode,
  feeding a hash agg with map-side combine + TakeOrderedAndProject
  (per-partition heaps — never a global sort of the vocabulary).
- The result is a driver-sized dict (fixed number of scalars + a
  bounded top-k list), safe to json.dump anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: marker-token languages, shared with queries.q23 (kept tiny + fixed:
#: the datasheet's lang mix is the same heuristic the gate verifies)
LANG_MARKERS = [("en", "the"), ("es", "los"), ("de", "und"), ("fr", "les"), ("zh", "shi")]

#: top-k words reported by the datasheet (bounded driver footprint)
TOP_WORDS_K = 20


def _occ(marker: str):
    lt = F.lower(F.col("text"))
    return F.floor(
        (F.length(lt) - F.length(F.replace(lt, F.lit(marker)))) / len(marker)
    ).cast("long")


def per_doc_features(docs: DataFrame) -> DataFrame:
    """One codegen projection: everything the aggregates need, computed
    in a single scan of (doc_id, text)."""
    scores = [_occ(m).alias(f"s_{lang}") for lang, m in LANG_MARKERS]
    d = docs.select(
        "doc_id",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        *scores,
    )
    cols = [F.col(f"s_{lang}") for lang, _ in LANG_MARKERS]
    g = F.greatest(*cols)
    pred = F.when(g == 0, "und")
    for lang, _ in LANG_MARKERS:
        pred = pred.when(g == F.col(f"s_{lang}"), lang)
    return d.select(
        "doc_id",
        "text",
        "n_chars",
        "n_tokens",
        "content_hash",
        pred.alias("lang"),
    )


def corpus_datasheet(docs: DataFrame) -> dict:
    """Compute the datasheet over a documents(doc_id, text, ...) table.

    Returns a plain dict: corpus sizes, token/char distributions
    (approx sketches), language mix, exact-duplicate rate
    (approx_count_distinct over the content hash — the exact-dedup
    operator q16 is the authoritative version; the datasheet wants the
    cheap estimate), and the bounded top-k word list."""
    feats = per_doc_features(docs).persist()
    try:
        head = feats.agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("total_chars"),
            F.approx_count_distinct("content_hash").alias("approx_distinct_docs"),
            F.percentile_approx(
                "n_tokens", [0.05, 0.5, 0.95], 10_000
            ).alias("tokens_p05_50_95"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        ).collect()[0]
        langs = {
            r["lang"]: r["n"]
            for r in feats.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        words = (
            feats.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias("n"))
        )
        top = [
            {"word": r["w"], "count": r["n"]}
            for r in words.orderBy(F.col("n").desc(), F.col("w").asc())
            .limit(TOP_WORDS_K)
            .collect()
        ]
        n_docs = head["n_docs"]
        distinct = min(head["approx_distinct_docs"], n_docs) if n_docs else 0
        return {
            "n_docs": n_docs,
            "total_tokens": head["total_tokens"],
            "total_chars": head["total_chars"],
            "tokens_p05_50_95": list(head["tokens_p05_50_95"] or []),
            "min_tokens": head["min_tokens"],
            "max_tokens": head["max_tokens"],
            "approx_distinct_docs": distinct,
            "approx_exact_dup_rate": (
                round(1.0 - distinct / n_docs, 6) if n_docs else 0.0
            ),
            "lang_mix": dict(sorted(langs.items())),
            "top_words": top,
        }
    finally:
        feats.unpersist()


# ---------------------------------------------------------------------
# Deterministic HyperLogLog (Flajolet et al. AofA'07) — bounded-memory
# cardinality with ORACLE-CHECKABLE state.
# ---------------------------------------------------------------------

#: register-index bits: m = 2^HLL_P registers per group (~1.04/sqrt(m)
#: = 6.5% standard error — the corpus-datasheet accuracy class)
HLL_P = 8
HLL_M = 1 << HLL_P
#: rank ceiling for the 32-bit md5 prefix: 24 value bits + 1
_HLL_MAX_RANK = 33 - HLL_P


def hll_sketch(df: DataFrame, key, group_cols: list[str]) -> DataFrame:
    """The HLL register table for `key`'s distinct count per group:
    (group_cols..., bucket, rank) with rank = max leading-zero rank of
    the 24-bit md5 suffix whose 8-bit prefix routes to `bucket`.

    Spark's approx_count_distinct is the production one-liner; THIS
    exists because its sketch is opaque — here the registers are plain
    rows whose arithmetic (md5 -> 32-bit int -> bucket/rank via integer
    ops and bit-length, never a float) restates exactly in any engine,
    so the driver gate can hash-verify the distributed state itself
    (q30 part='hll'). The shape is the 100 TB one regardless: ONE hash
    agg with map-side combine; registers are mergeable by element-wise
    max (union semantics — tested), so per-partition partial sketches
    combine associatively like any Spark partial agg. Absent buckets
    mean rank 0; hll_estimate accounts for them."""
    h = F.conv(
        F.substring(F.md5(key.cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    w = F.floor(h / HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(_HLL_MAX_RANK)).otherwise(
        F.lit(_HLL_MAX_RANK) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, (h % HLL_M).alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").cast("long").alias("rank"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimates from a register table: the raw HLL
    harmonic-mean estimator with the standard small-range linear-
    counting correction (E <= 2.5m with empty registers present).
    Distributed: one agg per group over <= m register rows. Floats
    live HERE only (the gate verifies the integer registers;
    tests/test_corpus_stats pins estimator accuracy vs exact counts)."""
    alpha = 0.7213 / (1 + 1.079 / HLL_M)  # standard alpha_m, m >= 128
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("_s"),
        F.count("*").alias("_nz"),
    )
    zeros = F.lit(HLL_M) - F.col("_nz")
    raw = F.lit(alpha * HLL_M * HLL_M) / (F.col("_s") + zeros)
    lin = F.lit(HLL_M) * F.log(F.lit(float(HLL_M)) / zeros)
    est = F.when((raw <= 2.5 * HLL_M) & (zeros > 0), lin).otherwise(raw)
    return agg.select(*group_cols, F.floor(est).cast("long").alias("n_distinct_est"))


# ---------------------------------------------------------------------
# Deterministic Count-Min sketch (Cormode & Muthukrishnan JAlg'05) —
# bounded-memory frequency estimation, FULLY gate-verifiable (counters
# AND point estimates are integers).
# ---------------------------------------------------------------------

#: depth (independent hash rows; error probability ~ e^-d)
CMS_D = 4
#: width (counters per row; overestimate bound ~ e/w * total_count)
CMS_W = 512


def _cms_cols(key, i: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}|"), key).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def cms_sketch(df: DataFrame, key, weight=None) -> DataFrame:
    """Build the counter table (row, col, cnt) for a stream of keys
    (optionally weighted). d*w = 2048 integer counters regardless of
    corpus size — the bounded-memory heavy-hitter state every ingest
    monitor keeps. ONE explode (xd, map-side) + ONE hash agg with
    map-side combine; counters from separate batches MERGE BY ADDITION
    (test-pinned), so incremental ingest just unions + re-sums — no
    raw-data replay."""
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    pos = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _cms_cols(key, i).alias("col"))
            for i in range(CMS_D)
        ]
    )
    return (
        df.select(F.explode(pos).alias("rc"), w.alias("_w"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_query(counters: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates: est(key) = min over the d counters the
    key routes to — never under the true count, over by at most
    ~(e/w)*total with probability 1-e^-d (the classic CMS guarantee;
    both sides of it test-pinned). The counter table (<= d*w rows)
    broadcasts; probes stream map-side through the join, then one
    groupBy(key) takes the min — the per-key estimate never needs the
    raw stream again. Counters never incremented read as 0 (left join +
    coalesce), so absent keys estimate 0-or-collision like the paper's
    sketch, not NULL."""
    key = F.col(key_col)
    pos = F.array(
        *[
            F.struct(F.lit(i).alias("row"), _cms_cols(key, i).alias("col"))
            for i in range(CMS_D)
        ]
    )
    ex = probes.select(key_col, F.explode(pos).alias("rc")).select(
        key_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col")
    )
    return (
        ex.join(F.broadcast(counters), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def pmi_topk(
    bigrams: DataFrame,
    unigrams: DataFrame,
    k: int = 20,
    min_count: int = 10,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks, CL 1990 — the association statistic that finds "strong tea"
    vs "powerful tea"): for a bigram (a, b),

        pmi = ln( P(a,b) / (P(a) P(b)) )
            = ln( (c_ab * N_w * N_w) / (N_bg * c_a * c_b) )

    with c_ab from `bigrams` (bigram: "a b", cnt), c_a/c_b from
    `unigrams` (word, freq), N_w = total tokens, N_bg = total bigrams.
    Emitted as pmi_micro = round(1e6 * ln(...)) BIGINT (the tfidf/bm25
    exactness convention: the ln argument is one ratio of exact
    integer-derived doubles, multiplied in a FIXED order, so both
    engines compute the identical double and round to the identical
    integer). min_count floors c_ab — PMI is notoriously noisy on rare
    pairs (the standard mitigation).

    Scale: both inputs are already-aggregated, Heaps-law-small tables
    (the corpus was tokenized upstream, once). The two unigram joins
    BROADCAST (vocabulary-sized); the 1-row totals ride as broadcast
    frames; top-k is TakeOrderedAndProject. Nothing corpus-sized moves.
    """
    uni = unigrams.select("word", F.col("freq").cast("double").alias("c"))
    n_w = unigrams.agg(F.sum("freq").cast("double").alias("n_w"))
    n_bg = bigrams.agg(F.sum("cnt").cast("double").alias("n_bg"))
    parts = F.split("bigram", " ")
    scored = (
        bigrams.filter(F.col("cnt") >= min_count)
        .select(
            "bigram",
            "cnt",
            F.get(parts, 0).alias("wa"),
            F.get(parts, 1).alias("wb"),
        )
        .join(
            F.broadcast(uni.select(F.col("word").alias("wa"), F.col("c").alias("ca"))),
            "wa",
        )
        .join(
            F.broadcast(uni.select(F.col("word").alias("wb"), F.col("c").alias("cb"))),
            "wb",
        )
        .crossJoin(F.broadcast(n_w))
        .crossJoin(F.broadcast(n_bg))
        .select(
            "bigram",
            "cnt",
            F.round(
                F.lit(1000000.0)
                * F.log(
                    F.col("cnt")
                    * F.col("n_w")
                    * F.col("n_w")
                    / (F.col("n_bg") * F.col("ca") * F.col("cb"))
                ),
                0,
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    return scored.orderBy(
        F.col("pmi_micro").desc(), F.col("bigram").asc()
    ).limit(k)


def llr_topk(bigrams: DataFrame, k: int = 20, min_count: int = 10) -> DataFrame:
    """Top-k collocations by Dunning's log-likelihood ratio (Dunning,
    CL 1993 "Accurate methods for the statistics of surprise and
    coincidence" — the collocation test that, unlike PMI, does not
    over-reward rare pairs). For bigram (a, b) the 2x2 contingency over
    the bigram stream is

        k11 = c_ab            k12 = C_b - c_ab
        k21 = R_a - c_ab      k22 = N - R_a - C_b + c_ab

    with R_a = bigrams starting with a, C_b = bigrams ending with b,
    N = total bigrams — all derived from the SAME bigram-count table,
    so the statistic is self-consistent (unigram totals would miscount
    document-edge tokens). llr = 2 * sum k_ij * ln(k_ij * N / (R_i *
    C_j)) over non-empty cells, emitted as llr_micro =
    round(1e6 * llr) BIGINT: the expression tree is written in ONE
    fixed order (left-associative four-term sum) so both engines
    produce the identical double (the pmi/tfidf exactness discipline).

    Scale: `bigrams` is already-aggregated and Heaps-law-small; the
    row-margin / column-margin tables are vocabulary-sized and
    BROADCAST back; N rides as a broadcast 1-row frame; top-k is
    TakeOrderedAndProject. Nothing corpus-sized moves."""
    parts = F.split("bigram", " ")
    bg = bigrams.select(
        "bigram",
        "cnt",
        F.get(parts, 0).alias("wa"),
        F.get(parts, 1).alias("wb"),
    )
    ra = bg.groupBy("wa").agg(F.sum("cnt").cast("double").alias("ra"))
    cb = bg.groupBy("wb").agg(F.sum("cnt").cast("double").alias("cb"))
    n = bigrams.agg(F.sum("cnt").cast("double").alias("n"))

    def _term(kk, row, col):
        return F.when(
            kk > 0, kk * F.log(kk * F.col("n") / (row * col))
        ).otherwise(F.lit(0.0))

    k11 = F.col("cnt").cast("double")
    k12 = F.col("cb") - k11
    k21 = F.col("ra") - k11
    k22 = F.col("n") - F.col("ra") - F.col("cb") + k11
    llr = F.lit(2.0) * (
        _term(k11, F.col("ra"), F.col("cb"))
        + _term(k12, F.col("n") - F.col("ra"), F.col("cb"))
        + _term(k21, F.col("ra"), F.col("n") - F.col("cb"))
        + _term(k22, F.col("n") - F.col("ra"), F.col("n") - F.col("cb"))
    )
    scored = (
        bg.filter(F.col("cnt") >= min_count)
        .join(F.broadcast(ra), "wa")
        .join(F.broadcast(cb), "wb")
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "cnt",
            F.round(F.lit(1000000.0) * llr, 0).cast("long").alias("llr_micro"),
        )
    )
    return scored.orderBy(
        F.col("llr_micro").desc(), F.col("bigram").asc()
    ).limit(k)


def burstiness_topk(tf: DataFrame, k: int = 20, min_cf: int = 10) -> DataFrame:
    """Top-k bursty terms (Church & Gale 1995, "Poisson mixtures"; Katz
    1996): burstiness = cf/df — collection frequency over document
    frequency, the mean within-document repetition of a term. Content
    words repeat inside the documents that mention them (cf/df >> 1);
    function words spread evenly (cf/df ~ corpus mean). The classic
    corpus-datasheet complement to raw frequency, and the signal
    templated boilerplate shows up in (a template phrase has high df
    AND high cf/df).

    Input is the (doc_id, term, tf) table (keywords.doc_term_freqs),
    so cf = sum(tf) and df = count(*) come from ONE vocabulary-keyed
    agg with map-side partials — the corpus is not re-scanned. Score in
    integer micro-units: cf and df are exact integers, the single
    division is the only float op (engine-portable); min_cf floors
    rare-term noise; top-k compiles to TakeOrderedAndProject."""
    stats = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count("*").cast("long").alias("df"),
    )
    return (
        stats.filter(F.col("cf") >= min_cf)
        .select(
            "term",
            "cf",
            "df",
            F.round(F.lit(1000000.0) * F.col("cf") / F.col("df"), 0)
            .cast("long")
            .alias("burst_micro"),
        )
        .orderBy(F.col("burst_micro").desc(), F.col("term").asc())
        .limit(k)
    )
