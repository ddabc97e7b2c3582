"""Per-document tf-idf keyword extraction — the classic corpus
-exploration / document-tagging operator (Sparck Jones JDoc'72 idf;
the tf·idf weighting every retrieval textbook builds on). Given the
token stream, emit each document's top-k most distinctive terms:
score = tf · ln(N / df) in integer micro-units (the bm25.py exactness
convention: round once to BIGINT, rank on the integer so the ordering
is engine-portable).

Scale shape (the BM25 lessons applied):
- term frequencies: ONE hash agg on (doc_id, term) with map-side
  partial aggregation — the only corpus-sized shuffle;
- document frequencies: an agg over the tf table keyed by TERM — the
  result is vocabulary-sized (Heaps-law-small), so it BROADCASTS back
  onto tf (no corpus re-shuffle for the idf join);
- the corpus doc count rides in as a broadcast 1-row frame (the q24
  pattern), never a driver-side literal baked before the plan runs;
- top-k per doc: a row_number window partitioned by doc_id — per-doc
  term counts are bounded by document length, so no skew cap is
  needed (contrast per-DOMAIN top-k, q35, where hot keys force the
  salted two-phase form).

Reference tie: pmOCR has no corpus statistics at all (it converts one
file at a time, pmocr.sh:2160-2183); keywords are part of the
"datasheet" layer a 100 TB corpus needs (corpus_stats.py sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def doc_term_freqs(docs: DataFrame, tokens) -> DataFrame:
    """(doc_id, term, tf) from a documents frame and a token-array
    column expression. Empty tokens dropped (the word_freqs
    convention)."""
    return (
        docs.select("doc_id", F.explode(tokens).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_topk(docs: DataFrame, tokens, k: int = 3) -> DataFrame:
    """Top-k tf-idf keywords per document:
    (doc_id, term, tf, df, score_micro, rank) with
    score_micro = round(1e6 · tf · ln(N/df)) as BIGINT. Ubiquitous
    terms (df == N) score exactly 0 and can still fill a short
    document's top-k — deterministic, ties broken (score desc, term
    asc)."""
    tf = doc_term_freqs(docs, tokens)
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_micro",
            F.round(
                F.lit(float(MICRO))
                * F.col("tf")
                * F.log(F.col("n_docs") / F.col("df")),
                0,
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score_micro", "rank")
    )


def kwic(docs: DataFrame, tokens, term: str, window: int = 2) -> DataFrame:
    """KeyWord-In-Context concordance (the corpus-linguistics staple
    every concordancer since the 1959 KWIC index implements): every
    occurrence of `term` with `window` tokens of left/right context.
    Returns (doc_id, pos, left_ctx, term, right_ctx), pos 1-based.

    Scale shape: ONE map-only pass — match positions come from a
    transform+filter over the token array (no posexplode of every
    token: the explode fan-out is |occurrences|, not |tokens|), and
    both contexts are array slices of the same in-row array. Zero
    shuffles at any corpus size; with a positional index (bm25.py) the
    scan side can be pre-filtered to posting docs, but the context
    fetch is this same slice either way."""
    hits = docs.select(
        "doc_id",
        tokens.alias("_ws"),
        F.explode(
            F.filter(
                F.transform(
                    tokens,
                    lambda x, i: F.when(x == F.lit(term), i + F.lit(1)),
                ),
                lambda v: v.isNotNull(),
            )
        ).alias("pos"),
    )
    start = F.greatest(F.lit(1), F.col("pos") - F.lit(window))
    return hits.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.array_join(F.slice("_ws", start, F.col("pos") - start), " ").alias(
            "left_ctx"
        ),
        F.lit(term).alias("term"),
        F.array_join(
            F.slice("_ws", F.col("pos") + 1, window), " "
        ).alias("right_ctx"),
    )


#: RAKE's stopword list — the phrase-boundary delimiters. A fixed,
#: tiny function-word set (real deployments plug in a full list; the
#: algorithm only requires that boundaries are content-free).
RAKE_STOPWORDS = ("the", "a", "and", "of", "to", "in")


def rake_phrases(docs: DataFrame, tokens, stopwords=RAKE_STOPWORDS) -> DataFrame:
    """RAKE candidate phrases (Rose et al. 2010, 'Automatic Keyword
    Extraction from Individual Documents'): maximal token runs between
    stopword boundaries. Returns one row per phrase MEMBER occurrence,
    (doc_id, pid, pos, tok, plen) — the working table both the word
    statistics and the phrase assembly derive from.

    Scale shape: ONE Window(doc_id) sorted scan assigns phrase ids
    (running stopword count), and the phrase-length window reuses that
    partitioning — a single corpus shuffle keyed by doc_id, after
    which every downstream agg/join in rake_topk keys on doc_id-
    prefixed columns and reuses the same partitioning exchange-free."""
    tok = (
        docs.select("doc_id", F.posexplode(tokens).alias("pos", "tok"))
        .filter(F.length("tok") > 0)
        .withColumn("is_stop", F.col("tok").isin(*stopwords))
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    rows = (
        tok.withColumn(
            "pid", F.sum(F.col("is_stop").cast("long")).over(win)
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "pid", F.col("pos").cast("long").alias("pos"), "tok")
    )
    plen = F.count("*").over(Window.partitionBy("doc_id", "pid"))
    return rows.withColumn("plen", plen.cast("long"))


def rake_topk(
    docs: DataFrame, tokens, k: int = 3, stopwords=RAKE_STOPWORDS
) -> DataFrame:
    """Top-k RAKE keyword phrases per document:
    (doc_id, phrase, score_u, rank). Word score = deg(w)/freq(w) in
    integer micro-units — deg(w) = sum of the lengths of the phrases
    each occurrence of w sits in (co-occurrence degree, favoring words
    that live in long phrases), freq(w) = occurrence count — and a
    phrase scores the sum of its member-occurrence word scores. Both
    statistics are per-document (RAKE is a single-document method: no
    corpus-global state, so the operator scales embarrassingly).

    Determinism: deg and freq are exact integers; the single division
    rounds to integer micro-units immediately (true-value halves are
    representable, so round-half-away agrees across engines — the
    textrank discipline); phrase scores are then exact integer sums,
    ranked (score desc, phrase asc)."""
    rows = rake_phrases(docs, tokens, stopwords=stopwords)
    wstat = rows.groupBy("doc_id", "tok").agg(
        F.sum("plen").cast("long").alias("deg"),
        F.count("*").cast("long").alias("freq"),
    )
    ws_u = F.round(F.lit(float(MICRO)) * F.col("deg") / F.col("freq"), 0).cast("long")
    scored = rows.join(wstat.withColumn("ws_u", ws_u), ["doc_id", "tok"])
    phr = scored.groupBy("doc_id", "pid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.sum("ws_u").cast("long").alias("score_u"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_u").desc(), F.col("phrase").asc()
    )
    return (
        phr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "phrase", "score_u", F.col("rank").cast("long").alias("rank"))
    )
