"""TextRank extractive summarization (Mihalcea & Tarau, EMNLP'04).

Per document: split into sentences, build the sentence-similarity
graph (edge weight = number of DISTINCT shared tokens), run a fixed
number of damped PageRank power iterations over it, and keep the
top-k sentences as the extractive summary. The whole computation is
relational — no Python in the hot path, no driver-side loops over
documents — so it distributes like any other keyed aggregation.

Determinism convention — stricter than the catalog's DSIR 6dp
discipline, because a damped iteration multiplies by 0.85 twice and
6dp-rounded intermediates land on half-ties: scores are carried as
EXACT INTEGERS in micro-units throughout (stored in doubles, all
values « 2^53, so every addition is exact and order-independent).
Per iteration the only inexact operations are (a) one IEEE division
per edge term, rounded to the nearest integer immediately, and (b)
one multiply by the damping constant per node, also rounded
immediately — both are single deterministic double ops on identical
operands in any engine, and a true-value half (X.5) is exactly
representable, so round-half-away agrees everywhere. Both engines
(Spark / DuckDB oracle) therefore produce identical BIGINTs.
Ranking ties break on sentence index (earlier wins), so the selected
summary is unique.

Scale shape (10^12 docs):
- the graph is doc-local: every join key below CONTAINS doc_id, so
  work per document is bounded by (sentences/doc)^2 — the algorithm's
  inherent cost — and nothing global is materialized;
- token fan-out in the edge join is bounded by sentences-per-doc (a
  token links at most S sentences within one doc), never corpus-wide:
  the join key is (doc_id, token);
- each power iteration is one equi-join + one partial-aggregated
  groupBy on keys prefixed by doc_id; iterations are UNROLLED (k is a
  small constant), so the plan is a straight-line DAG with no driver
  round-trips;
- top-k per doc is a bounded Window(doc_id) rank, the same shape as
  q35's domain_cap phase 2.

Reference tie: pmOCR has no corpus-level NLP (pmocr.sh converts one
file at a time); summarization belongs to the corpus-curation layer
this engine adds (SURVEY §2.7), next to the tf-idf keyword arm
(q44 part='tfidf').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: damping factor d from the PageRank formulation TextRank inherits.
DAMPING = 0.85
#: fixed power-iteration count. Two iterations already separate hub
#: sentences from peripheral ones on sentence graphs (tens of nodes);
#: the count is a constant so the oracle can restate each iteration.
DEFAULT_ITERS = 2
#: summary size.
DEFAULT_K = 2


def sentence_nodes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, sidx, sentence, toks): sentences by the engine's
    splitter (functions.split_sentences — split after terminal
    [.!?]+ runs), indexed by ORIGINAL split position so indexes are
    stable under any later filtering; toks = the sentence's DISTINCT
    lowercase words with terminal punctuation stripped (the node's
    feature set). Blank sentences are dropped."""
    from pmocr_spark.functions import split_sentences

    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.trim(F.regexp_replace("sentence", r"[.!?]+", " "))), r"\s+"),
            lambda x: x != "",
        )
    )
    return (
        docs.select(id_col, F.posexplode(split_sentences(F.col(text_col))).alias("sidx", "sentence"))
        .filter(F.trim("sentence") != "")
        .select(id_col, F.col("sidx").cast("long").alias("sidx"), "sentence", toks.alias("toks"))
    )


def sentence_rank(
    docs: DataFrame,
    iters: int = DEFAULT_ITERS,
    damping: float = DAMPING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, sidx, sentence, score_u): damped PageRank scores over
    the per-document sentence-similarity graph after `iters` unrolled
    power iterations, in integer micro-units.

    score_i <- round((1-d)*1e6 + d * sum_j round(w_ij * score_j / W_j))
    with w_ij = |distinct shared tokens| (integer), W_j = total edge
    weight incident to j, scores initialized to 1e6 (i.e. 1.0 in
    micro-units) and kept integer-valued after every step. Isolated
    sentences converge to (1-d) immediately."""
    nodes = sentence_nodes(docs, id_col=id_col, text_col=text_col).cache()

    st = nodes.select(id_col, "sidx", F.explode("toks").alias("tok"))
    a, b = st.alias("a"), st.alias("b")
    e = (
        a.join(
            b,
            (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.sidx") < F.col("b.sidx")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias(id_col),
            F.col("a.sidx").alias("sa"),
            F.col("b.sidx").alias("sb"),
        )
        .agg(F.count("*").alias("w"))
    )
    # undirected graph as a symmetric directed edge list (src -> dst);
    # W_j (the src-side normalizer) then falls out of one groupBy
    sym = e.select(id_col, F.col("sa").alias("dst"), F.col("sb").alias("src"), "w").unionByName(
        e.select(id_col, F.col("sb").alias("dst"), F.col("sa").alias("src"), "w")
    )
    wj = sym.groupBy(id_col, "src").agg(F.sum("w").cast("double").alias("wj"))
    edges = sym.join(wj, [id_col, "src"]).cache()

    # scores are exact integers (micro-units) carried in doubles: sums
    # are then exact and order-independent, and the two inexact ops per
    # step (the edge division, the damping multiply) round immediately
    # on identical operands — see the module docstring
    base_u = float(round((1.0 - damping) * 1000000))
    s = nodes.select(id_col, "sidx", F.lit(1000000.0).alias("s"))
    for _ in range(iters):
        contrib = (
            edges.join(
                s.select(id_col, F.col("sidx").alias("src"), "s"), [id_col, "src"]
            )
            .groupBy(id_col, F.col("dst").alias("sidx"))
            .agg(F.sum(F.round(F.col("w") * F.col("s") / F.col("wj"), 0)).alias("c"))
        )
        s = (
            nodes.select(id_col, "sidx")
            .join(contrib, [id_col, "sidx"], "left")
            .select(
                id_col,
                "sidx",
                F.round(
                    F.lit(base_u) + F.lit(damping) * F.coalesce("c", F.lit(0.0)), 0
                ).alias("s"),
            )
        )
    out = nodes.select(id_col, "sidx", "sentence").join(s, [id_col, "sidx"]).select(
        id_col,
        "sidx",
        "sentence",
        F.col("s").cast("long").alias("score_u"),
    )
    # round-6 ADVICE fix: nodes/edges were cached but never unpersisted,
    # so a long-lived session (CLI --service, the 50-query gate run)
    # accumulated cached partitions per invocation. Materialize the
    # (per-doc-sized) result once, then release both scoped caches —
    # the iter_checkpoint discipline every other iterative operator uses.
    from .graph import iter_checkpoint

    pre = out  # pre-materialization lineage, kept for plan-shape tests
    out = iter_checkpoint(out)
    # the checkpoint truncates the plan, so downstream family pins no
    # longer see this arm's joins; tests pin the REAL plan through this
    # seam instead (ADVICE r6: the q44 family budget was loosened to
    # admit this arm — now it is pinned separately and the family
    # budget re-tightened)
    out._textrank_pre_checkpoint = pre
    nodes.unpersist()
    edges.unpersist()
    return out


def top_sentences(
    docs: DataFrame,
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
    damping: float = DAMPING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, rank, sidx, sentence, score_u): the extractive summary —
    top-k sentences per document by (score desc, sidx asc). Ranking
    compares the INTEGER micro-unit score, so order is float-free and
    engine-portable."""
    scored = sentence_rank(docs, iters=iters, damping=damping, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(F.col("score_u").desc(), F.col("sidx").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("long").alias("rank"), "sidx", "sentence", "score_u")
    )
