"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD'03 — the MOSS local-fingerprinting algorithm). From each
document's k-gram hash stream, keep the MINIMUM hash of every sliding
window of w consecutive k-grams (rightmost position on ties), then
dedupe the selections. The guarantee that makes this the standard
plagiarism / partial-overlap detector: any substring match of at least
w + k - 1 tokens between two documents is caught by at least one
SHARED selected fingerprint, while storing only ~2/(w+1) of the k-gram
stream — a density/guarantee trade-off exact substring dedup
(operators/substring_dedup.py, which keeps EVERY gram) does not offer.
q26 carries both arms: the order-sensitive whole-doc rolling hash
(part='rolling') and this local scheme (part='winnow').

Scale shape:
- k-grams with positions: the shuffle-free arrays_zip construction
  (one row per doc in, posexplode out — no Window needed to pair
  neighbors, same as dedup_index.ngram_rows);
- window minimum: ONE Window(doc_id, pos) pass with a ROWS frame of
  [0, w-1] computing min(struct(hash, -pos)) — the struct min gives
  "smallest hash, rightmost position" lexicographically, so winner
  selection is a single sorted scan per doc partition (one Exchange
  on doc_id, no w-times fan-out join);
- dedupe: distinct on (doc_id, pos, fp) — selected rows are a ~2/(w+1)
  fraction of the grams, and the partial-aggregate (map-side) form of
  distinct absorbs the per-window repeats of one winner before the
  shuffle, so the second Exchange moves only the fingerprint set.

At 10^12 docs both Exchanges are corpus-sized but minimal: winnowing
is embarrassingly doc-local, and matching fingerprints across docs is
then an equi-join on fp (the MOSS index), never doc x doc.

Reference tie: pmOCR converts one file at a time and keeps no
cross-file state (pmocr.sh:2160-2183); fingerprint indexes are part of
the corpus-curation layer this engine adds (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: gram width in words; window size in grams. Any shared run of
#: DEFAULT_K + DEFAULT_W - 1 = 8 words is guaranteed a shared
#: fingerprint (the SIGMOD'03 (k, t) guarantee with t = k + w - 1).
DEFAULT_K = 4
DEFAULT_W = 5


def kgram_hashes(
    docs: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pos, fp): position-indexed word k-gram hashes.

    fp = first 7 md5 hex digits of the space-joined lowercase gram as
    a BIGINT (the catalog's portable-hash convention, q26/q18). The
    arrays_zip self-shift keeps construction shuffle-free: all tokens
    of a doc live in its one input row."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(F.col("w"))
    fields = [F.col("w").alias("t0")] + [
        F.slice("w", j + 1, F.greatest(n - j, F.lit(0))).alias(f"t{j}")
        for j in range(1, k)
    ]
    gram = F.concat_ws(" ", *[f"s.t{j}" for j in range(k)])
    return (
        docs.select(F.col(id_col).alias(id_col), toks.alias("w"))
        .select(id_col, F.posexplode(F.arrays_zip(*fields)).alias("pos", "s"))
        .filter(F.col(f"s.t{k - 1}").isNotNull())
        .select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            F.conv(F.substring(F.md5(gram.cast("binary")), 1, 7), 16, 10)
            .cast("long")
            .alias("fp"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Selected winnowing fingerprints: (id_col, pos, fp), pos = 0-based
    word offset of the selected k-gram. Each complete window of w
    consecutive k-grams contributes its minimum-hash gram (rightmost on
    hash ties — the SIGMOD'03 rule, which maximizes the chance the same
    gram wins adjacent windows and keeps density near 2/(w+1));
    selections are then distinct per document. Docs with fewer than
    k + w - 1 words yield no complete window and no fingerprints."""
    kg = kgram_hashes(docs, k=k, id_col=id_col, text_col=text_col)
    win = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    winner = F.min(F.struct(F.col("fp").alias("h"), (-F.col("pos")).alias("np"))).over(win)
    full = F.count("*").over(win) == w
    return (
        kg.select(id_col, winner.alias("sel"), full.alias("full"))
        .filter("full")
        .select(
            id_col,
            (-F.col("sel.np")).cast("long").alias("pos"),
            F.col("sel.h").alias("fp"),
        )
        .distinct()
    )


def shared_fingerprint_pairs(
    fps: DataFrame, id_col: str = "doc_id", min_shared: int = 2
) -> DataFrame:
    """MOSS-style match candidates: document pairs ranked by the number
    of DISTINCT shared selected fingerprints — an equi-join on fp (the
    inverted fingerprint index), never doc x doc. Returns
    (doc_a, doc_b, n_shared) with doc_a < doc_b. Positions are dropped
    before the self-join so a fingerprint repeated INSIDE one doc
    cannot multiply the pair count (set semantics, like q17's
    shingles)."""
    s = fps.select(id_col, "fp").distinct()
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
