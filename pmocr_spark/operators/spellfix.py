"""SymSpell-style dictionary correction for OCR'd text (Garbe's
symmetric-delete algorithm, the standard post-OCR spell pass).

OCR engines emit near-words ("recognltion") that exact dedup, n-gram
LMs and contamination checks all treat as distinct tokens; the classic
fix is dictionary correction against the corpus's OWN vocabulary. The
naive form is quadratic (every rare word x every dictionary word); the
symmetric-delete trick makes it a bounded equi-join: two words are
candidates iff their single-character-DELETION variant sets intersect
(covers edit distance <= 1 — insertion, deletion, substitution — plus
a small documented slice of distance-2 pairs where one deletion on
each side meets in the middle).

100 TB shape: the variant explode is a pure map over the DISTINCT-WORD
frequency table (Heaps-law bounded, NOT corpus-sized); the dictionary
side (frequent words) is vocabulary-bounded and BROADCASTS, so the
join never shuffles the corpus and per-variant fan-out is alphabet-
bounded. One keyed window picks the argmax candidate. The reference
has no analog (pmOCR trusts the engine's output verbatim,
pmocr.sh:1923-1963); this is the curation step downstream corpora run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: correction targets: rare (likely-error) words of bounded length —
#: the length bounds keep the variant fan-out per word <= max_len + 1
TARGET_MAX_FREQ = 2
MIN_LEN, MAX_LEN = 4, 12
#: dictionary: words frequent enough to be trusted spellings; length
#: window widened by 1 on each side so every ED<=1 pair is reachable
DICT_MIN_FREQ = 8

_VARIANTS = (
    "array_distinct(array_append("
    "  transform(sequence(1, length(word)),"
    "            i -> concat(substring(word, 1, i - 1),"
    "                        substring(word, i + 1, length(word)))),"
    "  word))"
)


def corrupt_trusted(wfd: DataFrame, min_freq: int = 8, min_len: int = 5) -> DataFrame:
    """Deterministic vocabulary-corruption scaffold shared by the q44
    part='spell' gate arm and the 10x bench checkpoint: every trusted
    word (freq >= min_freq, length >= min_len) loses its md5-chosen
    character and re-enters the vocabulary as a freq-1 near-word
    (merged by a word-keyed re-agg with the original table). The same
    arithmetic is restated in q44's DuckDB oracle — change it in BOTH
    places or the gate hash-mismatches."""
    corrupted = (
        wfd.filter((F.col("freq") >= min_freq) & (F.length("word") >= min_len))
        .withColumn(
            "p",
            (
                F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
                % F.length("word")
                + 1
            ).cast("int"),
        )
        .select(
            F.expr(
                "concat(substring(word, 1, p - 1),"
                "       substring(word, p + 1, length(word)))"
            ).alias("word"),
            F.lit(1).cast("long").alias("freq"),
        )
    )
    return (
        wfd.select("word", F.col("freq").cast("long").alias("freq"))
        .unionAll(corrupted)
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )


def deletion_variants(words: DataFrame) -> DataFrame:
    """Explode each (word, freq) row into its symmetric-delete variant
    set: the word itself plus every single-character deletion
    (duplicates from repeated letters collapsed). Pure map — no
    shuffle; output size <= (max word length + 1) x input rows."""
    return words.select(
        "word", "freq", F.expr(f"explode({_VARIANTS})").alias("variant")
    )


def spell_corrections(
    wfd: DataFrame,
    target_max_freq: int = TARGET_MAX_FREQ,
    dict_min_freq: int = DICT_MIN_FREQ,
    min_len: int = MIN_LEN,
    max_len: int = MAX_LEN,
    broadcast_dict: bool = True,
) -> DataFrame:
    """(wrong, corrected, freq) for every rare word with a trusted
    deletion-variant neighbour.

    wfd: the (word, freq) distinct-word table. Targets are words with
    freq <= target_max_freq and min_len <= length <= max_len;
    dictionary words have freq >= dict_min_freq and length within
    [min_len - 1, max_len + 1]. The correction is the dictionary
    candidate with the highest frequency (ties: lexicographically
    smallest), chosen by one row_number window keyed on the wrong word.

    broadcast_dict: the dictionary-variant side is vocabulary-bounded
    (Heaps law) — broadcast by default so the target side never
    shuffles for the join; pass False past the broadcast budget (both
    sides then hash-partition on the variant key).
    """
    targets = wfd.filter(
        (F.col("freq") <= target_max_freq)
        & F.length("word").between(min_len, max_len)
    )
    trusted = wfd.filter(
        (F.col("freq") >= dict_min_freq)
        & F.length("word").between(min_len - 1, max_len + 1)
    )
    tv = deletion_variants(targets).select("word", "variant")
    dv = deletion_variants(trusted).withColumnRenamed("word", "cand")
    if broadcast_dict:
        dv = F.broadcast(dv)
    cand = (
        tv.join(dv, "variant")
        .filter(F.col("word") != F.col("cand"))
        .select("word", "cand", "freq")
        .distinct()  # several variants may witness the same pair
    )
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy(
        F.col("freq").desc(), F.col("cand").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("word").alias("wrong"),
            F.col("cand").alias("corrected"),
            "freq",
        )
    )


def reference_corrections(
    word_freqs: dict[str, int],
    target_max_freq: int = TARGET_MAX_FREQ,
    dict_min_freq: int = DICT_MIN_FREQ,
    min_len: int = MIN_LEN,
    max_len: int = MAX_LEN,
) -> dict[str, tuple[str, int]]:
    """Pure-python twin of spell_corrections for exact-equality tests."""

    def variants(w: str) -> set[str]:
        return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}

    targets = {
        w: f
        for w, f in word_freqs.items()
        if f <= target_max_freq and min_len <= len(w) <= max_len
    }
    trusted = {
        w: f
        for w, f in word_freqs.items()
        if f >= dict_min_freq and min_len - 1 <= len(w) <= max_len + 1
    }
    tvar = {w: variants(w) for w in targets}
    dvar = {w: variants(w) for w in trusted}
    out: dict[str, tuple[str, int]] = {}
    for w, vs in tvar.items():
        cands = [
            (c, f)
            for c, f in trusted.items()
            if c != w and vs & dvar[c]
        ]
        if cands:
            out[w] = min(cands, key=lambda cf: (-cf[1], cf[0]))
    return out
