"""Exact substring (k-word-gram) deduplication across a document corpus.

Doc-level dedup (q16 exact hash, q18 MinHash) removes whole near-identical
documents; it cannot touch the other big web-corpus pathology: the SAME
long span (license boilerplate, navigation text, quoted chunks) embedded
inside otherwise-distinct documents. Training-data pipelines remove those
at substring granularity (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL'22). The exact suffix-array construction is
single-node; the standard distributed approximation — used here — is
fixed-length k-word grams: any duplicated span of >= k words is caught
(as a run of duplicated k-grams), spans shorter than k are not.

Semantics (all deterministic):
  * a k-gram is "duplicated" iff it occurs in >= 2 DISTINCT documents
    (intra-document repetition alone is q41's repetition-quality signal,
    not dedup);
  * the canonical copy — the occurrence with the smallest (doc_id, pos) —
    is exempt from removal; every other occurrence is removed;
  * a word is dropped iff it is covered by >= 1 removed occurrence
    (overlapping duplicated grams merge naturally into one removed span;
    a canonical occurrence overlapped by a removed one loses the shared
    words — same policy as the reference paper's "drop all but one");
  * remaining words are re-joined in original order.

Scale shape (the 100 TB contract):
  * one projection to word arrays, one posexplode to gram rows — O(total
    words), no doc x doc product anywhere;
  * duplicated-gram detection is min(doc_id) <> max(doc_id) per gram
    hash: a single groupBy shuffle whose partial (map-side) aggregate is
    just min/max — deliberately NOT count(distinct doc_id), which would
    need a two-phase expand;
  * occurrences re-join the dup set by gram-hash equi-join (fan-out is
    linear in occurrence count); covered-index explode amplifies only
    REMOVED occurrences by k;
  * reassembly is one groupBy(doc_id) with a per-doc collect_list bounded
    by the longest document (documents are bounded; the keeper encoding
    below assumes < 1e6 words per doc);
  * everything is built-in expressions — whole-stage codegen, no UDFs.

Reference parity: pmOCR has no substring dedup (it is a format converter);
this is part of the training-data layer the build brief adds on top
(SURVEY.md section 6). The q16_dedup_exact gate slot carries the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default gram width: proportional to the Lee et al. 50-token window at
#: the synthetic corpus's ~54-word documents; any duplicated span of >= K
#: words is removed.
DEFAULT_K = 8

#: keeper encoding packs (doc_id, pos) into one orderable BIGINT so the
#: canonical-occurrence argmin is a plain min() (map-side partial).
#: Requires pos < _POS_RANGE, i.e. documents shorter than 1e6 words.
_POS_RANGE = 1_000_000


def _occ_key(doc_id: Column, pos: Column) -> Column:
    return doc_id * F.lit(_POS_RANGE) + pos


def gram_occurrences(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, gh) rows: one per k-word gram occurrence, pos 1-based.

    Grams are built shuffle-free by zipping k shifted slices of the word
    array and posexploding once (the arrays_zip trick from the shingle
    pipeline — codegen expressions only, no window shuffle).
    """
    w = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ws"))
    shifted = [F.col("ws").alias("w0")] + [
        F.expr(f"slice(ws, {i + 1}, size(ws))").alias(f"w{i}") for i in range(1, k)
    ]
    z = w.select(
        id_col, F.posexplode(F.arrays_zip(*shifted)).alias("pos0", "g")
    ).filter(F.col(f"g.w{k - 1}").isNotNull())
    gram = F.concat_ws(" ", *[F.col(f"g.w{i}") for i in range(k)])
    return z.select(
        F.col(id_col),
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.md5(gram.cast("binary")).alias("gh"),
    )


def substring_dedup(
    docs: DataFrame, k: int = DEFAULT_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Remove cross-document duplicated >= k-word spans, keep-first policy.

    Returns one row per input document:
      (id_col, new_text, n_words, n_kept, n_removed)
    where new_text is the document with every non-canonical duplicated
    span deleted (possibly '' if the whole document was duplicated
    elsewhere's canonical copy).
    """
    w = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("ws"))
    occ = gram_occurrences(docs, k, id_col, text_col)

    # duplicated grams: present in >1 distinct doc; canonical = global
    # min (doc_id, pos). min/max partials only — no count-distinct.
    dup = (
        occ.groupBy("gh")
        .agg(
            F.min(id_col).alias("_mn"),
            F.max(id_col).alias("_mx"),
            F.min(_occ_key(F.col(id_col), F.col("pos"))).alias("keep_key"),
        )
        .filter(F.col("_mn") != F.col("_mx"))
        .select("gh", "keep_key")
    )

    rem = occ.join(dup, "gh").filter(
        _occ_key(F.col(id_col), F.col("pos")) != F.col("keep_key")
    )
    covered = rem.select(
        id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("idx")
    ).distinct()

    # single reassembly pass: words LEFT-join the covered set (match =>
    # removed), then ONE groupBy(doc) computes totals and the kept
    # reconstruction together — collect_list drops the nulled (removed)
    # structs, so no second scan or totals join is needed, and docs with
    # every word removed still surface (their group has only null marks).
    words = w.select(
        id_col, F.posexplode("ws").alias("idx0", "wd")
    ).withColumn("idx", (F.col("idx0") + 1).cast("long")).drop("idx0")
    marked = words.join(
        covered.withColumn("_rm", F.lit(True)), [id_col, "idx"], "left"
    )
    keep_struct = F.when(F.col("_rm").isNull(), F.struct("idx", "wd"))
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(keep_struct)), lambda s: s["wd"]),
        ).alias("new_text"),
        F.count("*").cast("long").alias("n_words"),
        F.count(keep_struct).cast("long").alias("n_kept"),
        (F.count("*") - F.count(keep_struct)).cast("long").alias("n_removed"),
    )
