"""Posting-list compression: block-partitioned delta gaps + LEB128
varints (the Lucene/roaring family of inverted-index layouts, e.g.
Zobel & Moffat, "Inverted files for text search engines", ACM CSUR'06).

The persisted text index (operators/bm25.write_text_index) stores
postings as plain (term, doc_id) parquet rows; at 10^12 documents the
doc_id column IS the index's dominant byte cost. Delta-gap + varint
coding is the standard fix: sorted doc ids become small gaps, small
gaps become 1-2 byte varints (parquet's own bit-packing cannot see the
per-TERM sortedness because rows from many terms interleave).

Scale shape — why BLOCK-partitioned deltas and not one chain per term:
a per-term Window(ORDER BY doc_id) puts every posting of a hot term
(a stopword: appears in most of the corpus) into ONE task — the
classic inverted-index skew. Instead the doc-id space is cut into
fixed 2^BLOCK_BITS ranges and gaps are relative WITHIN (term, block):

    gap_i = doc_id_i - prev,   prev = block·2^B - 1 for the block's
                               first posting, else the previous doc_id

so every window partition is bounded by the block width (<= 65536
rows) by CONSTRUCTION, any block decodes independently of all others
(seekable; append-only growth never rewrites old blocks), and the
worst-case compression loss vs a full per-term chain is one
absolute-sized gap per block. This is the same bounded-partition
discipline as the dedup index's banded buckets.

Arithmetic (gap derivation, varint byte LENGTH) is pure JVM — the
q47 part='postings' gate arm verifies it end-to-end against a DuckDB
restatement. Byte ENCODING/decoding are vectorized Arrow passes over
the bounded per-(term, block) gap arrays; encode∘decode = identity is
pytest-pinned (tests/test_postings.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: doc-id range width per block: 2^16 ids -> window partitions are
#: bounded at 65536 rows regardless of term hotness.
BLOCK_BITS = 16


def varint_len(gap: Column) -> Column:
    """LEB128 encoded byte length of a non-negative gap: one byte per
    started 7-bit group. Pure expression (no UDF) so the compressed
    SIZE of an index is computable JVM-side without materializing a
    single encoded byte — the capacity-planning query."""
    c = F.lit(1)
    for k in range(1, 9):
        c = F.when(gap >= F.lit(1 << (7 * k)), F.lit(k + 1)).otherwise(c)
    return c


def posting_gaps(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, block, doc_id, gap): distinct postings with block-relative
    delta gaps. Same tokenizer as every corpus statistic (lower + \\s+).
    gap >= 1 always: doc ids are distinct within a term and the block
    base is one below the block's smallest admissible id."""
    posts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .distinct()
    )
    posts = posts.withColumn(
        "block", F.shiftright(F.col("doc_id"), BLOCK_BITS).cast("long")
    )
    w = W.partitionBy("term", "block").orderBy("doc_id")
    prev = F.coalesce(
        F.lag("doc_id").over(w),
        (F.col("block") * F.lit(1 << BLOCK_BITS) - F.lit(1)).cast("long"),
    )
    return posts.withColumn("gap", (F.col("doc_id") - prev).cast("long"))


def compressed_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, n_postings, n_bytes): exact LEB128-compressed payload size
    per term — gap arithmetic + varint_len + ONE map-side-combinable
    agg; never builds the byte payloads. The gate-verified arithmetic
    (q47 part='postings')."""
    g = posting_gaps(docs, text_col=text_col)
    return g.groupBy("term").agg(
        F.count("*").alias("n_postings"),
        F.sum(varint_len(F.col("gap"))).cast("long").alias("n_bytes"),
    )


def _encode_leb128(gaps) -> bytes:
    out = bytearray()
    for g in gaps:
        g = int(g)
        while True:
            b = g & 0x7F
            g >>= 7
            if g:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def _decode_leb128(payload: bytes) -> list[int]:
    vals, cur, shift = [], 0, 0
    for b in payload:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            vals.append(cur)
            cur, shift = 0, 0
    return vals


def encode_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, block, n_postings, payload): the physical compressed
    index rows. Gap arrays are assembled per bounded (term, block)
    group (sort_array over a <= 2^BLOCK_BITS-element list — bounded by
    construction, the documented collect discipline), then one
    Arrow-batched pass packs LEB128 bytes."""
    g = posting_gaps(docs, text_col=text_col)
    grouped = g.groupBy("term", "block").agg(
        F.count("*").alias("n_postings"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("doc_id", "gap"))),
            lambda s: s["gap"],
        ).alias("gaps"),
    )

    @F.pandas_udf(T.BinaryType())
    def pack(gaps):
        import pandas as pd

        return pd.Series([_encode_leb128(a) for a in gaps], dtype=object)

    return grouped.select("term", "block", "n_postings", pack("gaps").alias("payload"))


def decode_postings(index: DataFrame) -> DataFrame:
    """(term, doc_id) back from (term, block, payload): one Arrow pass
    unpacks each block's varints and rebuilds absolute ids from the
    block base (blocks decode independently — the seekability the
    block scheme buys)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def unpack(block, payload):
        import pandas as pd

        out = []
        for blk, pay in zip(block, payload):
            prev = (int(blk) << BLOCK_BITS) - 1
            ids = []
            for gap in _decode_leb128(bytes(pay)):
                prev += gap
                ids.append(prev)
            out.append(ids)
        return pd.Series(out, dtype=object)

    return index.select(
        "term", F.explode(unpack("block", "payload")).alias("doc_id")
    )
