"""q46 part='cdc' (content-defined chunking) and q41 yule_k_micro
(Yule's K lexical diversity): structural properties beyond the oracle
hash — coverage, shift-resistance, and the hand formula."""

import pytest
from pyspark.sql import functions as F

from pmocr_spark.queries import QUERY_FNS


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# 40 deterministic pseudo-words — long enough for ~5 CDC chunks at
# MOD=8 expected length
_TOKS = [f"w{(i * 7) % 23}x{i % 5}" for i in range(40)]


def test_cdc_chunks_cover_document_in_order(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, " ".join(_TOKS)), (2, "a b")])
    cdc = (
        QUERY_FNS["q46_pack_sequences"](spark, sf)
        .filter("part = 'cdc'")
        .collect()
    )
    by_doc = {}
    for r in cdc:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # bins are consecutive from 0, offsets equal the running length sum
    # (chunks tile the document exactly, in order)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in rows] == list(range(len(rows)))
        off = 0
        for r in rows:
            assert r["cum_before"] == off
            off += r["n_tokens"]
    assert sum(r["n_tokens"] for r in by_doc[1]) == len(_TOKS)
    # a doc shorter than the gram width is a single whole-doc chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2


def test_cdc_resynchronizes_after_insertion(spark, tmp_path):
    """The CDC property fixed-width chunking lacks: prepending one
    token shifts every fixed-width frame but only the chunks BEFORE
    the first post-insertion boundary differ under CDC — the key sets
    re-converge."""
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(_TOKS)), (2, " ".join(["inserted"] + _TOKS))],
    )
    out = QUERY_FNS["q46_pack_sequences"](spark, sf)
    keys = {
        part: {
            d: {r["key"] for r in rows}
            for d, rows in _group(out.filter(out.part == part).collect()).items()
        }
        for part in ("cdc", "chunk")
    }
    cdc_shared = keys["cdc"][1] & keys["cdc"][2]
    fixed_shared = keys["chunk"][1] & keys["chunk"][2]
    # CDC re-syncs (most chunks shared); fixed-width frames all shift
    assert len(cdc_shared) >= 2
    assert len(cdc_shared) > len(fixed_shared)


def _group(rows):
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    return by_doc


def test_yule_k_hand_formula(spark, tmp_path):
    # doc 1: counts {a:3, b:1} -> N=4, S2=10,
    # K_micro = round(1e10 * (10-4) / 16) = 3_750_000_000
    # doc 2: all distinct -> S2=N -> K=0
    sf = _write_docs(spark, tmp_path, [(1, "a a a b"), (2, "p q r s t")])
    got = {
        r["doc_id"]: r["yule_k_micro"]
        for r in QUERY_FNS["q41_repetition_quality"](spark, sf).collect()
    }
    assert got == {1: 3_750_000_000, 2: 0}


def test_char_entropy_known_values(spark, tmp_path):
    """q24 char_entropy_micro: hand-computable distributions — a
    uniform 2-symbol text gives ln(2) micro-nats (minus div-floor), a
    1-symbol run gives 0, and natural text lands in the 2.5-4.5 nat
    band."""
    import math

    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    rows = [
        (1, "ababababababab"),  # p(a)=p(b)=0.5 -> H = ln 2
        (2, "aaaaaaaaaaaaaa"),  # H = 0
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("src0")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.char_entropy_micro
        for r in QUERY_FNS["q24_quality_score"](spark, str(tmp_path)).collect()
    }
    # n=14, Σ cnt·ln(cnt) term-rounds then //14: within 2 micro of ln 2
    assert abs(got[1] - round(1e6 * math.log(2))) <= 2
    assert got[2] == 0
    assert 2_500_000 < got[3] < 4_500_000


def test_novel_trigram_frac_known_values(spark, tmp_path):
    """q24 novel_trigram_frac: an exact-duplicate pair scores 0 (every
    shingle shared), a unique doc scores 1, a short doc is NULL."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "completely novel words appearing nowhere else at all"),
        (4, "too short"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("src0")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.novel_trigram_frac
        for r in QUERY_FNS["q24_quality_score"](spark, str(tmp_path)).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[3] == 1.0
    assert got[4] is None
