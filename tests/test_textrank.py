"""TextRank extractive summarization (operators/textrank.py):
pure-python reference equality, the isolated-sentence fixed point,
integer tie-breaks, summary-size selection, and plan-shape pins."""

import math
import re

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators.textrank import (
    DAMPING,
    sentence_nodes,
    sentence_rank,
    top_sentences,
)
from pmocr_spark.plans import shape


def _r(x: float) -> float:
    """round-half-away-from-zero for positive doubles (what both Spark
    and DuckDB round() do; python's round() is banker's)."""
    return math.floor(x + 0.5)


def ref_textrank(text: str, iters: int = 2, d: float = DAMPING) -> dict[int, int]:
    """Independent pure-python TextRank with the operator's integer
    micro-unit arithmetic. Returns {sidx: score_u}."""
    sents = re.split(r"(?<=[.!?])\s+", text)
    nodes = [(i, s) for i, s in enumerate(sents) if s.strip()]
    toks = {
        i: {t for t in re.split(r"\s+", re.sub(r"[.!?]+", " ", s.strip().lower())) if t}
        for i, s in nodes
    }
    ids = [i for i, _ in nodes]
    sym: dict[int, dict[int, int]] = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            ov = len(toks[i] & toks[j])
            if ov:
                sym.setdefault(i, {})[j] = ov
                sym.setdefault(j, {})[i] = ov
    wj = {i: float(sum(nb.values())) for i, nb in sym.items()}
    s = {i: 1000000.0 for i in ids}
    for _ in range(iters):
        s = {
            i: _r(150000.0 + d * sum(_r(w * s[j] / wj[j]) for j, w in sym.get(i, {}).items()))
            for i in ids
        }
    return {i: int(s[i]) for i in ids}


DOCS = [
    (1, "the cat sat on the mat. the dog sat on the mat! a bird flew over the mat? "
        "quantum flux capacitors hum. the cat and the dog met the bird."),
    (2, "alpha beta gamma."),
    (3, "spark shuffles data between stages. catalyst optimizes the logical plan! "
        "spark caches hot data in memory? the optimizer prunes unused columns."),
    (4, "one two three four. one two three four! one two three four? five six seven."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_pure_python_reference(spark, docs):
    got = {
        (r["doc_id"], r["sidx"]): r["score_u"]
        for r in sentence_rank(docs).collect()
    }
    want = {
        (doc_id, sidx): su
        for doc_id, text in DOCS
        for sidx, su in ref_textrank(text).items()
    }
    assert got == want


def test_isolated_sentence_scores_one_minus_d(spark, docs):
    rows = {r["sidx"]: r for r in sentence_rank(docs).filter("doc_id = 1").collect()}
    # 'quantum flux capacitors hum.' shares no token with any other
    # sentence: after one iteration its score is exactly (1-d) and it
    # stays there
    assert rows[3]["score_u"] == 150000
    # the single-sentence doc is all-isolated too
    solo = sentence_rank(docs).filter("doc_id = 2").collect()
    assert [r["score_u"] for r in solo] == [150000]


def test_top1_is_reference_argmax(spark, docs):
    # the 1-sentence summary is the reference's argmax (score desc,
    # sidx asc) for every doc — selection, not just scoring, matches
    tops = {
        r["doc_id"]: r["sidx"]
        for r in top_sentences(docs, k=1).collect()
    }
    for doc_id, text in DOCS:
        ref = ref_textrank(text)
        want = min(ref, key=lambda i: (-ref[i], i))
        assert tops[doc_id] == want, (doc_id, ref)
    # and the strongest-edge pair of doc 1 (cat/dog sentences, 4 shared
    # tokens) dominates its isolated sentence by construction
    r1 = ref_textrank(DOCS[0][1])
    assert min(r1[0], r1[1]) > r1[3] == 150000


def test_tie_breaks_on_earlier_sentence(spark, docs):
    # doc 4: three identical sentences (same token set {one,two,three,
    # four}) tie exactly; earlier sidx must rank first
    got = [
        (r["rank"], r["sidx"])
        for r in top_sentences(docs, k=3).filter("doc_id = 4")
        .orderBy("rank").collect()
    ]
    scores = {r["sidx"]: r["score_u"] for r in sentence_rank(docs).filter("doc_id = 4").collect()}
    assert scores[0] == scores[1] == scores[2]
    assert got == [(1, 0), (2, 1), (3, 2)]


def test_k_bounds_summary(spark, docs):
    counts = {
        r["doc_id"]: r["n"]
        for r in top_sentences(docs, k=2).groupBy("doc_id")
        .agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 2, 2: 1, 3: 2, 4: 2}


def test_nodes_tokenization_strips_punctuation(spark, docs):
    n = sentence_nodes(docs).filter("doc_id = 2").collect()[0]
    assert n["toks"] == ["alpha", "beta", "gamma"]
    assert n["sidx"] == 0


def test_plan_no_cartesian_no_python(spark, docs):
    df = top_sentences(docs, k=2)
    plan = shape.formatted_plan(df)
    assert not shape.has_cartesian(df), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
