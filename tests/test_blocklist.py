"""Domain-blocklist filter (operators/blocklist.py): suffix-chain
semantics, literal vs broadcast-join regime parity, category
provenance, and the broadcast plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pmocr_spark.operators.blocklist import (
    blocklist_filter,
    blocklist_verdict_lit,
    host_suffixes,
)
from pmocr_spark.plans import shape

_HOSTS = [
    (0, "ads.b.example.com"),
    (1, "example.com"),
    (2, "EXAMPLE.COM"),  # case-normalized
    (3, "safe.org"),
    (4, "com"),  # single label
    (5, "sub.tracker.net"),
    (6, "deep.sub.tracker.net"),
    (7, "nottracker.net"),  # suffix match is label-aligned, not substring
]
_BLOCKED = [("example.com", "ads"), ("tracker.net", "tracking")]


def _df(spark):
    return spark.createDataFrame(_HOSTS, "doc_id long, host string")


def test_host_suffixes(spark):
    rows = {
        r["doc_id"]: r["sfx"]
        for r in _df(spark).select(
            "doc_id", host_suffixes(F.col("host")).alias("sfx")
        ).collect()
    }
    assert rows[0] == ["ads.b.example.com", "b.example.com", "example.com", "com"]
    assert rows[2] == ["example.com", "com"]  # lowercased
    assert rows[4] == ["com"]
    assert rows[7] == ["nottracker.net", "net"]


def test_literal_and_join_regimes_agree(spark):
    df = _df(spark)
    lit = {
        r["doc_id"]: r["n_b"]
        for r in df.select(
            "doc_id",
            blocklist_verdict_lit(
                F.col("host"), [d for d, _ in _BLOCKED]
            ).alias("n_b"),
        ).collect()
    }
    bl = spark.createDataFrame(_BLOCKED, "domain string, category string")
    joined = blocklist_filter(df, "host", bl)
    join = {r["doc_id"]: r["n_blocked"] for r in joined.collect()}
    assert lit == join
    # suffix semantics, label-aligned: 0-2 and 5-6 blocked; 3, 4, 7 clean
    assert lit == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 1, 6: 1, 7: 0}
    cats = {r["doc_id"]: (list(r["categories"]), r["keep"]) for r in joined.collect()}
    assert cats[0] == (["ads"], 0)
    assert cats[6] == (["tracking"], 0)
    assert cats[3] == ([], 1)


def test_join_regime_plan(spark):
    """The 4M-entry UT1 regime: blocklist broadcast (never shuffled),
    no cartesian, explode bounded by label count."""
    bl = spark.createDataFrame(_BLOCKED, "domain string, category string")
    out = blocklist_filter(_df(spark), "host", bl)
    plan = shape.formatted_plan(out)
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) == 1, plan
    assert not shape.has_cartesian(out), plan
    assert "SortMergeJoin" not in plan, plan


def test_q40_badwords_classes(spark):
    """Lexicon page-drop arm: keep==1 rows are match-free, matched sets
    never contain the absent lexicon word, occurrence count >= distinct
    matched count."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    rows = (
        QUERY_FNS["q40_pii_redact"](spark, "/root/testdata/sf0.001")
        .filter(F.col("part") == "badwords")
        .collect()
    )
    assert rows and any(r.keep == 1 for r in rows) and any(r.keep == 0 for r in rows)
    for r in rows:
        matched = [w for w in r.out_text.split(",") if w]
        if r.keep == 1:
            assert r.n_a == 0 and matched == []
        else:
            assert r.n_a >= len(matched) >= 1
        assert "leak" not in matched


def test_q40_homoglyph_fold_restores_original(spark):
    """Homoglyph arm: scaffolded confusables are detected (n_a > 0) and
    the fold restores the ORIGINAL ascii text byte-for-byte; clean docs
    pass through keep=1 with n_a == 0."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS, _t

    sf = "/root/testdata/sf0.001"
    orig = {
        r.doc_id: r.text for r in _t(spark, sf, "documents").collect()
    }
    rows = (
        QUERY_FNS["q40_pii_redact"](spark, sf)
        .filter(F.col("part") == "homoglyph")
        .collect()
    )
    assert rows and any(r.keep == 0 for r in rows) and any(r.keep == 1 for r in rows)
    for r in rows:
        assert r.out_text == orig[r.doc_id]  # fold == original, always
        if r.doc_id % 3 == 0 and "a" in orig[r.doc_id]:
            assert r.keep == 0 and r.n_a > 0
        if r.keep == 1:
            assert r.n_a == 0
