"""Approximate-algorithm scale paths vs exact results (tolerance-gated;
no cross-engine oracle because approx internals differ by engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
        F.countDistinct("user_id").alias("e"),
    ).collect()[0]
    assert abs(got["a"] - got["e"]) <= max(3, 0.05 * got["e"])


def test_percentile_approx(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("a"),
        F.percentile("value", F.lit(0.5)).alias("e"),
    ).collect()[0]
    assert abs(got["a"] - got["e"]) <= 0.02 * abs(got["e"]) + 0.5


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH candidates (q18) must contain every high-similarity pair the
    exact pairwise jaccard (q17) finds — banding trades precision, not
    high-sim recall."""
    from pmocr_spark.queries import QUERY_FNS

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERY_FNS["q17_ngram_jaccard"](spark, SF).collect()
        if r["jaccard"] >= 0.4
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in QUERY_FNS["q18_minhash_lsh"](spark, SF).collect()
    }
    missed = exact - cand
    assert not missed, f"LSH missed high-sim pairs: {missed}"
