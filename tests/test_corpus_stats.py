"""Deterministic HyperLogLog (operators/corpus_stats): register parity
with a pure-python twin, the element-wise-max merge law that makes the
sketch a valid Spark partial aggregate, and estimator accuracy against
exact distinct counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pmocr_spark.operators.corpus_stats import (
    HLL_M,
    hll_estimate,
    hll_sketch,
)


def _py_registers(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, w = h % HLL_M, h // HLL_M
        rank = 25 if w == 0 else 25 - len(bin(w)[2:])
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def _df(spark, ids, grp="g"):
    return spark.createDataFrame([(grp, i) for i in ids], "grp string, v long")


def test_registers_match_python(spark):
    ids = list(range(500))
    got = {
        r["bucket"]: r["rank"]
        for r in hll_sketch(_df(spark, ids), F.col("v"), ["grp"]).collect()
    }
    assert got == _py_registers(ids)


def test_merge_is_elementwise_max(spark):
    """Union semantics: sketch(A ∪ B) == max-merge of the two sketches —
    the property that lets per-partition partial sketches combine
    associatively (and lets persisted sketches from separate ingest
    batches merge without touching raw data)."""
    a, b = list(range(300)), list(range(150, 450))
    sk = lambda ids: hll_sketch(_df(spark, ids), F.col("v"), ["grp"])  # noqa: E731
    union = {r["bucket"]: r["rank"] for r in sk(a + b).collect()}
    merged = {
        r["bucket"]: r["rank"]
        for r in sk(a).unionAll(sk(b)).groupBy("grp", "bucket").agg(
            F.max("rank").alias("rank")
        ).collect()
    }
    assert union == merged


def test_estimate_accuracy(spark):
    """m=256 -> ~6.5% standard error; assert within 3 sigma at several
    cardinalities spanning the linear-counting and raw regimes."""
    for n in (40, 300, 2000, 20000):
        regs = hll_sketch(_df(spark, range(n)), F.col("v"), ["grp"])
        est = hll_estimate(regs, ["grp"]).collect()[0]["n_distinct_est"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_estimate_multi_group_and_duplicates(spark):
    """Duplicates never move a register (distinct semantics), and groups
    estimate independently in one pass."""
    df = _df(spark, list(range(1000)) * 3, grp="big").unionAll(
        _df(spark, list(range(100)) * 5, grp="small")
    )
    regs = hll_sketch(df, F.col("v"), ["grp"])
    ests = {r["grp"]: r["n_distinct_est"] for r in hll_estimate(regs, ["grp"]).collect()}
    assert abs(ests["big"] - 1000) / 1000 < 0.20, ests
    assert abs(ests["small"] - 100) / 100 < 0.20, ests
