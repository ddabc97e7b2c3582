"""Trained quality classifier (operators/quality_classifier.py):
exactness, order-independence, learning, and plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import quality_classifier as qc
from pmocr_spark.operators.graph import iter_checkpoint

SF = "/root/testdata/sf0.001"


def _feats(spark, repartition=None):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    if repartition:
        d = d.repartition(repartition)
    ntok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    npunct = F.regexp_count("text", F.lit("[.,;:!?]")).cast("long")
    lt = F.lower(F.col("text"))
    nstop = (
        F.floor((F.length(lt) - F.length(F.replace(lt, F.lit(" the ")))) / 5)
        .cast("long")
    )
    quality = 1.0 / (
        1.0
        + F.exp(
            -(0.002 * F.col("n_chars") + 2.0 * nstop / ntok - 1.5 * npunct / ntok - 0.5)
        )
    )
    return d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("r1"),
        ntok.alias("r2"),
        F.round(F.lit(1000.0) * F.col("n_chars") / ntok, 0).cast("long").alias("r3"),
        F.round(F.lit(1000.0) * nstop / ntok, 0).cast("long").alias("r4"),
        F.round(F.lit(1000.0) * npunct / ntok, 0).cast("long").alias("r5"),
        (quality > 0.5).cast("long").alias("y"),
    )


XCOLS = ["r1", "r2", "r3", "r4", "r5"]


def _train(spark, repartition=None, iters=qc.ITERS):
    feats = iter_checkpoint(_feats(spark, repartition))
    n, mu, sd = qc.standardize_stats(feats, XCOLS)
    z = iter_checkpoint(qc.z_frame(feats, XCOLS, mu, sd, "y", ["doc_id"]))
    w = qc.train(z, k=len(XCOLS), n=n, iters=iters)
    return n, mu, sd, z, w


def _round_away(v):
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def _reference(rows, iters, eta):
    """Pure-python/numpy mirror of the module formula (same evaluation
    order, same away-from-zero rounding)."""
    X = np.array([[r[c] for c in XCOLS] for r in rows], dtype=np.int64)
    y = np.array([r["y"] for r in rows], dtype=np.int64)
    n = len(rows)
    mu = [float(int(X[:, i].sum())) / n for i in range(X.shape[1])]
    sd = []
    for i in range(X.shape[1]):
        var = float(int((X[:, i].astype(object) ** 2).sum())) / n - mu[i] * mu[i]
        sd.append(math.sqrt(var) if var > 0 else 1.0)
    Z = np.empty((n, 6), dtype=np.int64)
    Z[:, 0] = 1000
    for i in range(5):
        Z[:, i + 1] = _round_away(1000.0 * (X[:, i] - mu[i]) / sd[i]).astype(np.int64)
    w = [0.0] * 6
    losses = []
    for _ in range(iters):
        logit = Z[:, 0] * w[0]
        for j in range(1, 6):
            logit = logit + Z[:, j] * w[j]
        logit = logit / 1000.0
        p = 1000000.0 / (1.0 + np.exp(-logit))
        pmu = _round_away(p).astype(np.int64)
        losses.append(float(np.mean(np.log1p(np.exp(-np.where(y == 1, 1, -1) * logit)))))
        g = ((pmu - 1000000 * y)[:, None].astype(object) * Z.astype(object)).sum(0)
        w = [w[j] - eta * float(g[j]) / (1000000000.0 * n) for j in range(6)]
    return mu, sd, w, losses


def test_weights_match_pure_python_reference(spark):
    n, mu, sd, z, w = _train(spark)
    rows = _feats(spark).collect()
    rmu, rsd, rw, _ = _reference(rows, qc.ITERS, qc.ETA)
    assert mu == pytest.approx(rmu, abs=0.0)
    assert sd == pytest.approx(rsd, abs=0.0)
    # exp() may differ in the last ulp between the JVM and libm, which
    # can flip a micro-quantized probability by 1 on boundary docs —
    # weights then differ at the 1e-9 scale, nothing more
    assert w == pytest.approx(rw, abs=1e-6)


def test_training_is_partitioning_invariant(spark):
    """The order-independence claim: exact integer gradients mean the
    weight trajectory is BIT-IDENTICAL under any input partitioning."""
    _, _, _, _, w3 = _train(spark, repartition=3)
    _, _, _, _, w7 = _train(spark, repartition=7)
    assert w3 == w7  # exact float equality, not approx


def test_loss_decreases_and_model_learns(spark):
    n, mu, sd, z, w = _train(spark, iters=qc.ITERS)
    rows = _reference(_feats(spark).collect(), qc.ITERS, qc.ETA)
    losses = rows[3]
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    # trained scores separate the labels far better than chance
    scored = z.select("y", qc.score_col(w).alias("p")).collect()
    acc = sum((r["p"] > 0.5) == (r["y"] == 1) for r in scored) / len(scored)
    assert acc >= 0.85, acc


def test_constant_feature_gets_unit_sd(spark):
    feats = _feats(spark).withColumn("r5", F.lit(7).cast("long"))
    n, mu, sd = qc.standardize_stats(feats, XCOLS)
    assert sd[4] == 1.0
    z = qc.z_frame(feats, XCOLS, mu, sd, "y", ["doc_id"])
    assert all(r["z5"] == 0 for r in z.select("z5").distinct().collect())


def test_gradient_agg_plan_is_one_exchange_no_python(spark):
    from pmocr_spark.plans import shape

    feats = iter_checkpoint(_feats(spark))
    n, mu, sd = qc.standardize_stats(feats, XCOLS)
    z = qc.z_frame(feats, XCOLS, mu, sd, "y", ["doc_id"])
    w = [0.0] * 6
    r = qc.pmu_col(w) - F.col("y") * F.lit(1000000)
    g = z.agg(
        *[F.sum((r * F.col(f"z{j}")).cast("decimal(38,0)")).alias(f"g{j}") for j in range(6)]
    )
    plan = shape.formatted_plan(g)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert shape.count_exchanges(g) <= 1, plan  # partial agg map-side


# --------------------------------------------- persisted model lifecycle


def test_cli_train_score_lifecycle(spark, tmp_path):
    """--train-quality persists (weights + TRAINING stats) as a sidecar;
    --score-quality reproduces the in-process scores exactly, and
    scoring a SUBSET corpus uses the persisted stats (scores per doc
    identical to full-corpus scoring — inference never restandardizes)."""
    from pmocr_spark import cli
    from pmocr_spark.operators import quality_classifier as qc2

    model_dir = str(tmp_path / "model")
    cli.main(
        ["--train-quality", "--input", f"{SF}/documents.parquet",
         "--output", model_dir, "--master", "local[2]"]
    )
    model = qc2.read_model(spark, model_dir)
    assert model["algo"] == "logreg-exact-int" and len(model["w"]) == 6

    out = str(tmp_path / "scored")
    cli.main(
        ["--score-quality", model_dir, "--input", f"{SF}/documents.parquet",
         "--output", out, "--master", "local[2]"]
    )
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    # matches in-process scoring under the same model
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = {
        r["doc_id"]: r["lr_quality"]
        for r in qc2.score_with_model(docs, model).collect()
    }
    assert len(got) == len(want)
    assert all(got[d]["lr_quality"] == want[d] for d in want)
    # original columns survive + keep flag is consistent with the score
    assert "text" in next(iter(got.values())).asDict()
    assert all(
        (r["lr_quality"] > 0.5) == bool(r["keep_quality"]) for r in got.values()
    )

    # subset scoring: same per-doc scores (stats come from the model)
    sub_in = str(tmp_path / "subset")
    docs.limit(13).write.parquet(sub_in)
    sub_out = str(tmp_path / "scored_sub")
    cli.main(
        ["--score-quality", model_dir, "--input", sub_in,
         "--output", sub_out, "--master", "local[2]"]
    )
    for r in spark.read.parquet(sub_out).collect():
        assert r["lr_quality"] == want[r["doc_id"]], r["doc_id"]


def test_score_quality_rejects_non_model_dir(spark, tmp_path):
    from pmocr_spark import cli

    bogus = str(tmp_path / "not_a_model")
    spark.range(1).write.parquet(bogus)
    with pytest.raises(ValueError, match="not a quality model dir"):
        cli.main(
            ["--score-quality", bogus, "--input", f"{SF}/documents.parquet",
             "--output", str(tmp_path / "o"), "--master", "local[2]"]
        )
