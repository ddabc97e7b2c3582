"""Resume / quarantine / idempotency semantics (S5/S6/F2, FIXTURES.md §3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pmocr_spark import checkpoint as ckpt
from pmocr_spark import pipeline


def _run(spark, corpus_dir, lineage_dir, run_id):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    blobs = spark.read.parquet(f"{corpus_dir}/media_blobs.parquet")
    lineage = ckpt.read_checkpoint(spark, lineage_dir)
    results = pipeline.run_batch(spark, docs, blobs, checkpoint=lineage)
    results = results.persist()
    # materialize BEFORE appending to lineage: the plan reads lineage_dir
    # lazily, so appending first would anti-join the new rows away on any
    # cache-miss recompute (see checkpoint.append_checkpoint docstring)
    n = results.count()
    rows = ckpt.checkpoint_rows(results, run_id=run_id, job_ts="2024-01-01 00:00:00")
    ckpt.append_checkpoint(rows, lineage_dir)
    results.unpersist()
    return n


def test_resume_is_idempotent(spark, corpus_dir, expected):
    """Run twice: second run processes ZERO docs (pmOCR's _OCR-suffix
    work-avoidance, pmocr.sh:2088-2096) — including failed docs, which are
    quarantined and never retried (pmocr.sh:2002-2010, CHANGELOG.md:106)."""
    with tempfile.TemporaryDirectory(prefix="pmocr_ckpt_") as lineage_dir:
        n1 = _run(spark, corpus_dir, lineage_dir, "run-1")
        assert n1 == len(expected)
        n2 = _run(spark, corpus_dir, lineage_dir, "run-2")
        assert n2 == 0, "second run must find nothing to do"

        cp = ckpt.read_checkpoint(spark, lineage_dir)
        statuses = {r["doc_id"]: r["status"] for r in cp.collect()}
        assert len(statuses) == len(expected)
        for doc_id, exp in expected.items():
            assert statuses[doc_id] == exp["status"], doc_id


def test_partial_resume(spark, corpus_dir, expected):
    """Pre-seed half the docs as done: only the other half is processed."""
    with tempfile.TemporaryDirectory(prefix="pmocr_ckpt_") as lineage_dir:
        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        half = docs.select("doc_id").orderBy("doc_id").limit(len(expected) // 2)
        pre = half.select(
            F.lit(0).alias("partition_id"),
            "doc_id",
            F.lit("done").alias("status"),
            F.lit(1).alias("span_count"),
            F.lit(0).alias("error_count"),
            F.lit(None).cast("string").alias("error"),
            F.lit("seed").alias("run_id"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        )
        ckpt.append_checkpoint(pre, lineage_dir)
        n = _run(spark, corpus_dir, lineage_dir, "run-after-seed")
        assert n == len(expected) - len(expected) // 2


def test_partition_metrics(spark, corpus_dir):
    """Per-partition lineage metrics exist and account for all docs
    (north_rule: per-partition span counts prove skew handling)."""
    with tempfile.TemporaryDirectory(prefix="pmocr_ckpt_") as lineage_dir:
        _run(spark, corpus_dir, lineage_dir, "run-m")
        cp = ckpt.read_checkpoint(spark, lineage_dir)
        m = ckpt.partition_metrics(cp).collect()
        assert sum(r["docs"] for r in m) == cp.count()
        assert all(r["spans"] > 0 for r in m)
