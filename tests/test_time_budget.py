"""P3 per-doc time budget (pmOCR OCR_TIMEOUT kill path, pmocr.sh:926-987):
a runaway decode becomes an error struct / failed doc, never a hung task."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pmocr_spark import codecs, corpus, pipeline, udfs


def _one_doc_tables():
    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "slow",
                "spans": [{"kind": "tif", "text": None, "media_ref": "b:s", "offset": 0}],
            },
            {
                "doc_id": "ok-text",
                "spans": [{"kind": "text", "text": "fine", "media_ref": None, "offset": 0}],
            },
        ],
        schema=corpus.DOCUMENTS_SCHEMA,
    )
    blobs = pa.Table.from_pylist(
        [
            {
                "media_ref": "b:s",
                "kind": "tif",
                "content": codecs.encode_image("slow doc", "tif", salt="b:s"),
            }
        ],
        schema=corpus.BLOBS_SCHEMA,
    )
    return docs, blobs


def _run_with_udf(spark, tmp_path, ocr_udf):
    docs_t, blobs_t = _one_doc_tables()
    pq.write_table(docs_t, f"{tmp_path}/documents.parquet")
    pq.write_table(blobs_t, f"{tmp_path}/media_blobs.parquet")
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    blobs = spark.read.parquet(f"{tmp_path}/media_blobs.parquet")
    out = pipeline.run_batch(spark, docs, blobs, ocr_udf=ocr_udf)
    return {r["doc_id"]: r.asDict(recursive=True) for r in out.collect()}


def test_soft_budget_marks_failed(spark, tmp_path):
    """Soft mode (default): an over-budget decode is recorded as a
    TimeoutError error struct -> doc status 'failed', quarantine path."""
    slow = udfs.make_ocr_extract(budget_s=0.01, hard=False, test_delay=0.05)
    rows = _run_with_udf(spark, tmp_path, slow)
    assert rows["slow"]["status"] == "failed"
    assert "TimeoutError" in rows["slow"]["error"]
    assert rows["ok-text"]["status"] == "done"


def test_hard_budget_kills_runaway(spark, tmp_path):
    """Hard mode: the decode is abandoned AT the deadline (the task does
    not wait out the runaway work)."""
    import time

    slow = udfs.make_ocr_extract(budget_s=0.05, hard=True, test_delay=8.0)
    t0 = time.time()
    rows = _run_with_udf(spark, tmp_path, slow)
    assert rows["slow"]["status"] == "failed"
    assert "hard kill" in rows["slow"]["error"]
    assert time.time() - t0 < 8.0, "task must not wait out the runaway decode"


def test_budget_off_passes(spark, tmp_path):
    fast = udfs.make_ocr_extract(budget_s=0, hard=False, test_delay=0.0)
    rows = _run_with_udf(spark, tmp_path, fast)
    assert rows["slow"]["status"] == "done"
    assert rows["slow"]["txt"] == "slow doc"
