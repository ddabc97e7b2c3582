"""binaryFile corpus source: allow-list pushdown at listing time + lift
into the documents span shape, end-to-end through the pipeline."""

from __future__ import annotations

import os

import pytest

from pmocr_spark import codecs, pipeline
from pmocr_spark.sources import binary as src


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "sub").mkdir()
    files = {
        "a.tif": codecs.encode_image("alpha doc", "tif", salt="1"),
        "b.png": codecs.encode_image("beta doc", "png", salt="2"),
        "sub/c.pdf": codecs.encode_pdf(["gamma page"], salt="3"),
        "noise.txt": b"not media",  # excluded by the allow-list
        "d.TIFF": codecs.encode_image("delta doc", "tiff", salt="4"),
    }
    for name, blob in files.items():
        p = d / name
        p.write_bytes(blob)
    return str(d)


def test_read_media_dir_allowlist(spark, media_dir):
    blobs = src.read_media_dir(spark, media_dir)
    kinds = {os.path.basename(r["media_ref"]): r["kind"] for r in blobs.collect()}
    # txt excluded; .TIFF ingested case-insensitively (find -iregex parity)
    assert set(kinds) == {"a.tif", "b.png", "c.pdf", "d.TIFF"}
    assert kinds["c.pdf"] == "pdf"
    assert kinds["d.TIFF"] == "tiff"


def test_lift_and_extract_end_to_end(spark, media_dir):
    blobs = src.read_media_dir(spark, media_dir)
    docs = src.lift_to_documents(blobs)
    out = pipeline.run_batch(spark, docs, blobs)
    got = {os.path.basename(r["doc_id"]): r["txt"] for r in out.collect()}
    assert got["a.tif"] == "alpha doc"
    assert got["b.png"] == "beta doc"
    assert got["c.pdf"] == "gamma page"


def test_read_media_dir_case_insensitive(spark, tmp_path):
    """pmOCR's allow-list is case-insensitive (`find -iregex`,
    pmocr.sh:2183): SCAN001.TIF must be ingested, with kind normalized
    to lowercase."""
    import os

    from pmocr_spark import codecs
    from pmocr_spark.sources import binary as src

    d = tmp_path / "tree"
    os.makedirs(d)
    with open(d / "SCAN001.TIF", "wb") as f:
        f.write(codecs.encode_image("upper case scan", "tif", salt="s1"))
    with open(d / "lower.tif", "wb") as f:
        f.write(codecs.encode_image("lower case scan", "tif", salt="s2"))
    blobs = src.read_media_dir(spark, str(d)).collect()
    assert len(blobs) == 2
    assert {b["kind"] for b in blobs} == {"tif"}
