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


def test_package_zip_importable_for_py_files(tmp_path, corpus_dir):
    """The spark-submit deployment story (README 'Deployment'): the
    package must work imported FROM A ZIP exactly as --py-files ships
    it — no __file__-relative resources, no import-time filesystem
    assumptions. A subprocess puts ONLY the zip on sys.path and runs a
    real (tiny) batch pipeline through it."""
    import subprocess
    import sys
    import zipfile

    zpath = tmp_path / "pmocr_spark.zip"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, "pmocr_spark")):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    src = f"""
import sys
sys.path.insert(0, {str(zpath)!r})
import pmocr_spark  # from the zip
assert pmocr_spark.__file__.startswith({str(zpath)!r}), pmocr_spark.__file__
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
from pmocr_spark import pipeline
docs = spark.read.parquet({f"{corpus_dir}/documents.parquet"!r}).limit(8)
blobs = spark.read.parquet({f"{corpus_dir}/media_blobs.parquet"!r})
out = pipeline.run_batch(spark, docs, blobs)
n = out.count()
assert n == 8, n
print("ZIP-OK", n)
spark.stop()
"""
    r = subprocess.run(
        [sys.executable, "-c", src], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ZIP-OK 8" in r.stdout


def test_jsonl_source_and_sink_roundtrip(spark, tmp_path):
    """The JSONL interchange path (Dolma/C4-style shards, base64 media)
    must produce byte-identical results to the parquet path on the same
    corpus, both directions: explicit-schema reads (no inference scan)
    and a base64 sink that re-decodes to the same pdf blobs."""
    import base64
    import json

    from pmocr_spark import cli, codecs, corpus

    docs_t, blobs_t = corpus.generate(n_docs=25, seed=9)
    pdir = tmp_path / "parquet"
    pdir.mkdir()
    corpus._write_tables(str(pdir), docs_t, blobs_t)

    jdocs = tmp_path / "docs.jsonl"
    with open(jdocs, "w") as f:
        for row in docs_t.to_pylist():
            f.write(json.dumps(row) + "\n")
    jblobs = tmp_path / "blobs.jsonl"
    with open(jblobs, "w") as f:
        for row in blobs_t.to_pylist():
            f.write(json.dumps({
                "media_ref": row["media_ref"],
                "kind": row["kind"],
                "content_b64": base64.b64encode(row["content"]).decode(),
            }) + "\n")

    common = ["--batch", "--targets", "txt,csv,pdf", "--master", "local[4]",
              "--job-ts", "2024-01-01T00:00:00Z"]
    outp = str(tmp_path / "out_parquet")
    cli.main(["--input", f"{pdir}/documents.parquet",
              "--blobs", f"{pdir}/media_blobs.parquet",
              "--output", outp, "--lineage", str(tmp_path / "lin1"), *common])
    outj = str(tmp_path / "out_jsonl")
    cli.main(["--input", str(jdocs), "--blobs", str(jblobs),
              "--input-format", "jsonl", "--output-format", "jsonl",
              "--output", outj, "--lineage", str(tmp_path / "lin2"), *common])

    ref = {r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
    got = {}
    for part in sorted((tmp_path / "out_jsonl").glob("part-*.json")):
        for line in open(part):
            r = json.loads(line)
            got[r["doc_id"]] = r
    assert set(got) == set(ref)
    for doc_id, r in ref.items():
        g = got[doc_id]
        assert g["status"] == r["status"]
        assert g.get("txt") == r["txt"] and g.get("csv") == r["csv"]
        # binary pdf target survives the base64 round-trip byte-for-byte
        if r["pdf"] is not None:
            assert base64.b64decode(g["pdf"]) == bytes(r["pdf"])
            assert codecs.decode_blob(base64.b64decode(g["pdf"])) == r["txt"]
        else:
            assert g.get("pdf") is None


def test_orc_interchange_cli_roundtrip(spark, tmp_path):
    """Hive/ORC interchange (--input-format orc / --output-format orc):
    Spark's native vectorized ORC reader/writer carries the same corpus
    — blob BINARY columns untranscoded — and the batch results must be
    byte-identical to the parquet path's."""
    from pmocr_spark import cli, corpus

    docs_t, blobs_t = corpus.generate(n_docs=25, seed=9)
    pdir = tmp_path / "parquet"
    pdir.mkdir()
    corpus._write_tables(str(pdir), docs_t, blobs_t)
    odocs = str(tmp_path / "docs_orc")
    oblobs = str(tmp_path / "blobs_orc")
    spark.read.parquet(f"{pdir}/documents.parquet").write.orc(odocs)
    spark.read.parquet(f"{pdir}/media_blobs.parquet").write.orc(oblobs)

    common = ["--batch", "--targets", "txt,csv,pdf", "--master", "local[4]",
              "--job-ts", "2024-01-01T00:00:00Z"]
    outp = str(tmp_path / "out_parquet")
    cli.main(["--input", f"{pdir}/documents.parquet",
              "--blobs", f"{pdir}/media_blobs.parquet",
              "--output", outp, "--lineage", str(tmp_path / "lin1"), *common])
    outo = str(tmp_path / "out_orc")
    cli.main(["--input", odocs, "--blobs", oblobs,
              "--input-format", "orc", "--output-format", "orc",
              "--output", outo, "--lineage", str(tmp_path / "lin2"), *common])

    ref = {r["doc_id"]: r for r in spark.read.parquet(outp).collect()}
    got = {r["doc_id"]: r for r in spark.read.orc(outo).collect()}
    assert set(got) == set(ref)
    for doc_id, r in ref.items():
        g = got[doc_id]
        assert g["status"] == r["status"]
        assert g["txt"] == r["txt"] and g["csv"] == r["csv"]
        # binary pdf target survives ORC BINARY byte-for-byte
        if r["pdf"] is None:
            assert g["pdf"] is None
        else:
            assert bytes(g["pdf"]) == bytes(r["pdf"])
