"""Z-order layout optimization (operators/zorder.py): interleave
arithmetic vs a pure-python reference, file-level min/max pruning
improvement over a linear sort, and the --optimize-layout CLI."""

from __future__ import annotations

import glob
import subprocess
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import zorder

SF = "/root/testdata/sf0.001"


def _py_zvalue(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z += ((a >> i) & 1) << (2 * i + 1)
        z += ((b >> i) & 1) << (2 * i)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 127, 200, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder.zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_zvalue(a, b), (a, b)


def test_zvalue_is_codegen_only(spark):
    # the z expression must stay JVM-side: no Python eval in the plan
    from pmocr_spark.plans import shape

    df = spark.range(100).select(
        zorder.zvalue(F.col("id") % 256, (F.col("id") * 7) % 256).alias("z")
    )
    plan = shape.formatted_plan(df)
    assert "EvalPython" not in plan, plan


def test_scale_bucket_bounds(spark):
    # buckets are order-preserving and stay inside [0, 256)
    df = spark.range(1, 10001).select(F.col("id").alias("v"))
    z = zorder.with_zvalue(df.withColumn("w", F.col("v") * 3 + 7), "v", "w")
    mx = z.agg(F.max("_z"), F.min("_z")).collect()[0]
    assert 0 <= mx[1] and mx[0] < (1 << 16)


def _minmax_per_file(path: str, col: str) -> list[tuple[int, int]]:
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        mn, mx = None, None
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        ranges.append((mn, mx))
    return ranges


def _files_overlapping(ranges, lo, hi):
    return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "n_chars", "lang")
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    zorder.optimize_layout(docs, "n_chars", "doc_id", n_files=8).write.parquet(zpath)
    # the linear baseline: same file count, sorted on n_chars only
    docs.repartitionByRange(8, "n_chars").sortWithinPartitions("n_chars").write.parquet(lpath)

    stats = docs.agg(
        F.min("doc_id"), F.max("doc_id"), F.min("n_chars"), F.max("n_chars")
    ).collect()[0]
    id_lo, id_hi = stats[0], stats[0] + (stats[1] - stats[0]) // 8
    nc_lo, nc_hi = stats[2], stats[2] + (stats[3] - stats[2]) // 8

    z_id = _minmax_per_file(zpath, "doc_id")
    z_nc = _minmax_per_file(zpath, "n_chars")
    l_id = _minmax_per_file(lpath, "doc_id")
    l_nc = _minmax_per_file(lpath, "n_chars")
    assert len(z_id) == 8 and len(l_id) == 8

    # the linear layout prunes its own sort column perfectly...
    assert _files_overlapping(l_nc, nc_lo, nc_hi) <= 2
    # ...but a doc_id range touches EVERY linear file (ids are scattered)
    assert _files_overlapping(l_id, id_lo, id_hi) == 8
    # the z-order layout prunes BOTH dimensions: a 1/8-span predicate
    # on either column skips files (measured 5/8 and 3/8 on this
    # deterministic corpus; at 8 files the curve carries ~2 bits of
    # n_chars and ~1 bit of doc_id, so the secondary dim prunes less)
    assert _files_overlapping(z_id, id_lo, id_hi) <= 6
    assert _files_overlapping(z_nc, nc_lo, nc_hi) <= 4


def test_zorder_preserves_rows_exactly(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "z2")
    zorder.optimize_layout(docs, "n_chars", "doc_id", n_files=4).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)
    # content identical: anti-join both ways is empty
    assert back.join(docs, "doc_id", "left_anti").count() == 0
    assert docs.join(back, "doc_id", "left_anti").count() == 0


def test_optimize_layout_cli(tmp_path):
    out = str(tmp_path / "zcli")
    r = subprocess.run(
        [
            sys.executable, "-m", "pmocr_spark.cli",
            "--optimize-layout", "n_chars,doc_id",
            "--input", f"{SF}/documents.parquet",
            "--output", out,
            "--layout-files", "4",
            "--master", "local[4]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "z-ordered 500 rows" in r.stdout
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 4
    # every file covers a contiguous z-range -> doc_id min/max per file
    # must NOT all span the whole corpus
    ranges = _minmax_per_file(out, "doc_id")
    assert any(mx - mn < 499 for mn, mx in ranges), ranges


def test_optimize_layout_cli_rejects_bad_column(tmp_path):
    r = subprocess.run(
        [
            sys.executable, "-m", "pmocr_spark.cli",
            "--optimize-layout", "lang,doc_id",
            "--input", f"{SF}/documents.parquet",
            "--output", str(tmp_path / "no"),
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "integer column" in (r.stdout + r.stderr)


def test_layout_files_requires_mode():
    r = subprocess.run(
        [
            sys.executable, "-m", "pmocr_spark.cli",
            "--batch", "--layout-files", "4",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert "--layout-files only applies" in (r.stdout + r.stderr)


# ------------------------------------------------- --compact-output CLI


def test_compact_output_cli(tmp_path, spark):
    # simulate service-mode epoch layout: many tiny files across
    # epoch-*/ subdirs
    src = tmp_path / "sout"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for e in range(6):
        docs.filter(F.col("doc_id") % 6 == e).repartition(4).write.parquet(
            str(src / f"epoch-{e}")
        )
    n_in = len(glob.glob(f"{src}/epoch-*/part-*.parquet"))
    assert n_in >= 20  # genuinely fragmented
    out = str(tmp_path / "compacted")
    r = subprocess.run(
        [
            sys.executable, "-m", "pmocr_spark.cli",
            "--compact-output", "--input", str(src), "--output", out,
            "--target-file-mb", "64", "--master", "local[4]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"compacted {n_in} files" in r.stdout
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1  # ~1 MB of input -> one 64 MB-target file
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.join(docs, "doc_id", "left_anti").count() == 0
    assert docs.join(back, "doc_id", "left_anti").count() == 0


def test_target_file_mb_requires_mode():
    r = subprocess.run(
        [
            sys.executable, "-m", "pmocr_spark.cli",
            "--batch", "--target-file-mb", "64",
        ],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert "--target-file-mb only applies" in (r.stdout + r.stderr)
