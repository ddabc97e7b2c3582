"""Persisted PQ index (operators/pq.py): codes + codebook-sidecar
round-trip, append-shaped incremental growth, and loud failure when the
codebook identity is missing or mismatched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import pq

SF = "/root/testdata/sf0.001"


def _vn(spark):
    from pmocr_spark.queries import _norm_embeddings

    v = _norm_embeddings(spark, SF)
    return v.select("vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("en"))


def _shortlist(codes, tables, k=10):
    return {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["dist_int"])
        for r in pq.pq_adc_topk(codes, tables, topk=k).collect()
    }


def test_pq_index_roundtrip(spark, tmp_path):
    """write -> read returns the same codes and a codebook whose ADC
    shortlist is IDENTICAL to the in-memory path (the sidecar's JSON
    float repr must round-trip the centroid doubles exactly — a 1-ulp
    drift would flip rounded micro-unit distances)."""
    path = str(tmp_path / "pq_index")
    vn = _vn(spark)
    book = pq.pq_codebook(vn)
    codes = pq.pq_encode(vn.filter(F.col("vec_id") >= 10), book)
    pq.write_pq_index(codes, book, path)

    codes2, book2, meta = pq.read_pq_index(spark, path)
    assert meta["n_sub"] == pq.N_SUB and len(meta["centroids"]) == pq.N_CODES
    got = {r["vec_id"]: r["codes"] for r in codes2.collect()}
    want = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert got == want

    q = vn.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "en")
    assert _shortlist(codes2, pq.pq_query_tables(q, book2)) == _shortlist(
        codes, pq.pq_query_tables(q, book)
    )


def test_pq_index_incremental_append(spark, tmp_path):
    """Two batches encoded against the persisted codebook and appended
    == one-shot encode of the union: per-vector codes are independent,
    so growth is pure append (no merge/cap pass, unlike the MinHash
    index)."""
    path = str(tmp_path / "pq_index")
    vn = _vn(spark)
    book = pq.pq_codebook(vn)
    b1 = vn.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 250))
    b2 = vn.filter(F.col("vec_id") >= 250)
    pq.write_pq_index(pq.pq_encode(b1, book), book, path)

    _, book_r, _ = pq.read_pq_index(spark, path)
    pq.write_pq_index(pq.pq_encode(b2, book_r), book_r, path, mode="append")

    codes_all, book2, _ = pq.read_pq_index(spark, path)
    q = vn.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "en")
    oneshot = pq.pq_encode(vn.filter(F.col("vec_id") >= 10), book)
    assert _shortlist(codes_all, pq.pq_query_tables(q, book2)) == _shortlist(
        oneshot, pq.pq_query_tables(q, book)
    )


def test_pq_index_requires_sidecar_and_matching_geometry(spark, tmp_path):
    """Codes without the codebook sidecar are unusable -> ValueError,
    never a silent default; a geometry mismatch (index built by a
    different PQ configuration) is equally loud."""
    path = str(tmp_path / "pq_bare")
    vn = _vn(spark)
    book = pq.pq_codebook(vn)
    pq.pq_encode(vn.limit(20), book).write.parquet(path)  # no sidecar
    with pytest.raises(ValueError, match="sidecar"):
        pq.read_pq_index(spark, path)

    path2 = str(tmp_path / "pq_geom")
    pq.write_pq_index(pq.pq_encode(vn.limit(20), book), book, path2)
    from pmocr_spark import checkpoint as ckpt

    meta = ckpt.read_sidecar(spark, path2, "_pq_index_meta.json")
    meta["n_sub"] = 8
    ckpt.write_sidecar(spark, path2, "_pq_index_meta.json", meta)
    with pytest.raises(ValueError, match="geometry"):
        pq.read_pq_index(spark, path2)
