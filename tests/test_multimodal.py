"""Multimodal column operators: metadata, resize, embed, frame-sample,
audio stub — real Spark plumbing over binary columns."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from pmocr_spark import codecs
from pmocr_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def blob_df(spark):
    rows = [
        ("img1", codecs.encode_image("hello world", "png", salt="a")),
        ("img2", codecs.encode_image("line one\nline two", "tiff", salt="b")),
        ("pdf1", codecs.encode_pdf(["page one", "page two", "page three"], salt="c")),
        ("bad1", codecs.encode_corrupt("x")),
    ]
    return spark.createDataFrame(rows, "media_ref string, content binary")


def test_image_metadata(spark, blob_df):
    got = {
        r["media_ref"]: r.asDict()
        for r in blob_df.select("media_ref", mm.image_metadata("content").alias("m"))
        .select("media_ref", "m.*")
        .collect()
    }
    assert got["img1"]["format"] == "img" and got["img1"]["n_pages"] == 1
    assert got["pdf1"]["format"] == "pdf" and got["pdf1"]["n_pages"] == 3
    assert got["img2"]["height"] == 2 * codecs.GLYPH_H + 1 + 2 * codecs.BORDER
    assert got["bad1"]["error"] is not None and got["bad1"]["format"] is None


def test_image_resize_half(spark, blob_df):
    out = {
        r["media_ref"]: r["small"]
        for r in blob_df.select(
            "media_ref", mm.image_resize_half("content").alias("small")
        ).collect()
    }
    assert out["bad1"] is None
    h, w = struct.unpack("<II", bytes(out["img1"][10:18]))
    orig = codecs.rasterize(codecs.encode_image("hello world", "png", salt="a"))[0]
    assert (h, w) == ((orig.shape[0] + 1) // 2, (orig.shape[1] + 1) // 2)


def test_image_feature_embed(spark, blob_df):
    rows = blob_df.select("media_ref", mm.image_feature_embed("content").alias("v")).collect()
    vecs = {r["media_ref"]: r["v"] for r in rows}
    assert vecs["bad1"] is None
    assert len(vecs["img1"]) == mm.EMBED_DIM
    # deterministic
    rows2 = blob_df.select(mm.image_feature_embed("content").alias("v")).collect()
    assert [r["v"] for r in rows2][0] == vecs["img1"]


def test_frame_sample(spark):
    frames_blob = codecs.encode_pdf([f"frame {i}" for i in range(25)], salt="v")
    df = spark.createDataFrame([("vid1", frames_blob)], "media_ref string, content binary")
    out = mm.frame_sample(df, every_n=10).collect()
    assert [(r["media_ref"], r["frame_idx"]) for r in out] == [
        ("vid1", 0),
        ("vid1", 10),
        ("vid1", 20),
    ]
    # each emitted frame is itself a decodable single-page image
    assert codecs.decode_blob(bytes(out[1]["frame"])) == "frame 10"


def test_audio_metadata_stub(spark):
    good = b"PMAU" + struct.pack("<IQ", 16000, 32000)
    df = spark.createDataFrame(
        [("a1", good), ("a2", b"JUNK----")], "media_ref string, content binary"
    )
    udf = mm.audio_metadata_udf()
    got = {
        r["media_ref"]: r.asDict()
        for r in df.select("media_ref", udf("content").alias("m")).select("media_ref", "m.*").collect()
    }
    assert got["a1"]["sample_rate"] == 16000 and got["a1"]["duration_sec"] == 2.0
    assert got["a2"]["error"] is not None


def test_audio_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_audio_real(b"")
