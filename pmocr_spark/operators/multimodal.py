"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, batch shapes, mapInPandas iterators,
partitioning) is real and tested; the actual codec work is either the
deterministic synthetic image codec (pmocr_spark.codecs — fully
functional) or, for audio/video where the decode libraries are not in
this container, a clearly-marked stub behind an import-try that raises
NotImplementedError (per the build brief) while a deterministic fake
keeps the plumbing testable.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codecs

IMAGE_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


@F.pandas_udf(IMAGE_META_TYPE)
def image_metadata(content: pd.Series) -> pd.DataFrame:
    """Typed metadata extraction from image/pdf blobs (vectorized)."""
    out = {k: [] for k in ("format", "height", "width", "n_pages", "error")}
    for blob in content:
        try:
            pages = codecs.rasterize(bytes(blob))
            fmt = "pdf" if bytes(blob[:6]) == codecs.PDF_MAGIC else "img"
            h, w = pages[0].shape if pages else (0, 0)
            out["format"].append(fmt)
            out["height"].append(int(h))
            out["width"].append(int(w))
            out["n_pages"].append(len(pages))
            out["error"].append(None)
        except Exception as e:  # noqa: BLE001
            out["format"].append(None)
            out["height"].append(None)
            out["width"].append(None)
            out["n_pages"].append(None)
            out["error"].append(f"{type(e).__name__}: {e}")
    return pd.DataFrame(out)


@F.pandas_udf(T.BinaryType())
def image_resize_half(content: pd.Series) -> pd.Series:
    """Image transform op: 2x downsample (real numpy work on the
    synthetic codec's raster; with PIL/opencv installed this slot is
    where a true resize goes — the Spark plumbing is identical)."""
    out = []
    for blob in content:
        try:
            pages = codecs.rasterize(bytes(blob))
            img = pages[0][::2, ::2]
            kind_b = b"img\x00"
            out.append(
                codecs.IMG_MAGIC + kind_b + struct.pack("<II", *img.shape) + img.tobytes()
            )
        except Exception:  # noqa: BLE001
            out.append(None)
    return pd.Series(out, dtype=object)


EMBED_DIM = 64


@F.pandas_udf(T.ArrayType(T.FloatType()))
def image_feature_embed(content: pd.Series) -> pd.Series:
    """Feature extraction: deterministic 64-dim embedding from raster
    statistics (row/col ink densities). A real vision encoder would slot
    in here unchanged — same signature, same Arrow batch shape."""
    out = []
    for blob in content:
        try:
            pages = codecs.rasterize(bytes(blob))
            img = pages[0].astype(np.float32) / 255.0
            rows = img.mean(axis=1)
            cols = img.mean(axis=0)
            vec = np.zeros(EMBED_DIM, dtype=np.float32)
            half = EMBED_DIM // 2
            r = np.resize(rows, half)
            c = np.resize(cols, half)
            vec[:half] = r
            vec[half:] = c
            out.append([float(x) for x in vec])
        except Exception:  # noqa: BLE001
            out.append(None)
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------- audio/video

try:  # the decode libs (librosa / av / cv2) are NOT in this container
    import librosa  # type: ignore  # noqa: F401

    _HAVE_AUDIO = True
except ImportError:
    _HAVE_AUDIO = False


def decode_audio_real(blob: bytes):  # pragma: no cover - container lacks libs
    """STUB (build brief): real audio decode requires librosa/soundfile,
    not present in this image."""
    raise NotImplementedError(
        "audio decode requires librosa/soundfile; not available in this container"
    )


AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def audio_metadata_udf():
    """Audio metadata over a binary column. With real libs it decodes;
    here a deterministic fake header parse (16-byte: magic, rate, n)
    keeps the Spark plumbing (schema, batching, null-handling) tested."""

    @F.pandas_udf(AUDIO_META_TYPE)
    def audio_metadata(content: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in ("sample_rate", "n_samples", "duration_sec", "error")}
        for blob in content:
            try:
                if _HAVE_AUDIO:  # pragma: no cover
                    decode_audio_real(bytes(blob))
                b = bytes(blob)
                if b[:4] != b"PMAU":
                    raise codecs.CodecError("bad audio magic")
                rate, n = struct.unpack("<IQ", b[4:16])
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_sec"].append(round(n / rate, 6))
                out["error"].append(None)
            except Exception as e:  # noqa: BLE001
                out["sample_rate"].append(None)
                out["n_samples"].append(None)
                out["duration_sec"].append(None)
                out["error"].append(f"{type(e).__name__}: {e}")
        return pd.DataFrame(out)

    return audio_metadata


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: a video is modeled as a multi-page
    blob (our PDF container doubles as a frame sequence); emit every
    n-th frame as its own row via mapInPandas (iterator API — constant
    memory regardless of frames per video)."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches):
        for pdf in batches:
            refs, idxs, frames = [], [], []
            for ref, blob in zip(pdf["media_ref"], pdf["content"]):
                try:
                    pages = codecs.rasterize(bytes(blob))
                except Exception:  # noqa: BLE001
                    continue
                for i in range(0, len(pages), every_n):
                    img = pages[i]
                    refs.append(ref)
                    idxs.append(i)
                    frames.append(
                        codecs.IMG_MAGIC
                        + b"img\x00"
                        + struct.pack("<II", *img.shape)
                        + img.tobytes()
                    )
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "frame": frames})

    return df.select("media_ref", "content").mapInPandas(sample, schema)
