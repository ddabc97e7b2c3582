"""Vectorized pandas/Arrow UDFs wrapping the media codec.

Design notes (SURVEY.md §2.3, §4.2):

- ONE fused pandas UDF runs the whole per-blob chain M1 rasterize ->
  M2 binarize/trim -> M3 segment+recognize. Staging them as separate
  UDF columns would round-trip page images through Arrow between every
  stage; fusing keeps intermediates in numpy inside one Python worker
  call — the Spark analog of pmOCR running the full chain inside one
  OCR() subshell (/root/reference/pmocr.sh:1854-2109), but amortized
  over Arrow batches instead of one fork per file.
- Row-level failure isolation: one bad blob must not fail the Arrow
  batch, so errors are data — struct(text, error) — mirroring pmOCR's
  per-fork exit codes (pmocr.sh:1047, 2103-2108). See SURVEY.md §7.4.2.
- Anti-oversubscription: pmOCR caps ImageMagick threads
  (MAGICK_THREAD_LIMIT, pmocr.sh:1891); numpy here is single-threaded
  per task by construction, so `spark.task.cpus=1` is safe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

OCR_RESULT_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


@F.pandas_udf(OCR_RESULT_TYPE)
def ocr_extract(content: pd.Series) -> pd.DataFrame:
    """Decode a batch of media blobs -> (text, error) per blob."""
    texts: list[str | None] = []
    errors: list[str | None] = []
    for blob in content:
        if blob is None:
            texts.append(None)
            errors.append("CodecError: null media content (missing blob)")
            continue
        try:
            texts.append(codecs.decode_blob(blob))
            errors.append(None)
        except Exception as e:  # noqa: BLE001 — error-as-data, never fail the batch
            texts.append(None)
            errors.append(f"{type(e).__name__}: {e}")
    return pd.DataFrame({"text": texts, "error": errors})


@F.pandas_udf(T.IntegerType())
def page_count(content: pd.Series) -> pd.Series:
    """Cheap content probe: number of pages in a blob (pdffonts analog F5)."""
    out = []
    for blob in content:
        try:
            out.append(len(codecs.rasterize(blob)) if blob is not None else 0)
        except Exception:  # noqa: BLE001
            out.append(-1)
    return pd.Series(out, dtype="int32")
