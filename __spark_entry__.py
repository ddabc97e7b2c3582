"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the full OCR-extraction engine end-to-end
  over sf0.001: testdata documents are lifted into the interleaved
  span-table shape (one text span + one synthetic media span per doc),
  then run through the batch plan (explode -> route -> pandas-UDF OCR ->
  windowed reassembly -> txt/csv targets + status).
- ``queries()`` / ``oracle_sql()``: operator catalog from
  pmocr_spark.queries — every SURVEY.md §2 operator + the training-data
  ops (dedup / ANN / text analysis), DuckDB-oracled where SQL can
  express the semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full span-extraction pipeline over sf0.001 documents."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pmocr_spark import codecs, pipeline

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    clean = F.trim(F.regexp_replace("text", "[^ -~]", ""))

    @F.pandas_udf(T.BinaryType())
    def encode_blob(text):
        return pd.Series(
            [codecs.encode_image(t, "tiff", salt="entry") for t in text], dtype=object
        )

    base = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        clean.alias("clean_text"),
        F.concat(F.lit("m:"), F.col("doc_id").cast("string")).alias("media_ref"),
    )
    docs = base.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("clean_text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("tiff").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.col("media_ref").alias("media_ref"),
                F.lit(1).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    blobs = base.select(
        "media_ref", F.lit("tiff").alias("kind"), encode_blob(F.col("clean_text")).alias("content")
    )
    out = pipeline.run_batch(spark, docs, blobs)
    return out.select("doc_id", "status", "span_count", "error_count", "txt", "csv")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + training ops."""
    from pmocr_spark.queries import QUERY_FNS

    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible
    ops — e.g. q28_ocr_pipeline, gated instead by pytest span-equality)."""
    from pmocr_spark.queries import ORACLES

    return dict(ORACLES)
