"""Binary-file corpus source (S1's raw-directory side).

pmOCR scans a directory tree with a case-insensitive extension regex
(`find -iregex '.*\\.(pdf|tif|...)'`, /root/reference/pmocr.sh:2183).
The Spark-native equivalent ingests the same tree as a DataFrame via the
built-in binaryFile source, lifting each file into the media_blobs shape
(media_ref, kind, content) so the rest of the engine is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import MEDIA_KINDS
from ..operators.html_extract import HTML_KINDS

#: raw-ingest allow-list: pmOCR's scanner formats plus the north-rule
#: html kinds (saved web pages route to the boilerplate-strip extractor)
INGEST_KINDS = tuple(MEDIA_KINDS) + tuple(HTML_KINDS)


def read_media_dir(spark: SparkSession, path: str, recursive: bool = True) -> DataFrame:
    """Directory tree -> media_blobs(media_ref, kind, content).

    The extension allow-list (F1) is applied BOTH as a pathGlobFilter
    (prunes at listing time — never reads disallowed bytes, the analog
    of pmOCR pushing the regex into find) and as a residual kind filter.
    The reference's regex is CASE-INSENSITIVE (`find -iregex`,
    pmocr.sh:2183) — scanner output is routinely SCAN001.TIF — so each
    extension becomes a [tT][iI][fF]-style character-class glob; the
    residual filter lowercases, so mixed case flows through end to end.
    """
    ci = lambda ext: "".join(f"[{c}{c.upper()}]" for c in ext)  # noqa: E731
    glob = "*.{" + ",".join(ci(k) for k in INGEST_KINDS) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    kind = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    return df.select(
        F.col("path").alias("media_ref"),
        kind.alias("kind"),
        F.col("content"),
    ).filter(kind.isin(*INGEST_KINDS))


def lift_to_documents(blobs: DataFrame) -> DataFrame:
    """One file = one single-span document (pmOCR's row model §1.1):
    documents(doc_id, spans) with a single media span at offset 0."""
    return blobs.select(
        F.col("media_ref").alias("doc_id"),
        F.array(
            F.struct(
                F.col("kind").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.col("media_ref").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
