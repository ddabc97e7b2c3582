"""JSONL document/blob source + results sink (web-pipeline interchange).

Web-scale corpora ship as JSON Lines (Dolma, C4, RedPajama all publish
JSONL shards); this connector reads them into the engine's span shape
and writes results back out, with two 100 TB disciplines:

- EXPLICIT schemas only. Schema inference is a full extra pass over the
  data before the real job starts — never acceptable at 10^12 rows, so
  both readers refuse to infer (spark.read.schema(...).json).
- Base64 media payloads decoded JVM-side. JSON cannot carry raw binary;
  the interchange convention is base64 in a ``content_b64`` field,
  decoded with the codegen'd ``unbase64`` (and re-encoded with
  ``base64`` on the sink side) — no Python in the path.

pmOCR analog: none (the reference consumes a filesystem tree); this is
north-rule-native interchange plumbing, the S1/S4 connector family
extended to the format the rest of the ecosystem speaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the engine's span-shaped document schema, stated explicitly
DOCUMENTS_SCHEMA = (
    "doc_id string, spans array<struct"
    "<kind:string,text:string,media_ref:string,offset:int>>"
)

#: blob interchange schema — content travels base64-encoded
BLOBS_SCHEMA = "media_ref string, kind string, content_b64 string"


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL shards -> documents(doc_id, spans). Explicit schema; rows
    missing fields surface as NULLs (the pipeline's explode_outer /
    allow-list path already handles them), never as a schema scan."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


def read_blobs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL shards -> media_blobs(media_ref, kind, content). base64
    decode is one codegen'd expression; a field that is not valid
    base64 decodes to whatever bytes it yields and then fails the
    codec's magic check downstream — error-as-data, not a read error."""
    raw = spark.read.schema(BLOBS_SCHEMA).json(path)
    return raw.select(
        "media_ref", "kind", F.unbase64(F.col("content_b64")).alias("content")
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Results -> JSONL shards: binary columns (pdf target blobs) are
    base64-encoded so the lines stay valid JSON; everything else is
    written as-is. Column order preserved; Hive partitioning composes
    like the parquet sink's."""
    cols = [
        F.base64(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, T.BinaryType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    writer = df.select(*cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
