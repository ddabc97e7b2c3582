"""Scan-parallelism repair (optimization guide §2.5, "input skew").

A parquet file is splittable only at row-group boundaries: a
single-row-group file scans as ONE task no matter what
`spark.sql.files.maxPartitionBytes` says, so every map-side operation
upstream of the first exchange — fused codec UDF chains, in-row
token/array expressions, explode -> partial-agg map sides — runs on one
core while the rest of the cluster idles. The sf test tables are exactly
this shape (one file, one row group), and any real corpus delivered as
few-row-group files (gzip'd exports, single-writer dumps) hits the same
wall.

`spread()` is the guide's prescribed fix ("repartition immediately after
the read"), made scale-adaptive instead of a local[32] constant: it
round-robin-repartitions to `defaultParallelism` ONLY when the frame has
fewer partitions than that. At real scale (input split into >= cores
partitions) it is a provable no-op — no exchange is added — so plans
keep their narrow-input shape exactly where narrow input is the
problem. Round-robin repartition is deterministic under retry
(sortBeforeRepartition, SPARK-23207 — on by default) and carries the
pre-projection row, so it is applied to *pruned* frames (select the
needed columns first) wherever the full row is wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _split_estimate(df: DataFrame) -> int | None:
    """Upper bound on the scan partition count from the frame's input
    files: per-file ceil(bytes / maxPartitionBytes), summed — Spark's
    split math minus openCost packing (which only lowers the count).
    One py4j call (inputFiles) + local stat; the exact probe
    (df.rdd.getNumPartitions()) plans the scan through the JVM and
    costs ~1.6 s per call on this driver. None = undecidable (remote
    fs, no file-based source)."""
    import math
    import os

    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001
        return None
    if not files:
        return None
    raw = (
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .strip()
        .lower()
    )
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    try:
        digits = raw.rstrip("ib" + "".join(mult))
        mpb = int(digits) * mult.get(
            raw[len(digits)] if len(raw) > len(digits) else "", 1
        )
    except (ValueError, IndexError):
        mpb = 128 << 20
    total = 0
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        if path.startswith("file:"):
            path = path[5:]
        if not os.path.isabs(path):
            return None  # non-local scheme: undecidable here
        try:
            total += max(1, math.ceil(os.path.getsize(path) / mpb))
        except OSError:
            return None
    return total


def spread(df: DataFrame, min_rows_per_part: int | None = None) -> DataFrame:
    """Repartition `df` to defaultParallelism iff its scan is narrower
    than that — the single-row-group-input fix; a no-op on inputs that
    already scan wide. Streaming frames pass through untouched."""
    if getattr(df, "isStreaming", False):
        return df
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    cur = _split_estimate(df)
    if cur is None:
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001 — probe must never fail a query
            return df
    if cur >= n:
        return df
    return df.repartition(n)
