"""Z-order (Morton-curve) data-layout optimization.

The 100 TB lever the reference cannot have: pmOCR re-reads its input
directory tree every run (pmocr.sh's find loop), so file LAYOUT is
destiny — a corpus laid out well lets every later scan skip most of
its files. A linear sort clusters ONE column; interleaving the bits of
two rank-bucketed columns (Morton 1966; the technique Delta/Iceberg
ship as OPTIMIZE ZORDER BY) clusters BOTH, so parquet min/max
statistics prune files and row groups for range predicates on either
dimension — partition pruning without physical partitioning, which
matters when both query axes are high-cardinality.

Everything here is pure Catalyst codegen (shift/and/multiply chains —
no UDF, no Python in the scan path), and the write is ONE range
shuffle: bucket → interleave → repartitionByRange(z) →
sortWithinPartitions(z). At 10^12 rows the range exchange is the same
shape as q37's two-pass rank (the sampler draws boundaries, every file
gets a contiguous z-range), and the cost is paid once per corpus
rewrite, amortized over every subsequent pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per dimension: 8 bits x 2 dims = 65536 z-cells, enough
#: resolution for file-level pruning at any file count while keeping
#: the codegen chain short
DEFAULT_BITS = 8


def scale_bucket(col: Column, mn: Column, mx: Column, bits: int = DEFAULT_BITS) -> Column:
    """Order-preserving bucket of a numeric column into [0, 2**bits):
    ``(v - mn) * 2**bits // (mx - mn + 1)``. Exact BIGINT arithmetic
    (all inputs non-negative after the min shift, so truncating and
    floor division agree across engines)."""
    span = mx - mn + F.lit(1)
    return ((col - mn) * F.lit(1 << bits) / span).cast("long")


def zvalue(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of two ``bits``-bit bucket columns: bit i of
    ``a`` lands at position 2i+1, bit i of ``b`` at 2i. A pure
    shift/and/multiply expression chain — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(a, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
            + F.shiftright(b, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    return z


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = DEFAULT_BITS, out: str = "_z"
) -> DataFrame:
    """Attach the z-value of two numeric columns, min/max-scaled to
    ``bits``-bit buckets. The min/max pass is ONE map-side-combined
    4-number aggregate broadcast back — the only extra corpus touch."""
    stats = df.agg(
        F.min(col_a).cast("long").alias("_mna"),
        F.max(col_a).cast("long").alias("_mxa"),
        F.min(col_b).cast("long").alias("_mnb"),
        F.max(col_b).cast("long").alias("_mxb"),
    )
    ba = scale_bucket(F.col(col_a).cast("long"), F.col("_mna"), F.col("_mxa"), bits)
    bb = scale_bucket(F.col(col_b).cast("long"), F.col("_mnb"), F.col("_mxb"), bits)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out, zvalue(ba, bb, bits))
        .drop("_mna", "_mxa", "_mnb", "_mxb")
    )


def optimize_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Return ``df`` re-clustered along the Morton curve of
    (col_a, col_b): one repartitionByRange on the z-value plus an
    in-partition sort, so each written file covers a contiguous
    z-range — a rectangle-ish region of the (col_a, col_b) plane whose
    parquet min/max footer stats prune on EITHER column. Write the
    result with ``.write.parquet(...)``; the helper keeps the z column
    out of the output."""
    return (
        with_zvalue(df, col_a, col_b, bits)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
