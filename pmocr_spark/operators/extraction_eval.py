"""Extraction-quality evaluation: token-level precision / recall / F1
plus character/word error rates (CER/WER, the ISRI OCR-accuracy
methodology — Rice et al., UNLV-ISRI annual reports; WER is the
standard sequence metric) of an extracted-text column against a
per-row gold reference — the main-content-extraction benchmark
harness (the methodology of the public boilerplate-removal
benchmarks: score extractor output against gold text per page, then
aggregate). pmOCR's own test strategy is the degenerate exact case —
run_tests.sh asserts byte-equality against fixture conversions; real
extraction QA needs the graded version so a pipeline change can be
measured, not just pass/failed.

Map-only by design: an eval row carries BOTH texts (gold is the
fixture column, extracted is the pipeline output joined upstream of
this operator), so the multiset-intersection true-positive count is
doc-local — ONE Arrow-batched stage (a collections.Counter pass per
row, linear in document length), ZERO shuffles at any corpus size.
Corpus-level aggregation after it is one map-side-combined avg/sum.

Scores are integer micro-units (floor(1e6 * x)) computed from exact
BIGINT token counts — bit-identical across engines, partitionings and
replays (the BPE/DSIR exactness discipline); under the driver gate as
q27 part='eval' with the oracle restating tp via an independent
unnest + least() join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000


def token_eval(gold, ext) -> Column:
    """struct<tp,n_gold,n_ext> per row: whitespace-token multiset
    intersection size and both token counts. Arrow-batched, one linear
    Counter pass per document — never row-at-a-time Python."""
    import pandas as pd

    def _eval(g, e):
        from collections import Counter

        rows = []
        for gt, et in zip(g, e):
            gc = Counter((gt or "").split())
            ec = Counter((et or "").split())
            tp = sum(min(c, ec[t]) for t, c in gc.items())
            rows.append((tp, sum(gc.values()), sum(ec.values())))
        return pd.DataFrame(rows, columns=["tp", "n_gold", "n_ext"])

    udf = F.pandas_udf(_eval, "struct<tp:bigint,n_gold:bigint,n_ext:bigint>")
    return udf(
        F.col(gold) if isinstance(gold, str) else gold,
        F.col(ext) if isinstance(ext, str) else ext,
    )


def micro_scores(tp, n_gold, n_ext) -> tuple[Column, Column, Column]:
    """(precision, recall, f1) in integer micro-units from exact token
    counts. floor of a double division whose numerator stays far under
    2^53 (1e6 * doc tokens), so the integer result is exact on every
    engine; empty sides score 0, never NULL."""
    tp = tp * F.lit(MICRO)
    prec = F.when(n_ext > 0, F.floor(tp / n_ext)).otherwise(F.lit(0))
    rec = F.when(n_gold > 0, F.floor(tp / n_gold)).otherwise(F.lit(0))
    f1 = F.when(
        (n_gold + n_ext) > 0, F.floor(F.lit(2) * tp / (n_gold + n_ext))
    ).otherwise(F.lit(0))
    return prec.cast("long"), rec.cast("long"), f1.cast("long")


def seq_edit_distance(a: list, b: list) -> int:
    """Levenshtein distance between two token sequences (unit-cost
    insert/delete/substitute). Vectorized row DP: each gold row folds
    in one numpy pass; the intra-row insert dependency
    cur[j] = min(a[j], cur[j-1] + 1) is a prefix-min in d[j] = cur[j]-j
    (cur[j]-j = min(a[j]-j, d[j-1])), so np.minimum.accumulate closes
    the recurrence without a python inner loop."""
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n + m
    barr = np.array(b, dtype=object)
    js = np.arange(1, m + 1, dtype=np.int64)
    prev = np.arange(m + 1, dtype=np.int64)
    for i, tok in enumerate(a, 1):
        cost = (barr != tok).astype(np.int64)
        amin = np.minimum(prev[:-1] + cost, prev[1:] + 1)
        d = np.minimum.accumulate(np.concatenate(([i], amin - js)))
        prev = d + np.arange(m + 1, dtype=np.int64)
    return int(prev[-1])


def _words(s: str) -> list:
    """Word tokens for WER: split on single spaces, empties kept (the
    token_eval / q27 oracle convention: string_split(s, ' ')), except
    the empty string which tokenizes to [] (DuckDB's string_split('')
    semantics — python ''.split(' ') would give [''])."""
    return s.split(" ") if s else []


def edit_eval(gold, ext) -> Column:
    """struct<wdist,n_gold_w,n_ext_w> per row: word-level edit distance
    and both word counts. Arrow-batched, one DP per document — the WER
    numerator/denominator. Doc-local like token_eval: both texts ride
    the same row, ZERO shuffles at any corpus size. (The CER twin
    needs no UDF at all — F.levenshtein is a JVM codegen expression.)"""
    import pandas as pd

    def _eval(g, e):
        rows = []
        for gt, et in zip(g, e):
            gw, ew = _words(gt or ""), _words(et or "")
            rows.append((seq_edit_distance(gw, ew), len(gw), len(ew)))
        return pd.DataFrame(rows, columns=["wdist", "n_gold_w", "n_ext_w"])

    udf = F.pandas_udf(_eval, "struct<wdist:bigint,n_gold_w:bigint,n_ext_w:bigint>")
    return udf(
        F.col(gold) if isinstance(gold, str) else gold,
        F.col(ext) if isinstance(ext, str) else ext,
    )


def rate_micro(dist, denom) -> Column:
    """Error rate in integer micro-units: floor(1e6 * dist / denom),
    0 when the denominator is empty (never NULL). Can exceed 1e6 when
    the hypothesis is longer than the reference — the standard CER/WER
    convention (rates are not capped)."""
    return (
        F.when(denom > 0, F.floor(dist * F.lit(MICRO) / denom))
        .otherwise(F.lit(0))
        .cast("long")
    )
