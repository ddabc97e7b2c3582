"""Driver-style correctness gate, run locally: every queries() entry vs
its DuckDB oracle at sf0.001 — row count, column names, and
order-insensitive exact value equality (both sides round doubles
identically, so comparison is exact, not approximate)."""

from __future__ import annotations

import math

import duckdb
import pytest

import os

SF_DIR = os.environ.get("PMOCR_PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        r = round(v, 6)
        return 0.0 if r == 0 else r  # fold -0.0 into 0.0
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return round(float(v), 6)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _query_names():
    from pmocr_spark.queries import ORACLES, QUERY_FNS

    return sorted(QUERY_FNS), ORACLES


_NAMES, _ORACLES = _query_names()


@pytest.mark.parametrize("name", _NAMES)
def test_query_parity(spark, name):
    from pmocr_spark.queries import ORACLES, QUERY_FNS

    sdf = QUERY_FNS[name](spark, SF_DIR)
    spark_pd = sdf.toPandas()
    if name not in ORACLES:
        # rows-only check (driver's weaker gate for non-SQL ops)
        assert len(spark_pd) > 0, f"{name}: empty result"
        return
    duck_pd = _duck(ORACLES[name])
    s_cols, s_rows = _canon(spark_pd)
    d_cols, d_rows = _canon(duck_pd)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    # dtype parity (int32 vs int64 etc. — the driver records schema)
    for c in s_cols:
        sk = spark_pd[c].dtype
        dk = duck_pd[c].dtype
        assert sk == dk or {sk.kind, dk.kind} <= {"O", "U"} or (
            sk.kind == dk.kind == "f"
        ), f"{name}.{c}: dtype {sk} vs {dk}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    mism = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={s_rows[mism[0]]} duck={d_rows[mism[0]]}"
    )
