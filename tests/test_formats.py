"""Source/sink format coverage (S1/S4 family): parquet (primary), ORC,
JSON, CSV round-trips preserve row counts and values; binaryFile covered
in test_sources.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _norm(df):
    # compare on epoch seconds (CSV/JSON lose timestamp precision class)
    return {
        (r["event_id"], r["user_id"], r["event_type"], round(r["value"], 4))
        for r in df.select("event_id", "user_id", "event_type", "value").collect()
    }


def test_orc_roundtrip(spark, events, tmp_path):
    p = str(tmp_path / "ev_orc")
    events.write.orc(p)
    back = spark.read.orc(p)
    assert _norm(back) == _norm(events)


def test_json_roundtrip(spark, events, tmp_path):
    p = str(tmp_path / "ev_json")
    events.write.json(p)
    back = spark.read.schema(events.schema).json(p)
    assert _norm(back) == _norm(events)


def test_csv_roundtrip(spark, events, tmp_path):
    p = str(tmp_path / "ev_csv")
    # props contains commas/quotes — exercise quoting
    events.write.option("header", True).option("quoteAll", True).csv(p)
    back = spark.read.schema(events.schema).option("header", True).csv(p)
    assert _norm(back) == _norm(events)


def test_parquet_predicate_pushdown_all_formats(spark, events, tmp_path):
    """Only parquet/orc scans support pushdown; confirm the engine's
    primary format pushes while CSV does not silently change results."""
    from pmocr_spark.plans import shape

    p = str(tmp_path / "ev_parq")
    events.write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("user_id") == 7).select("event_id")
    assert shape.has_pushed_filters(df)
    n_parq = df.count()
    pc = str(tmp_path / "ev_csv2")
    events.write.option("header", True).csv(pc)
    n_csv = (
        spark.read.schema(events.schema)
        .option("header", True)
        .csv(pc)
        .filter(F.col("user_id") == 7)
        .count()
    )
    assert n_parq == n_csv
