"""TextTiling arm (q46 part='tile'): hand-constructed topic shift is
found at the exact gap, uniform text yields no boundary, short docs are
empty, and the depth/key arithmetic matches by-hand values."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pmocr_spark.queries import QUERY_FNS

TOPIC_A = "alpha beta gamma delta epsilon zeta eta theta"
TOPIC_B = "ink jar kite lime moon nest oak pine"


def _run(spark, tmp_path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return [
        r
        for r in QUERY_FNS["q46_pack_sequences"](spark, str(tmp_path)).collect()
        if r.part == "tile"
    ]


def test_topic_shift_found_at_exact_gap(spark, tmp_path):
    # blocks: A A B B -> interior gap 2 (token pos 16) has cohesion 0
    # between A-block and B-block; s1 = s3 = 8 (8 distinct terms, each
    # 1x1), so depth = 8 + 8 - 0 = 16
    rows = [(1, f"{TOPIC_A} {TOPIC_A} {TOPIC_B} {TOPIC_B}")]
    got = _run(spark, tmp_path, rows)
    assert len(got) == 1
    r = got[0]
    assert (r.doc_id, r.cum_before, r.bin, r.n_tokens) == (1, 16, 0, 16)
    # key pins the slice: the 8 tokens after the cut = first B block
    assert r.key == hashlib.md5(TOPIC_B.encode()).hexdigest()


def test_uniform_text_has_no_boundary(spark, tmp_path):
    rows = [(2, " ".join(["word"] * 40))]
    assert _run(spark, tmp_path, rows) == []


def test_short_doc_is_empty(spark, tmp_path):
    # 24 tokens -> K = 2 gaps, no interior gap
    rows = [(3, f"{TOPIC_A} {TOPIC_B} {TOPIC_A}")]
    assert _run(spark, tmp_path, rows) == []


def test_tile_rows_present_on_gate_corpus(spark):
    rows = (
        QUERY_FNS["q46_pack_sequences"](spark, "/root/testdata/sf0.001")
        .filter(F.col("part") == "tile")
        .collect()
    )
    assert rows, "gate corpus must exercise the tile arm"
    for r in rows:
        assert r.n_tokens >= 2 and r.cum_before % 8 == 0
