"""DSIR importance-weighting semantics (q35 part='dsir') on a crafted
corpus where the target and off-target vocabularies are disjoint, so the
sign of the log importance weight is forced."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dsir_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dsir_docs")
    rows = []
    # 4 en docs over vocabulary {aa bb cc}; 4 de docs over {xx yy zz};
    # one de doc written entirely in the en vocabulary (should score
    # like the en docs — DSIR scores content, not the lang label)
    for i in range(4):
        rows.append((i, "aa bb cc aa bb cc aa bb", "en", "s0", 8))
    for i in range(4, 8):
        rows.append((i, "xx yy zz xx yy zz xx yy", "de", "s0", 8))
    rows.append((8, "aa bb cc aa bb cc aa bb", "de", "s0", 8))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def _dsir_rows(spark, dsir_dir):
    from pmocr_spark.queries import QUERY_FNS

    out = QUERY_FNS["q35_stratified_sample"](spark, dsir_dir)
    return {
        int(r["k2"]): r
        for r in out.filter(F.col("part") == "dsir").collect()
    }


def test_target_vocab_scores_positive(spark, dsir_dir):
    rows = _dsir_rows(spark, dsir_dir)
    assert len(rows) == 9
    for i in range(4):  # en docs: target-like
        assert rows[i]["score_u"] > 0 and rows[i]["n2"] == 1
    for i in range(4, 8):  # de docs on disjoint vocab: raw-only
        assert rows[i]["score_u"] < 0 and rows[i]["n2"] == 0


def test_scores_content_not_label(spark, dsir_dir):
    # the de-labelled doc written in the en vocabulary scores exactly
    # like the en docs: the weight depends on hashed content only
    rows = _dsir_rows(spark, dsir_dir)
    assert rows[8]["score_u"] == rows[0]["score_u"]
    assert rows[8]["n2"] == 1


def test_identical_docs_identical_scores(spark, dsir_dir):
    rows = _dsir_rows(spark, dsir_dir)
    assert len({rows[i]["score_u"] for i in range(4)}) == 1
    assert len({rows[i]["score_u"] for i in range(4, 8)}) == 1
    assert all(rows[i]["n1"] == 8 for i in rows)
