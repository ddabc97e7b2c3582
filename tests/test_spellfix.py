"""SymSpell dictionary correction (operators/spellfix.py): exact
equality vs the pure-python twin, edit-distance semantics, argmax
tie-breaking, and the broadcast/shuffle regime parity."""

from __future__ import annotations

import pytest

from pmocr_spark.operators.spellfix import (
    deletion_variants,
    reference_corrections,
    spell_corrections,
)

VOCAB = {
    # trusted dictionary (freq >= 8)
    "recognition": 40,
    "pipeline": 35,
    "document": 30,
    "documents": 25,  # a near-neighbour of 'document' itself
    "spark": 20,
    "extract": 12,
    # rare near-words an OCR pass would emit
    "recognltion": 1,   # substitution (i -> l)
    "pipelne": 1,       # deletion
    "documentt": 2,     # insertion
    "dokument": 1,      # substitution
    "zzzzqqq": 1,       # no neighbour -> no correction
    "ext": 1,           # below min_len -> not a target
}


def _wfd(spark, vocab=VOCAB):
    return spark.createDataFrame(
        [(w, f) for w, f in vocab.items()], "word string, freq long"
    )


def test_matches_python_reference(spark):
    got = {
        r["wrong"]: (r["corrected"], r["freq"])
        for r in spell_corrections(_wfd(spark)).collect()
    }
    assert got == reference_corrections(VOCAB)
    # and the corrections are the intended ones
    assert got["recognltion"] == ("recognition", 40)
    assert got["pipelne"] == ("pipeline", 35)
    assert "zzzzqqq" not in got and "ext" not in got


def test_insertion_corrects_to_highest_freq_neighbour():
    ref = reference_corrections(VOCAB)
    # 'documentt' is ED1 from both 'document' (30) and 'documents'
    # (25): the argmax must pick the more frequent one
    assert ref["documentt"] == ("document", 30)


def test_tie_breaks_lexicographically(spark):
    vocab = {"aaab": 10, "aaac": 10, "aaa": 1}
    got = spell_corrections(
        _wfd(spark, vocab), min_len=3
    ).collect()
    assert [(r["wrong"], r["corrected"]) for r in got] == [("aaa", "aaab")]


def test_shuffle_regime_equals_broadcast(spark):
    wfd = _wfd(spark)
    a = sorted(map(tuple, spell_corrections(wfd).collect()))
    b = sorted(
        map(tuple, spell_corrections(wfd, broadcast_dict=False).collect())
    )
    assert a == b


def test_deletion_variants_are_distinct_and_complete(spark):
    rows = deletion_variants(
        spark.createDataFrame([("abca", 5)], "word string, freq long")
    ).collect()
    vs = {r["variant"] for r in rows}
    assert vs == {"abca", "bca", "aca", "abc", "aba"}
    assert len(rows) == len(vs)  # duplicates collapsed pre-explode


def test_spell_fix_cli(spark, tmp_path):
    """--spell-fix end to end: the corpus's own frequent vocabulary
    corrects its rare near-words in place; clean rows byte-identical,
    counter accurate, case-insensitive token match."""
    from pmocr_spark import cli

    rows = [(i, "recognition pipeline document spark extract") for i in range(12)]
    rows.append((100, "the Recognltion pipelne works, zzzzqqq"))
    din = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(din)
    out = str(tmp_path / "fixed")
    cli.main(["--spell-fix", "--input", din, "--output", out,
              "--master", "local[2]"])
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[100]["text"] == "the recognition pipeline works, zzzzqqq"
    assert got[100]["n_spellfixed"] == 2
    for i in range(12):
        assert got[i]["text"] == rows[i][1] and got[i]["n_spellfixed"] == 0
