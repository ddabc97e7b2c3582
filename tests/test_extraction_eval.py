"""Extraction-quality eval (operators/extraction_eval.py): known-value
P/R/F1, multiset (not set) intersection semantics, empty-side zeros,
the map-only plan pin, and the CER/WER edit-distance DP vs a
pure-python textbook reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmocr_spark.operators.extraction_eval import (
    MICRO,
    edit_eval,
    micro_scores,
    rate_micro,
    seq_edit_distance,
    token_eval,
)


def _ref_edit_distance(a, b):
    """Textbook O(nm) Wagner-Fischer, pure python, no tricks."""
    n, m = len(a), len(b)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[m]


def _scores(spark, gold, ext):
    df = spark.createDataFrame([(gold, ext)], "g string, e string")
    row = df.select(token_eval("g", "e").alias("s")).select("s.*").collect()[0]
    prec, rec, f1 = micro_scores(F.col("tp"), F.col("n_gold"), F.col("n_ext"))
    out = (
        df.select(token_eval("g", "e").alias("s"))
        .select("s.*")
        .select(prec.alias("p"), rec.alias("r"), f1.alias("f"))
        .collect()[0]
    )
    return (row["tp"], row["n_gold"], row["n_ext"], out["p"], out["r"], out["f"])


def test_known_values(spark):
    # gold: 4 tokens; ext: 3 correct + 1 wrong -> tp=3, P=R=750000
    tp, ng, ne, p, r, f = _scores(spark, "a b c d", "a b c x")
    assert (tp, ng, ne) == (3, 4, 4)
    assert p == r == f == 750_000

    # multiset semantics: gold has 'a' twice, ext once -> tp counts min
    tp, ng, ne, p, r, f = _scores(spark, "a a b", "a b b")
    assert (tp, ng, ne) == (2, 3, 3)  # min(2,1) + min(1,2)
    assert p == r == f == 666_666  # floor(2e6/3)

    # perfect extraction
    tp, ng, ne, p, r, f = _scores(spark, "x y", "x y")
    assert (tp, p, r, f) == (2, MICRO, MICRO, MICRO)

    # asymmetric counts: P and R diverge, F1 is the harmonic combine
    tp, ng, ne, p, r, f = _scores(spark, "a b c d", "a b")
    assert (tp, ng, ne) == (2, 4, 2)
    assert (p, r) == (MICRO, 500_000)
    assert f == 666_666  # 2*2e6 // 6


def test_empty_sides(spark):
    assert _scores(spark, "a b", "") == (0, 2, 0, 0, 0, 0)
    assert _scores(spark, "", "a b") == (0, 0, 2, 0, 0, 0)
    assert _scores(spark, "", "") == (0, 0, 0, 0, 0, 0)
    # None behaves as empty
    df = spark.createDataFrame([(None, "a")], "g string, e string")
    row = df.select(token_eval("g", "e").alias("s")).select("s.*").collect()[0]
    assert (row["tp"], row["n_gold"], row["n_ext"]) == (0, 0, 1)


def test_seq_edit_distance_known():
    assert seq_edit_distance(list("kitten"), list("sitting")) == 3
    assert seq_edit_distance([], []) == 0
    assert seq_edit_distance(["a", "b"], []) == 2
    assert seq_edit_distance([], ["x"]) == 1
    assert seq_edit_distance(["a", "b", "c"], ["a", "b", "c"]) == 0
    # word-level: one substitution + one deletion
    assert seq_edit_distance("the cat sat here".split(), "the bat sat".split()) == 2


def test_seq_edit_distance_vs_reference():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.sampled_from(["a", "b", "c", "ab", ""])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(tok, max_size=12), st.lists(tok, max_size=12))
    def check(a, b):
        assert seq_edit_distance(a, b) == _ref_edit_distance(a, b)

    check()


def test_edit_eval_spark(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat here", "the bat sat"),
            ("a b", ""),
            ("", "x y z"),
            (None, "x"),
            ("a  b", "a b"),  # double space: empty token counts (split(' '))
        ],
        "g string, e string",
    )
    rows = df.select(edit_eval("g", "e").alias("w")).select("w.*").collect()
    assert (rows[0]["wdist"], rows[0]["n_gold_w"], rows[0]["n_ext_w"]) == (2, 4, 3)
    assert (rows[1]["wdist"], rows[1]["n_gold_w"], rows[1]["n_ext_w"]) == (2, 2, 0)
    assert (rows[2]["wdist"], rows[2]["n_gold_w"]) == (3, 0)
    assert (rows[3]["wdist"], rows[3]["n_gold_w"]) == (1, 0)  # None == empty
    assert (rows[4]["wdist"], rows[4]["n_gold_w"]) == (1, 3)  # drop the '' token


def test_rate_micro(spark):
    df = spark.createDataFrame([(3, 4), (0, 0), (5, 2)], "d long, n long")
    out = df.select(rate_micro(F.col("d"), F.col("n")).alias("r")).collect()
    assert [r["r"] for r in out] == [750_000, 0, 2_500_000]  # rates uncapped


def test_map_only_plan(spark):
    from pmocr_spark.plans import shape

    df = spark.createDataFrame([("a", "a")] * 4, "g string, e string")
    out = df.select(token_eval("g", "e").alias("s")).select("s.*")
    assert shape.count_exchanges(out) == 0, shape.formatted_plan(out)
    assert "BatchEvalPython" not in shape.formatted_plan(out)


def test_cli_eval_extraction(spark, tmp_path, capsys):
    """E2E: grade a degraded extraction table against gold via the CLI,
    including a gold doc the pipeline never produced (recall 0)."""
    from pmocr_spark import cli

    gold_src = str(tmp_path / "gold.parquet")
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, "m n o")],
        "doc_id long, text string",
    ).write.parquet(gold_src)
    ext_src = str(tmp_path / "ext.parquet")
    spark.createDataFrame(
        [(1, "a b c"), (2, "x y")],  # doc 3 missing entirely
        "doc_id long, txt string",
    ).write.parquet(ext_src)
    out = str(tmp_path / "scores")
    cli.main([
        "--eval-extraction", gold_src, "--input", ext_src, "--output", out,
        "--text-col", "txt", "--master", "local[2]",
    ])
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["tp"] == 3 and rows[1]["rec_micro"] == 750_000
    assert rows[1]["prec_micro"] == 1_000_000
    assert rows[2]["f1_micro"] == 1_000_000
    assert rows[3]["tp"] == 0 and rows[3]["n_ext"] == 0  # never extracted
    assert rows[3]["rec_micro"] == 0 and rows[3]["f1_micro"] == 0
    # CER/WER: doc 1 drops ' d' -> cdist 2/7 chars, wdist 1/4 words
    assert rows[1]["cdist"] == 2 and rows[1]["cer_micro"] == 2_000_000 // 7
    assert rows[1]["wdist"] == 1 and rows[1]["wer_micro"] == 250_000
    assert rows[2]["cer_micro"] == 0 and rows[2]["wer_micro"] == 0
    # never-extracted doc scores 100% error both ways
    assert rows[3]["cer_micro"] == MICRO and rows[3]["wer_micro"] == MICRO
    cap = capsys.readouterr().out
    assert "micro P=" in cap and "macro F1=" in cap
    assert "CER=" in cap and "WER=" in cap

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.main(["--eval-extraction", gold_src, "--batch", "--input", ext_src,
                  "--blobs", "b", "--output", out, "--lineage", "l",
                  "--master", "local[2]"])
    with _pytest.raises(SystemExit):  # missing text col
        cli.main(["--eval-extraction", gold_src, "--input", ext_src,
                  "--output", out, "--text-col", "nope", "--master", "local[2]"])


def test_rouge2_bigram_overlap_semantics(spark):
    """ROUGE-2 as token_eval over chr(1)-joined bigram tokens: the
    clipped bigram overlap matches a hand Counter computation,
    including the repeated-bigram clipping case, and chr(1) survives
    token_eval's whitespace split (chr(31) would not — it is Python
    whitespace)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from pmocr_spark.operators.extraction_eval import token_eval

    gold = "a b a b a"          # bigrams: ab ba ab ba (ab x2, ba x2)
    ext = "a b a c a b"         # bigrams: ab ba ac ca ab (ab x2, ba x1)
    def bigrams(t):
        w = t.split(" ")
        return [w[i] + "\x01" + w[i + 1] for i in range(len(w) - 1)]

    gb, xb = bigrams(gold), bigrams(ext)
    gc, xc = Counter(gb), Counter(xb)
    want_tp = sum(min(c, xc[k]) for k, c in gc.items())
    assert want_tp == 3  # ab clipped at 2, ba clipped at 1

    df = spark.createDataFrame([(" ".join(gb), " ".join(xb))], "g string, x string")
    row = df.select(token_eval("g", "x").alias("s")).select("s.*").collect()[0]
    assert (row["tp"], row["n_gold"], row["n_ext"]) == (3, len(gb), len(xb))

    # the joiner matters: chr(31) IS Python whitespace, so it would
    # split bigrams back into unigrams inside token_eval
    assert "a\x1fb".split() == ["a", "b"]
    assert "a\x01b".split() == ["a\x01b"]
