"""tf-idf keyword extraction (operators/keywords.py): hand-computed
scores, ubiquitous-term zero, tie-break determinism, and the
broadcast-join plan pin (df and N never re-shuffle the corpus)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pmocr_spark.operators.keywords import MICRO, doc_term_freqs, tfidf_topk


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
            (4, "date common"),
        ],
        "doc_id long, text string",
    )


def _tok():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def test_doc_term_freqs(spark):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_term_freqs(_docs(spark), _tok()).collect()
    }
    assert tf[(1, "apple")] == 2 and tf[(3, "cherry")] == 3
    assert tf[(1, "common")] == 1 and len(tf) == 10


def test_tfidf_known_values(spark):
    rows = tfidf_topk(_docs(spark), _tok(), k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 -> 2*ln(4), banana tf=1 df=2 -> ln(2),
    # common df=4 -> 0; ranked by integer micro score then term asc
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["apple", "banana", "common"]
    assert d1[0]["score_micro"] == round(MICRO * 2 * math.log(4))
    assert d1[1]["score_micro"] == round(MICRO * math.log(2))
    assert d1[2]["score_micro"] == 0  # ubiquitous term scores exactly 0
    # doc 3: cherry tf=3 df=2
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "cherry"
    assert d3[0]["score_micro"] == round(MICRO * 3 * math.log(2))
    # every doc has <= k rows and ranks are 1..n
    for doc, rs in by_doc.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))


def test_tfidf_tie_break(spark):
    # two terms with identical (tf, df) tie on score -> term asc decides
    d = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "filler")], "doc_id long, text string"
    )
    rows = sorted(
        (r for r in tfidf_topk(d, _tok(), k=2).collect() if r["doc_id"] == 1),
        key=lambda r: r["rank"],
    )
    assert [r["term"] for r in rows] == ["alpha", "zeta"]
    assert rows[0]["score_micro"] == rows[1]["score_micro"]


def test_cli_keywords(spark, tmp_path, capsys):
    from pmocr_spark import cli

    src = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(src)
    out = str(tmp_path / "kw")
    cli.main([
        "--keywords", "2", "--input", src, "--output", out,
        "--master", "local[2]",
    ])
    rows = spark.read.parquet(out).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 4 and all(len(v) <= 2 for v in by_doc.values())
    top1 = {r["doc_id"]: r["term"] for r in rows if r["rank"] == 1}
    assert top1[1] == "apple" and top1[3] == "cherry" and top1[4] == "date"
    assert "top-2 tfidf keywords for 4 docs" in capsys.readouterr().out

    import pytest as _pytest

    with _pytest.raises(SystemExit):  # standalone-mode guard
        cli.main(["--keywords", "2", "--batch", "--input", src, "--blobs", "b",
                  "--output", out, "--lineage", "l", "--master", "local[2]"])
    with _pytest.raises(SystemExit):  # K >= 1
        cli.main(["--keywords", "0", "--input", src, "--output", out,
                  "--master", "local[2]"])


def test_tfidf_plan_broadcasts(spark):
    """The idf join and the N join must be broadcast: the corpus-sized
    tf table re-shuffles only for the per-doc window."""
    from pmocr_spark.plans import shape

    out = tfidf_topk(_docs(spark), _tok(), k=3)
    plan = shape.formatted_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_kwic_contexts_and_edges(spark):
    """KWIC: every occurrence reported at its 1-based position with
    window-bounded contexts; document-edge occurrences get truncated
    (possibly empty) contexts; repeated terms fan out one row per
    occurrence; absent terms yield zero rows. Plan: map-only."""
    from pyspark.sql import functions as F

    from pmocr_spark.operators.keywords import kwic

    docs = spark.createDataFrame(
        [
            (1, "cat sat on the mat"),
            (2, "cat cat dog"),
            (3, "no match here"),
            (4, "cat"),
        ],
        "doc_id long, text string",
    )
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    got = {
        (r["doc_id"], r["pos"]): (r["left_ctx"], r["right_ctx"])
        for r in kwic(docs, toks, "cat", window=2).collect()
    }
    assert got[(1, 1)] == ("", "sat on")
    assert got[(2, 1)] == ("", "cat dog")
    assert got[(2, 2)] == ("cat", "dog")
    assert got[(4, 1)] == ("", "")  # single-token doc: both empty
    assert not any(d == 3 for d, _ in got)
    # middle occurrence: full two-sided window
    got2 = {
        (r["doc_id"], r["pos"]): (r["left_ctx"], r["right_ctx"])
        for r in kwic(docs, toks, "on", window=2).collect()
    }
    assert got2[(1, 3)] == ("cat sat", "the mat")

    from pmocr_spark.plans import shape

    plan = shape.formatted_plan(kwic(docs, toks, "cat"))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan, plan


def test_cli_kwic(spark, tmp_path, capsys):
    """--kwic e2e: occurrences with contexts land in --output; window
    knob honored; guards fire."""
    import pytest as _pytest

    from pmocr_spark import cli

    src = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(src)
    out = str(tmp_path / "kwic")
    cli.main(["--kwic", "apple", "--input", src, "--output", out,
              "--kwic-window", "1", "--master", "local[2]"])
    rows = spark.read.parquet(out).collect()
    assert rows and all(r["term"] == "apple" for r in rows)
    assert all(len(r["left_ctx"].split()) <= 1 for r in rows)
    assert "occurrences of 'apple'" in capsys.readouterr().out

    with _pytest.raises(SystemExit):  # empty term
        cli.main(["--kwic", "  ", "--input", src, "--output", out,
                  "--master", "local[2]"])
    with _pytest.raises(SystemExit):  # knob guard
        cli.main(["--kwic-window", "1", "--input", src, "--output", out,
                  "--master", "local[2]"])


# ---------------------------------------------------------------- RAKE


def _ref_rake(text: str, stopwords=("the", "a", "and", "of", "to", "in")):
    """Independent pure-python RAKE (Rose et al. 2010) with the
    operator's integer micro-unit word scores. Returns
    {phrase: score_u} over per-occurrence member sums."""
    import math
    import re

    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    phrases, cur = [], []
    for t in toks:
        if t in stopwords:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        phrases.append(cur)
    deg, freq = {}, {}
    for p in phrases:
        for t in p:
            deg[t] = deg.get(t, 0) + len(p)
            freq[t] = freq.get(t, 0) + 1
    ws = {t: math.floor(1000000.0 * deg[t] / freq[t] + 0.5) for t in deg}
    out = {}
    for p in phrases:
        key = " ".join(p)
        out[key] = sum(ws[t] for t in p)
    return out


def test_rake_matches_reference(spark):
    from pmocr_spark.operators.keywords import rake_topk

    texts = [
        (1, "deep learning of neural networks and the gradient descent "
            "of deep networks"),
        (2, "minimal keyword extraction of a short text and the keyword "
            "extraction again"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["phrase"]): r["score_u"]
        for r in rake_topk(df, F.split(F.lower(F.trim("text")), r"\s+"), k=100).collect()
    }
    for doc_id, text in texts:
        ref = _ref_rake(text)
        mine = {p: s for (d, p), s in got.items() if d == doc_id}
        assert mine == ref, (doc_id, mine, ref)


def test_rake_all_stopword_doc_is_empty(spark):
    from pmocr_spark.operators.keywords import rake_topk

    df = spark.createDataFrame(
        [(1, "the a and of to in"), (2, "real content here")],
        "doc_id long, text string",
    )
    rows = rake_topk(df, F.split(F.lower(F.trim("text")), r"\s+"), k=5).collect()
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["phrase"] == "real content here"
    # single phrase of length 3: every member scores deg/freq = 3/1
    assert rows[0]["score_u"] == 3 * 3000000


def test_rake_tie_breaks_on_phrase_asc(spark):
    from pmocr_spark.operators.keywords import rake_topk

    # two structurally identical length-2 phrases with disjoint words:
    # equal scores, so the lexically smaller phrase must rank first
    df = spark.createDataFrame(
        [(1, "zeta omega and beta gamma")], "doc_id long, text string"
    )
    rows = rake_topk(df, F.split(F.lower(F.trim("text")), r"\s+"), k=2).collect()
    got = [(r["rank"], r["phrase"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == [(1, "beta gamma"), (2, "zeta omega")]


def test_rake_plan_single_corpus_shuffle(spark):
    """The phrase-id window is the ONLY corpus-keyed exchange; every
    later agg/join reuses its doc_id partitioning (plus the bounded
    rank window) — no cartesian, no Python."""
    from pmocr_spark.operators.keywords import rake_topk
    from pmocr_spark.plans import shape

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = rake_topk(df, F.split(F.lower(F.trim("text")), r"\s+"), k=1)
    plan = shape.formatted_plan(r)
    assert shape.count_exchanges(r) <= 2, plan
    assert not shape.has_cartesian(r), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cli_keywords_rake(spark, tmp_path, capsys):
    """--keywords K --keyword-method rake e2e: phrase rows land in
    --output; knob guard fires without its mode."""
    import pytest as _pytest

    from pmocr_spark import cli

    src = str(tmp_path / "rdocs.parquet")
    spark.createDataFrame(
        [(1, "deep learning of neural networks and the gradient descent")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "rake")
    cli.main(["--keywords", "2", "--keyword-method", "rake",
              "--input", src, "--output", out, "--master", "local[2]"])
    rows = spark.read.parquet(out).collect()
    assert {r["phrase"] for r in rows} <= {"deep learning", "neural networks",
                                           "gradient descent"}
    assert len(rows) == 2 and all(r["score_u"] > 0 for r in rows)
    assert "rake keywords" in capsys.readouterr().out

    with _pytest.raises(SystemExit):  # knob without its mode
        cli.main(["--keyword-method", "rake", "--input", src,
                  "--output", out, "--master", "local[2]"])


def test_q44_zipf_slope_on_zipfian_corpus(spark, tmp_path):
    """Zipf arm: on a constructed corpus with freq(r) = 256//r the
    slope row equals the pure-python micro-unit least squares exactly
    and sits near -1e6 (the Zipf law); per-term rows pin the ranking."""
    import math

    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    words = []
    freqs = {}
    for r in range(1, 21):
        wd = f"w{r:02d}"
        freqs[wd] = 256 // r
        words += [wd] * freqs[wd]
    rows = [(1, " ".join(words))]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("src0")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.bigram: r.cnt
        for r in QUERY_FNS["q44_bigram_lm_topk"](spark, str(tmp_path))
        .filter(F.col("part") == "zipf")
        .collect()
    }
    # ranking pinned: w01 rank 1, w02 rank 2, ...
    assert got["w01"] == 1 and got["w02"] == 2 and got["w20"] == 20
    # exact replication of the integer-micro least squares
    pts = [
        (round(1e6 * math.log(r)), round(1e6 * math.log(freqs[f"w{r:02d}"])))
        for r in range(1, 21)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    want = round(1e6 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert got["__slope__"] == want
    assert -1_200_000 < want < -800_000
