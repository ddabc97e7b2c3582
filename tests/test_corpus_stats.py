"""Deterministic HyperLogLog (operators/corpus_stats): register parity
with a pure-python twin, the element-wise-max merge law that makes the
sketch a valid Spark partial aggregate, and estimator accuracy against
exact distinct counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pmocr_spark.operators.corpus_stats import (
    HLL_M,
    hll_estimate,
    hll_sketch,
)


def _py_registers(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, w = h % HLL_M, h // HLL_M
        rank = 25 if w == 0 else 25 - len(bin(w)[2:])
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def _df(spark, ids, grp="g"):
    return spark.createDataFrame([(grp, i) for i in ids], "grp string, v long")


def test_registers_match_python(spark):
    ids = list(range(500))
    got = {
        r["bucket"]: r["rank"]
        for r in hll_sketch(_df(spark, ids), F.col("v"), ["grp"]).collect()
    }
    assert got == _py_registers(ids)


def test_merge_is_elementwise_max(spark):
    """Union semantics: sketch(A ∪ B) == max-merge of the two sketches —
    the property that lets per-partition partial sketches combine
    associatively (and lets persisted sketches from separate ingest
    batches merge without touching raw data)."""
    a, b = list(range(300)), list(range(150, 450))
    sk = lambda ids: hll_sketch(_df(spark, ids), F.col("v"), ["grp"])  # noqa: E731
    union = {r["bucket"]: r["rank"] for r in sk(a + b).collect()}
    merged = {
        r["bucket"]: r["rank"]
        for r in sk(a).unionAll(sk(b)).groupBy("grp", "bucket").agg(
            F.max("rank").alias("rank")
        ).collect()
    }
    assert union == merged


def test_estimate_accuracy(spark):
    """m=256 -> ~6.5% standard error; assert within 3 sigma at several
    cardinalities spanning the linear-counting and raw regimes."""
    for n in (40, 300, 2000, 20000):
        regs = hll_sketch(_df(spark, range(n)), F.col("v"), ["grp"])
        est = hll_estimate(regs, ["grp"]).collect()[0]["n_distinct_est"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_estimate_multi_group_and_duplicates(spark):
    """Duplicates never move a register (distinct semantics), and groups
    estimate independently in one pass."""
    df = _df(spark, list(range(1000)) * 3, grp="big").unionAll(
        _df(spark, list(range(100)) * 5, grp="small")
    )
    regs = hll_sketch(df, F.col("v"), ["grp"])
    ests = {r["grp"]: r["n_distinct_est"] for r in hll_estimate(regs, ["grp"]).collect()}
    assert abs(ests["big"] - 1000) / 1000 < 0.20, ests
    assert abs(ests["small"] - 100) / 100 < 0.20, ests


# --------------------------- Count-Min sketch ------------------------

from pmocr_spark.operators.corpus_stats import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_query,
    cms_sketch,
)


def _py_cms(stream):
    from collections import Counter

    counters = Counter()
    for v in stream:
        for i in range(CMS_D):
            col = int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:8], 16) % CMS_W
            counters[(i, col)] += 1
    return counters


def _stream():
    # zipf-ish deterministic stream: word k appears ~200//(k+1) times
    return [f"w{k}" for k in range(60) for _ in range(200 // (k + 1))]


def test_cms_counters_match_python(spark):
    stream = _stream()
    df = spark.createDataFrame([(s,) for s in stream], "word string")
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(df, F.col("word")).collect()
    }
    assert got == dict(_py_cms(stream))


def test_cms_one_sided_and_bounded(spark):
    """est >= true for EVERY key (never undercounts), and the classic
    (e/w)*N overestimate bound holds for all probes here."""
    from collections import Counter

    stream = _stream()
    true = Counter(stream)
    df = spark.createDataFrame([(s,) for s in stream], "word string")
    probes = spark.createDataFrame([(w,) for w in true], "word string")
    est = {
        r["word"]: r["est"]
        for r in cms_query(cms_sketch(df, F.col("word")), probes, "word").collect()
    }
    bound = 2.718281828 / CMS_W * len(stream)
    for w, t in true.items():
        assert est[w] >= t, (w, est[w], t)
        assert est[w] - t <= bound, (w, est[w], t, bound)
    # absent key: estimate is 0 or a small collision, never NULL
    ghost = spark.createDataFrame([("never-seen",)], "word string")
    g = cms_query(cms_sketch(df, F.col("word")), ghost, "word").collect()[0]["est"]
    assert 0 <= g <= bound


def test_cms_weighted_equals_stream_and_merge_adds(spark):
    """freq-weighted build == per-occurrence build (what lets q44 reuse
    the cached word-frequency table), and counters from separate
    batches merge by ADDITION."""
    from collections import Counter

    stream = _stream()
    df = spark.createDataFrame([(s,) for s in stream], "word string")
    wf = spark.createDataFrame(
        [(w, c) for w, c in Counter(stream).items()], "word string, freq long"
    )
    per_occ = {
        (r["row"], r["col"]): r["cnt"] for r in cms_sketch(df, F.col("word")).collect()
    }
    weighted = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(wf, F.col("word"), weight=F.col("freq")).collect()
    }
    assert per_occ == weighted

    half = len(stream) // 2
    a = spark.createDataFrame([(s,) for s in stream[:half]], "word string")
    b = spark.createDataFrame([(s,) for s in stream[half:]], "word string")
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_sketch(a, F.col("word"))
        .unionAll(cms_sketch(b, F.col("word")))
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert merged == per_occ


def test_pmi_topk_hand_computed(spark):
    """PMI on a 3-word corpus where one bigram is a perfect
    collocation: pmi matches the hand formula, the min_count floor
    drops rare pairs, ties break bigram-asc, and the unigram joins
    broadcast (no corpus-sized shuffle on the vocab key)."""
    import math

    from pmocr_spark.operators.corpus_stats import pmi_topk

    # bigram stream: "a b" x12, "b c" x12, "c a" x6 -> unigrams from
    # the same stream's word incidence
    bigrams = spark.createDataFrame(
        [("a b", 12), ("b c", 12), ("c a", 6), ("a a", 1)],
        "bigram string, cnt long",
    )
    unigrams = spark.createDataFrame(
        [("a", 19), ("b", 24), ("c", 18)], "word string, freq long"
    )
    got = {r["bigram"]: r["pmi_micro"] for r in pmi_topk(bigrams, unigrams, min_count=5).collect()}
    assert "a a" not in got  # min_count floor
    n_w, n_bg = 61.0, 31.0
    for bg, cab, ca, cb in [("a b", 12, 19, 24), ("b c", 12, 24, 18), ("c a", 6, 18, 19)]:
        want = round(1e6 * math.log(cab * n_w * n_w / (n_bg * ca * cb)))
        assert got[bg] == want, bg

    from pmocr_spark.plans import shape

    p = shape.formatted_plan(pmi_topk(bigrams, unigrams, min_count=5))
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "SortMergeJoin" not in p, p
    # top-k compiles to per-partition heaps, not a global sort
    assert "TakeOrderedAndProject" in p, p


def test_llr_topk_hand_computed(spark):
    """Dunning LLR on a small bigram table: matches the textbook 2x2
    contingency formula by hand (including the zero-cell guard via the
    fully-exclusive pair, whose k12/k21 vanish), drops sub-min_count
    pairs, and the margin joins broadcast."""
    import math

    from pmocr_spark.operators.corpus_stats import llr_topk

    # "x y" exclusive but rare; "a b" frequent but a,b also occur apart
    bigrams = spark.createDataFrame(
        [("a b", 40), ("a c", 20), ("c b", 20), ("x y", 6), ("c c", 14), ("y x", 1)],
        "bigram string, cnt long",
    )
    got = {r["bigram"]: r["llr_micro"] for r in llr_topk(bigrams, min_count=5).collect()}
    assert "y x" not in got  # min_count floor

    def llr_hand(k11, ra, cb, n):
        k12, k21, k22 = cb - k11, ra - k11, n - ra - cb + k11
        t = 0.0
        for k, r, c in [
            (k11, ra, cb), (k12, n - ra, cb),
            (k21, ra, n - cb), (k22, n - ra, n - cb),
        ]:
            if k > 0:
                t += k * math.log(k * n / (r * c))
        return round(1e6 * 2.0 * t)

    n = 101.0
    # margins from the bigram table itself: ra('a')=60, cb('b')=60 ...
    assert got["a b"] == llr_hand(40.0, 60.0, 60.0, n)
    # fully exclusive pair: x only precedes y, y only follows x, so
    # k12 = k21 = 0 and only the k11/k22 terms contribute
    assert got["x y"] == llr_hand(6.0, 6.0, 6.0, n)
    assert got["a c"] == llr_hand(20.0, 60.0, 34.0, n)  # cb('c') = 20 + 14

    from pmocr_spark.plans import shape

    p = shape.formatted_plan(llr_topk(bigrams, min_count=5))
    assert p.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_cli_collocations(spark, tmp_path, capsys):
    """--collocations e2e: both methods present, scores match the
    operators run directly on the same tables; standalone-mode and
    knob guards."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pmocr_spark import cli

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "strong tea " * 6 + "powerful computer " * 6) for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "colloc")
    cli.main(["--collocations", "5", "--input", src, "--output", out,
              "--colloc-min-count", "5", "--master", "local[2]"])
    rows = spark.read.parquet(out).collect()
    methods = {r["method"] for r in rows}
    assert methods == {"pmi", "llr"}
    pmi_best = max((r for r in rows if r["method"] == "pmi"),
                   key=lambda r: r["score_micro"])
    assert pmi_best["bigram"] in {"strong tea", "powerful computer"}
    assert "collocations by pmi+llr" in capsys.readouterr().out

    with _pytest.raises(SystemExit):  # standalone guard
        cli.main(["--collocations", "5", "--batch", "--input", src,
                  "--blobs", "b", "--output", out, "--lineage", "l",
                  "--master", "local[2]"])
    with _pytest.raises(SystemExit):  # knob guard
        cli.main(["--colloc-min-count", "5", "--input", src, "--output",
                  out, "--master", "local[2]"])


def test_burstiness_hand_counts(spark):
    """burstiness_topk: cf/df micro score from hand-checkable counts;
    min_cf floor and (burst desc, term asc) ranking."""
    from pmocr_spark.operators.corpus_stats import burstiness_topk
    from pmocr_spark.operators.keywords import doc_term_freqs

    rows = [
        # 'echo' bursts: 6 occurrences packed into 2 docs -> cf/df = 3
        (1, "echo echo echo filler one two"),
        (2, "echo echo echo filler three four"),
        # 'filler' is even: 1 per doc across 3 docs -> cf/df = 1
        (3, "filler five six seven eight nine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tf = doc_term_freqs(df, F.split(F.lower(F.trim("text")), r"\s+"))
    got = {
        r["term"]: (r["cf"], r["df"], r["burst_micro"])
        for r in burstiness_topk(tf, k=10, min_cf=3).collect()
    }
    assert got["echo"] == (6, 2, 3_000_000)
    assert got["filler"] == (3, 3, 1_000_000)
    assert all(cf >= 3 for cf, _, _ in got.values())  # floor applied
    ranked = [r["term"] for r in burstiness_topk(tf, k=10, min_cf=3).collect()]
    assert ranked[0] == "echo"


def test_burstiness_plan_single_agg(spark):
    """One vocabulary-keyed agg + TakeOrderedAndProject — no sort of
    the full stats table, no Python."""
    from pmocr_spark.operators.corpus_stats import burstiness_topk
    from pmocr_spark.operators.keywords import doc_term_freqs
    from pmocr_spark.plans import shape

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tf = doc_term_freqs(docs, F.split(F.lower(F.trim("text")), r"\s+"))
    b = burstiness_topk(tf, k=20)
    plan = shape.formatted_plan(b)
    assert "TakeOrderedAndProject" in plan, plan
    assert shape.count_exchanges(b) <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q30_eqdepth_bucket_properties(spark):
    """Equi-depth histogram arm: 8 buckets, counts differ by <= 1,
    boundaries non-decreasing, counts sum to the corpus size."""
    from pmocr_spark.queries import QUERY_FNS

    rows = [
        r
        for r in QUERY_FNS["q30_distinct_sources"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.part == "eqdepth"
    ]
    assert len(rows) == 8
    by_bucket = sorted(rows, key=lambda r: int(r.k1))
    counts = [r.n for r in by_bucket]
    assert max(counts) - min(counts) <= 1
    bounds = [int(r.k2) for r in by_bucket]
    assert bounds == sorted(bounds)
    import duckdb

    n = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert sum(counts) == n


def test_q30_heaps_curve_properties(spark):
    """Heaps arm: deciles cover the corpus, cumulative curve is
    monotone and concave-ish (early deciles introduce most new terms on
    a Heaps-law corpus), final cumulative == total distinct vocab."""
    import duckdb

    from pmocr_spark.queries import QUERY_FNS

    rows = sorted(
        (
            (int(r.k1), int(r.k2), r.n)
            for r in QUERY_FNS["q30_distinct_sources"](
                spark, "/root/testdata/sf0.001"
            ).collect()
            if r.part == "heaps"
        )
    )
    assert [d for d, _, _ in rows] == sorted({d for d, _, _ in rows})
    cums = [c for _, c, _ in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(n for _, _, n in rows)
    vocab = duckdb.sql(
        "SELECT count(DISTINCT t) FROM (SELECT unnest(string_split_regex("
        "lower(trim(text)), '\\s+')) AS t FROM "
        "'/root/testdata/sf0.001/documents.parquet') WHERE t <> ''"
    ).fetchone()[0]
    assert cums[-1] == vocab
    # first decile dominates growth on a closed-vocabulary corpus
    assert rows[0][2] == max(n for _, _, n in rows)


def test_q30_kanon_release_properties(spark):
    """k-anonymity arm: every released group has >= k records, the
    suppressed tally accounts for exactly the remaining records, and
    both classes are present on the gate corpus."""
    import duckdb

    from pmocr_spark.queries import QUERY_FNS

    rows = [
        r
        for r in QUERY_FNS["q30_distinct_sources"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.part == "kanon"
    ]
    rel = [r for r in rows if r.k1 != "__suppressed__"]
    sup = [r for r in rows if r.k1 == "__suppressed__"]
    assert rel and len(sup) == 1
    assert all(r.n >= 5 for r in rel)
    total = duckdb.sql(
        "SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n for r in rel) + sup[0].n == total
    assert sup[0].n > 0  # suppression actually exercised


def test_q30_corr_and_gini(spark, tmp_path):
    """corr/gini arms: hand-checkable distributions — perfectly
    length-proportional docs give r = 1e6; a maximally skewed source
    mix gives the closed-form Gini; the balanced gate corpus gives 0."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    rows = [
        # y = x/10 exactly -> r = 1.0; sources: 8 docs on srcA, 2 on srcB
        (i, " ".join(["w"] * (10 * (i + 1))), "srcA" if i < 8 else "srcB")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df = df.withColumn("n_chars", F.length("text")).withColumn("lang", F.lit("en"))
    df.write.parquet(str(tmp_path / "documents.parquet"))
    # q30's nusers/hll arms read events too — a one-row stand-in
    spark.range(1).select(
        F.col("id").alias("event_id"),
        F.current_timestamp().alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r.part: (int(r.k2), r.n)
        for r in QUERY_FNS["q30_distinct_sources"](spark, str(tmp_path)).collect()
        if r.part in ("corr", "gini")
    }
    # chars = 2*tokens - 1 exactly (spaces) -> perfect linearity
    assert got["corr"] == (1000000, 10)
    # counts sorted [2, 8]: G = (2*(1*2+2*8))/(2*10) - 3/2 = 0.3
    assert got["gini"] == (300000, 2)
    # balanced gate corpus: 20 sources x 25 docs -> exactly 0
    gate = {
        r.part: int(r.k2)
        for r in QUERY_FNS["q30_distinct_sources"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.part in ("corr", "gini")
    }
    assert gate["gini"] == 0 and gate["corr"] > 990000
