"""BPE vocabulary learning: distributed merge loop vs a pure-python
Sennrich-style reference, greedy-fold equivalence, encode round-trip."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import bpe

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- reference


def _ref_scan(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge scan (the reference
    implementation's apply step)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(texts: list[str], n_merges: int, min_count: int = 2):
    """Single-node reference BPE (Sennrich ACL'16): word-freq table,
    argmax adjacent pair per iteration, tie-break (count desc, pair asc).
    Tokenization = the module's shared ASCII-\\s+ tokenizer (the
    invariant under test is the BPE algorithm, not the split)."""
    wf = Counter(w for t in texts for w in bpe._tokenize(t))
    syms = {w: list(w) + [bpe.END_OF_WORD] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best_cnt = max(pc.values())
        if best_cnt < min_count:
            break
        left, right = min(p for p, c in pc.items() if c == best_cnt)
        merges.append((left, right, best_cnt))
        for w in wf:
            syms[w] = _ref_scan(syms[w], left, right)
    return merges, syms, wf


def _texts(spark, limit: int = 60) -> list[str]:
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < limit)
        .orderBy("doc_id")
        .select("text")
        .collect()
    )
    return [r.text for r in rows]


# ------------------------------------------------------------------- tests


def test_learn_matches_reference(spark):
    """12 merges over 60 real corpus docs: merge table exactly equal —
    pairs, order, AND counts."""
    texts = _texts(spark)
    expected, _syms, _wf = _ref_learn(texts, 12)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe.learn_bpe(docs, 12)
    assert got == expected


def test_merge_fold_equals_reference_scan(spark):
    """The aggregate() fold is the greedy left-to-right scan, including
    the overlap and merged-token-adjacency corner cases."""
    cases = [
        (["a", "a", "a"], "a", "a"),          # overlap: [aa, a]
        (["a", "a", "a", "a"], "a", "a"),     # [aa, aa]
        (["a", "b", "a", "b"], "b", "a"),     # merged token then next pair
        (["a", "a", "aa"], "a", "aa"),        # right side is a merged symbol
        (["aa", "a", "a"], "aa", "a"),        # merged result adjacent again
        (["x"], "x", "x"),                    # single symbol, no pair
        (["b", "a"], "a", "b"),               # pair present reversed only
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _l, _r) in enumerate(cases)], "id long, syms array<string>"
    )
    for i, (syms, left, right) in enumerate(cases):
        got = (
            bpe.apply_merge(df.filter(F.col("id") == i).select("syms", F.lit(1).alias("freq")), left, right)
            .select("syms")
            .collect()[0]
            .syms
        )
        assert got == _ref_scan(syms, left, right), (syms, left, right, got)


def test_min_count_stops_learning(spark):
    """A corpus where every adjacency is unique yields no merges at the
    default min_count=2."""
    docs = spark.createDataFrame([("abc",), ("defg",), ("hi",)], "text string")
    assert bpe.learn_bpe(docs, 5) == []


def test_encode_reproduces_training_state(spark):
    """Encoding the training corpus with the learned table reproduces
    exactly the symbol arrays training ended with, word by word."""
    texts = _texts(spark, limit=40)
    merges, final_syms, _wf = _ref_learn(texts, 10)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    for w, want in final_syms.items():
        assert bpe.encode_word(w, ranks) == want, w


def test_encode_udf_matches_python(spark):
    """The Arrow UDF path == per-word python encode concatenated in
    word order (nulls -> empty array)."""
    texts = _texts(spark, limit=30)
    merges = bpe.learn_bpe(
        spark.createDataFrame([(t,) for t in texts], "text string"), 8
    )
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    df = spark.createDataFrame(
        [(0, texts[0]), (1, texts[1]), (2, None)], "id long, text string"
    )
    got = {
        r.id: r.toks
        for r in df.select("id", bpe.encode_udf(merges)(F.col("text")).alias("toks")).collect()
    }
    for i in (0, 1):
        want = [t for w in bpe._tokenize(texts[i]) for t in bpe.encode_word(w, ranks)]
        assert got[i] == want
    assert got[2] == []


def test_train_encode_agree_on_unicode_whitespace(spark):
    """Java/Spark \\s is ASCII-only: U+00A0 is NOT a word separator, so
    'foo\\u00a0bar' is ONE training word — and the encode path must
    tokenize identically (a plain str.split() would split it in two and
    emit tokens training never produced)."""
    texts = ["foo\u00a0bar foo\u00a0bar zap zap", "foo\u00a0bar zap"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe.learn_bpe(docs, 6)
    expected, final_syms, _wf = _ref_learn(texts, 6)
    assert merges == expected
    assert "foo\u00a0bar" in final_syms  # the NBSP word trained as one unit
    row = (
        spark.createDataFrame([(texts[0],)], "text string")
        .select(bpe.encode_udf(merges)(F.col("text")).alias("toks"))
        .collect()[0]
    )
    want = [t for w in bpe._tokenize(texts[0]) for t in final_syms[w]]
    assert row.toks == want


def test_pair_counts_plan_shape(spark):
    """Pair counting must stay codegen (no python eval) and cost exactly
    the two hash aggs (word freq, pair count) — no window, no join."""
    from pmocr_spark.plans import shape

    # q44 session-caches this exact lineage (bpe_syms0); a cached run
    # earlier in the suite would make Spark substitute the
    # InMemoryRelation here and the plan text would be the CACHE's, not
    # the operator's — clear it so the test sees the real shape
    spark.catalog.clearCache()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    pc = bpe.pair_counts(bpe.initial_symbols(bpe.word_freqs(d)))
    plan = shape.formatted_plan(pc)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "Join" not in plan
    assert shape.count_exchanges(pc) <= 2, plan


def test_apply_merge_map_only(spark):
    """One merge application adds ZERO exchanges over the input's own."""
    from pmocr_spark.plans import shape

    spark.catalog.clearCache()  # see test_pair_counts_plan_shape
    d = spark.read.parquet(f"{SF}/documents.parquet")
    sy = bpe.initial_symbols(bpe.word_freqs(d))
    base = shape.count_exchanges(sy)
    merged = bpe.apply_merge(sy, "e", "r")
    assert shape.count_exchanges(merged) == base


def test_max_word_chars_guard(spark):
    """The production cap drops pathological mega-tokens before they
    reach the iterated fold; default (None) keeps everything."""
    docs = spark.createDataFrame(
        [("ok ok " + "x" * 50,), ("ok ok",)], "text string"
    )
    capped = {r.word for r in bpe.word_freqs(docs, max_word_chars=10).collect()}
    assert capped == {"ok"}
    full = {r.word for r in bpe.word_freqs(docs).collect()}
    assert full == {"ok", "x" * 50}
    # learning under the cap never sees the mega-token's chars
    merges = bpe.learn_bpe(docs, 3, max_word_chars=10)
    assert all("x" not in l and "x" not in r for l, r, _c in merges)


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdef", min_size=1, max_size=6)


@given(st.lists(st.lists(_word, min_size=1, max_size=8), min_size=1, max_size=6))
@settings(max_examples=10, deadline=None)
def test_learn_matches_reference_property(spark, word_lists):
    """Property: on arbitrary small corpora (adversarial repetition and
    tie patterns included) the distributed loop equals the single-node
    reference exactly — merge pairs, order, and counts."""
    texts = [" ".join(ws) for ws in word_lists]
    expected, _syms, _wf = _ref_learn(texts, 5)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe.learn_bpe(docs, 5, vocab_partitions=1) == expected


def test_null_text_rows_ignored(spark):
    """NULL text rows drop out of the word count instead of poisoning
    the merge loop."""
    docs = spark.createDataFrame(
        [(None,), ("ab ab ab",)], "text string"
    )
    merges = bpe.learn_bpe(docs, 2)
    expected, _s, _w = _ref_learn(["ab ab ab"], 2)
    assert merges == expected


def test_corpus_words_have_no_oracle_delimiter():
    """The q44 merge-sequence oracle rewrites symbol streams as
    chr(31)-delimited strings (see the SQL comment in queries.py): a
    corpus word CONTAINING chr(31) would break the oracle's token
    wrapping while the Spark fold (array-based, no delimiter) stays
    right — a silent hash mismatch. Pin the assumption on the gate SFs."""
    import duckdb

    for sf in ("0.001", "0.01"):
        n = duckdb.sql(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/documents.parquet' "
            "WHERE text LIKE '%' || chr(31) || '%'"
        ).fetchone()[0]
        assert n == 0, f"sf{sf}: {n} documents contain the oracle delimiter chr(31)"
