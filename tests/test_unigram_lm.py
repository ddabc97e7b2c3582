"""Unigram-LM tokenizer (operators/unigram_lm.py, Kudo ACL'18): exact
parity of the full distributed training loop with an INDEPENDENT
pure-python implementation, Viterbi semantics, lossless encoding, model
IO guards, and the CLI lifecycle."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators import unigram_lm as uni

TEXTS = [
    "the cat sat on the mat the cat sat",
    "catalogue cataract catapult the the the",
    "banana bandana ban ban banana",
    "internationalization internal nation national",
    "the mat the cat the bat",
    "sat mat bat rat splat",
]


# ---- independent reference implementation (different code shape:
# ---- memoized recursion instead of forward DP) -----------------------

def _ref_viterbi(word, lp, max_len=4):
    floor = min(lp.values(), default=0) - 1000000
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(i):  # best (score, pieces-tuple) for word[:i]
        if i == 0:
            return (0, ())
        cand = None
        # j descending => longer last piece tried first; strict > keeps
        # the longer-piece winner on ties (the module's documented rule)
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            s = lp.get(piece)
            if s is None:
                if len(piece) == 1:
                    s = floor
                else:
                    continue
            prev = best(j)
            if prev[0] == float("-inf"):
                continue
            score = prev[0] + s
            if cand is None or score > cand[0] or (
                score == cand[0] and j < cand[2]
            ):
                cand = (score, prev[1] + (piece,), j)
        return (cand[0], cand[1]) if cand else (float("-inf"), ())

    return list(best(len(word))[1])


def _ref_train(texts, vocab_size, em_iters=3):
    wf = {}
    for t in texts:
        for w in re.split(r"\s+", t.lower(), flags=re.ASCII):
            if w:
                wf[w] = wf.get(w, 0) + 1
    seeds = {}
    for w, f in wf.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + 4) + 1):
                seeds[w[i:j]] = seeds.get(w[i:j], 0) + f
    chars = {p: c for p, c in seeds.items() if len(p) == 1}
    multi = dict(
        sorted(
            ((p, c) for p, c in seeds.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: uni.SEED_MULTI]
    )

    def lp_table(counts):
        tot = sum(counts.values())
        return {
            p: int(round(1000000.0 * (math.log(c) - math.log(tot))))
            for p, c in counts.items()
            if c > 0
        }

    counts = {**chars, **multi}
    lp = lp_table(counts)
    for _ in range(em_iters):
        got = {}
        for w, f in wf.items():
            for p in _ref_viterbi(w, lp):
                got[p] = got.get(p, 0) + f
        counts = {c: got.get(c, 0) + 1 for c in chars}
        counts.update({p: c for p, c in got.items() if len(p) > 1})
        lp = lp_table(counts)
    n_multi = max(0, vocab_size - len(chars))
    kept = sorted(
        ((p, u) for p, u in lp.items() if len(p) > 1),
        key=lambda kv: (-counts[kv[0]], kv[0]),
    )[:n_multi]
    fc = {c: counts[c] for c in chars}
    fc.update({p: counts[p] for p, _u in kept})
    return sorted(lp_table(fc).items())


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_independent_reference(spark, docs_df):
    got = uni.train_unigram(docs_df, vocab_size=40)
    want = _ref_train(TEXTS, vocab_size=40)
    assert got == want
    # the vocab learned something: multi-char pieces exist and frequent
    # morphemes made the cut
    pieces = {p for p, _u in got}
    assert any(len(p) > 1 for p in pieces)
    assert "the" in pieces or "at" in pieces


def test_viterbi_prefers_higher_score_then_longer_piece():
    lp = {"b": -100, "a": -100, "n": -100, "ba": -150, "na": -150, "ban": -120}
    # 'ban' one piece (-120) beats b+a+n (-300) and ba+n (-250)
    assert uni.viterbi("ban", lp) == ["ban"]
    # tie case: two equal-score splits -> longer last piece wins
    lp2 = {"a": -100, "aa": -200}  # aa == a+a score; prefer ['aa']
    assert uni.viterbi("aa", lp2) == ["aa"]


def test_viterbi_oov_char_fallback():
    lp = {"a": -10, "ab": -15}
    assert uni.viterbi("axb", lp) == ["a", "x", "b"]


def test_encode_is_lossless_and_in_vocab(spark, docs_df):
    model = uni.train_unigram(docs_df, vocab_size=40)
    vocab = {p for p, _u in model}
    out = docs_df.select(
        "text", uni.encode_udf(model)(F.col("text")).alias("toks")
    ).collect()
    for r in out:
        words = [w for w in re.split(r"\s+", r["text"].lower()) if w]
        assert "".join(r["toks"]) == "".join(words)
        assert all(t in vocab for t in r["toks"])


def test_model_io_roundtrip_and_guards(spark, docs_df, tmp_path):
    model = uni.train_unigram(docs_df, vocab_size=30)
    path = str(tmp_path / "uni_model")
    uni.write_model(spark, path, model, vocab_size=30)
    assert uni.read_model(spark, path) == model
    with pytest.raises(ValueError, match="sidecar"):
        uni.read_model(spark, str(tmp_path / "nope"))


def test_cli_train_encode_lifecycle(spark, docs_df, tmp_path):
    from pmocr_spark import cli

    src = str(tmp_path / "docs.parquet")
    docs_df.write.parquet(src)
    mdir = str(tmp_path / "model")
    cli.main(["--train-unigram", "40", "--input", src, "--output", mdir,
              "--master", "local[2]"])
    enc = str(tmp_path / "encoded")
    cli.main(["--encode-unigram", mdir, "--input", src, "--output", enc,
              "--master", "local[2]"])
    out = spark.read.parquet(enc)
    rows = out.collect()
    assert {"uni_tokens", "n_uni_tokens"} <= set(out.columns)
    assert all(r["n_uni_tokens"] == len(r["uni_tokens"]) for r in rows)
    # CLI encode == library encode (model round-trips through the sidecar)
    model = uni.read_model(spark, mdir)
    lib = {
        r["doc_id"]: r["t"]
        for r in docs_df.select(
            "doc_id", uni.encode_udf(model)(F.col("text")).alias("t")
        ).collect()
    }
    assert {r["doc_id"]: r["uni_tokens"] for r in rows} == lib
    # mutual exclusion with other maintenance modes
    with pytest.raises(SystemExit):
        cli.main(["--train-unigram", "40", "--train-bpe", "3", "--input", src,
                  "--output", mdir, "--master", "local[2]"])


def test_compression_beats_chars(spark, docs_df):
    """The point of a tokenizer: far fewer pieces than characters."""
    model = uni.train_unigram(docs_df, vocab_size=60)
    toks = docs_df.select(
        F.size(uni.encode_udf(model)(F.col("text"))).alias("n"),
        F.length(F.regexp_replace(F.lower("text"), r"\s+", "")).alias("c"),
    ).agg(F.sum("n").alias("n"), F.sum("c").alias("c")).first()
    assert toks["n"] < 0.6 * toks["c"]
