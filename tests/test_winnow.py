"""Winnowing fingerprints (operators/winnow.py): selection equality vs
an independent pure-python reference, the SIGMOD'03 (k, w) guarantee,
rightmost tie-break, short-doc boundary, and the MOSS pair join."""

from __future__ import annotations

import hashlib

from pmocr_spark.operators.winnow import (
    DEFAULT_K,
    DEFAULT_W,
    kgram_hashes,
    shared_fingerprint_pairs,
    winnow_fingerprints,
)


def _py_winnow(text: str, k: int = DEFAULT_K, w: int = DEFAULT_W):
    """Independent reference: the SIGMOD'03 definition verbatim — every
    complete window's minimum hash, rightmost on ties, deduped."""
    toks = text.strip().lower().split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams]
    sel = set()
    for i in range(len(hs) - w + 1):
        win = hs[i : i + w]
        m = min(win)
        j = max(p for p in range(i, i + w) if hs[p] == m)
        sel.add((j, hs[j]))
    return sel


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the quick brown "
    "fox naps under a warm autumn sun near the river bank"
)
TEXT_B = (
    "completely different words appear here about spark shuffles and "
    "partition pruning with broadcast joins and adaptive query execution"
)
# B's tail embeds an 8-word (k + w - 1) run lifted verbatim from A —
# the guarantee threshold exactly
SHARED_RUN = "jumps over the lazy dog while the quick"
TEXT_B_OVERLAP = TEXT_B + " " + SHARED_RUN


def test_matches_pure_python_reference(spark):
    rows = [(1, TEXT_A), (2, TEXT_B), (3, TEXT_B_OVERLAP)]
    got = {
        r["doc_id"]: set()
        for r in _docs(spark, rows).select("doc_id").collect()
    }
    for r in winnow_fingerprints(_docs(spark, rows)).collect():
        got[r["doc_id"]].add((r["pos"], r["fp"]))
    for doc_id, text in rows:
        assert got[doc_id] == _py_winnow(text), f"doc {doc_id}"


def test_guarantee_shared_run_shares_a_fingerprint(spark):
    # any >= k+w-1-word shared run guarantees a shared fingerprint
    fps = winnow_fingerprints(_docs(spark, [(1, TEXT_A), (3, TEXT_B_OVERLAP)]))
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[3], "guaranteed shared fingerprint missing"


def test_disjoint_docs_share_nothing(spark):
    fps = winnow_fingerprints(_docs(spark, [(1, TEXT_A), (2, TEXT_B)]))
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert not (by_doc[1] & by_doc[2])


def test_rightmost_tie_break(spark):
    # one word repeated => every k-gram is identical => identical
    # hashes everywhere => every window's winner is its RIGHTMOST
    # position; with n grams and complete windows only, winners are
    # positions w-1 .. n-1
    text = " ".join(["alpha"] * 24)  # 24 toks, 21 identical grams
    rows = winnow_fingerprints(_docs(spark, [(1, text)])).collect()
    n_grams = 24 - DEFAULT_K + 1
    expect = set(range(DEFAULT_W - 1, n_grams))
    assert {r["pos"] for r in rows} == expect
    assert _py_winnow(text) == {(r["pos"], r["fp"]) for r in rows}


def test_short_doc_yields_nothing(spark):
    # k+w-1 = 8 words is the minimum; 7 words -> no complete window
    short = "one two three four five six seven"
    assert winnow_fingerprints(_docs(spark, [(1, short)])).count() == 0
    # but k-grams themselves exist
    assert kgram_hashes(_docs(spark, [(1, short)])).count() == 7 - DEFAULT_K + 1


def test_shared_pairs_join(spark):
    rows = [(1, TEXT_A), (2, TEXT_B), (3, TEXT_B_OVERLAP), (4, TEXT_A)]
    fps = winnow_fingerprints(_docs(spark, rows))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in shared_fingerprint_pairs(fps, min_shared=1).collect()
    }
    # identical docs share their whole DISTINCT-fp set (a fingerprint
    # selected at two positions counts once — set semantics); the
    # overlap pair shares >= 1; disjoint pairs are absent
    def fset(text):
        return {fp for _, fp in _py_winnow(text)}

    assert pairs[(1, 4)] == len(fset(TEXT_A))
    assert (1, 3) in pairs and (3, 4) in pairs
    assert (1, 2) not in pairs
    # intra-doc repeats cannot inflate the pair count: n_shared is
    # bounded by the smaller distinct-fp set
    assert pairs[(1, 3)] <= min(len(fset(TEXT_A)), len(fset(TEXT_B_OVERLAP)))
    assert pairs[(1, 3)] == len(fset(TEXT_A) & fset(TEXT_B_OVERLAP))


def test_density_roughly_two_over_w_plus_one(spark):
    # SIGMOD'03 expected density of selected positions is 2/(w+1) for
    # random hashes; assert a generous bracket over a seeded word-salad
    # corpus (distinct grams ~ random hashes)
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(80))) for i in range(100)
    ]
    docs = _docs(spark, rows)
    n_grams = kgram_hashes(docs).count()
    n_sel = winnow_fingerprints(docs).count()
    d = n_sel / n_grams
    lo, hi = 0.5 * 2 / (DEFAULT_W + 1), 1.8 * 2 / (DEFAULT_W + 1)
    assert lo < d < hi, d


def test_q47_winnow_arm_matches_direct_pairs(spark):
    """Persisted-index arm: the round-tripped .fps self-probe equals
    shared_fingerprint_pairs run directly on the in-memory frame (a
    lossy write/read would diverge)."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS, _t

    got = {
        (r.id_a, r.id_b): r.n
        for r in QUERY_FNS["q47_dedup_index_probe"](
            spark, "/root/testdata/sf0.001"
        )
        .filter(F.col("part") == "winnow")
        .collect()
    }
    d = _t(spark, "/root/testdata/sf0.001", "documents")
    direct = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in shared_fingerprint_pairs(
            winnow_fingerprints(d), min_shared=2
        ).collect()
    }
    assert got == direct and got
