"""Stupid Backoff LM scoring (q24 sb_lp_micro, Brants EMNLP'07):
hand-computed parity on a corpus tiny enough to verify by eye, with the
held-out half exercising BOTH branches (known bigram + backoff)."""

from __future__ import annotations

import math

import pandas as pd
import pytest


DOCS = [
    # training half (even doc_ids)
    (0, "the cat sat on the mat"),
    (2, "the cat ran"),
    (4, "a dog sat"),
    # held-out half: known bigrams ('the cat'), unseen bigrams
    # ('cat naps' -> backoff on known 'naps'? no — naps is OOV too),
    # and a fully-OOV transition
    (1, "the cat naps"),
    (3, "zebra quux"),
]


def _py_stupid_backoff(docs):
    train_bg: dict[tuple, int] = {}
    uni: dict[str, int] = {}
    for d, t in docs:
        ws = t.lower().strip().split()
        if d % 2:
            continue
        for a, b in zip(ws, ws[1:]):
            train_bg[(a, b)] = train_bg.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1  # bigram-left occurrences
    n_tok, vsz = sum(uni.values()), len(uni)
    out = {}
    for d, t in docs:
        ws = t.lower().strip().split()
        if len(ws) < 2:
            continue
        total = 0
        for a, b in zip(ws, ws[1:]):
            if (a, b) in train_bg:
                s = train_bg[(a, b)] / uni[a]
            else:
                s = 0.4 * ((uni.get(b, 0) + 1) / (n_tok + vsz))
            total += int(round(1000000.0 * math.log(s)))
        out[d] = total
    return out


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    p = tmp_path_factory.mktemp("tiny_sf")
    pd.DataFrame(
        [
            {
                "doc_id": d,
                "text": t,
                "lang": "en",
                "source": "s",
                "n_chars": len(t),
            }
            for d, t in DOCS
        ]
    ).to_parquet(p / "documents.parquet")
    return str(p)


def test_sb_lp_micro_matches_hand_reference(spark, tiny_sf):
    from pmocr_spark.queries import QUERY_FNS

    rows = {
        r["doc_id"]: r["sb_lp_micro"]
        for r in QUERY_FNS["q24_quality_score"](spark, tiny_sf).collect()
    }
    assert rows == _py_stupid_backoff(DOCS)


def test_sb_branches_actually_differ(spark, tiny_sf):
    """Doc 1 mixes a KNOWN bigram ('the cat', trained twice) with
    backoff transitions; its score must sit strictly above doc 3 (all
    transitions fully OOV) after per-transition normalization — i.e.
    the conditional path yields higher probabilities than backoff."""
    ref = _py_stupid_backoff(DOCS)
    # per-transition means: doc 1 has 2 transitions, doc 3 has 1
    assert ref[1] / 2 > ref[3] / 1
    # 'the cat' transition alone: C=2 of C(the)=3 -> ln(2/3), much
    # bigger than any backoff term in this corpus
    assert ref[0] > ref[3]
