"""Fellegi-Sunter record-linkage scoring (queries._fs_score_pairs):
weights vs the textbook ln(m/u) definition, hand-computed scores over a
tiny blocked frame, blocking exclusions, and the lower-threshold cut."""

from __future__ import annotations

import math

from pmocr_spark.queries import _FS_MU, _FS_W, _fs_score_pairs


def test_weights_match_textbook_definition():
    from pmocr_spark.queries import _FS_NAME_MU3

    for field, (m, u) in _FS_MU.items():
        assert _FS_W[f"{field}_a"] == round(1e6 * math.log(m / u))
        assert _FS_W[f"{field}_d"] == round(1e6 * math.log((1 - m) / (1 - u)))
        # agreement on any field is positive evidence, disagreement negative
        assert _FS_W[f"{field}_a"] > 0 > _FS_W[f"{field}_d"]
    # Winkler three-level name ladder: exact > near > 0 > other, and
    # the (m, u) masses are proper distributions
    for tag, (m, u) in _FS_NAME_MU3.items():
        assert _FS_W[f"name3_{tag}"] == round(1e6 * math.log(m / u))
    assert _FS_W["name3_e"] > _FS_W["name3_n"] > 0 > _FS_W["name3_d"]
    assert abs(sum(m for m, _ in _FS_NAME_MU3.values()) - 1.0) < 1e-9
    assert abs(sum(u for _, u in _FS_NAME_MU3.values()) - 1.0) < 1e-9


def _frames(spark):
    clean = spark.createDataFrame(
        [
            (1, "Customer#000000001", 3, 1200.0, "BUILDING"),
            (2, "Customer#000000002", 3, 2500.0, "AUTOMOBILE"),
            (3, "Customer#000000003", 7, 100.0, "MACHINERY"),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    dirty = spark.createDataFrame(
        [
            # exact replica of 1: all three fields agree
            (11, "Customer#000000001", 3, 1300.0, "BUILDING"),
            # corrupted name of 2, same block prefix: name disagrees
            (12, "Customer#00000000X", 3, 2600.0, "AUTOMOBILE"),
            # same block as 3 but everything else off
            (13, "Customer#00000000X", 7, 9100.0, "FURNITURE"),
            # different nation: excluded by blocking even with exact name
            (14, "Customer#000000001", 9, 1200.0, "BUILDING"),
        ],
        "d_key long, d_name string, d_nat int, d_bal double, d_seg string",
    )
    return clean, dirty


def test_scores_hand_computed(spark):
    clean, dirty = _frames(spark)
    got = {(r.doc_a, r.doc_b): r.score for r in _fs_score_pairs(clean, dirty).collect()}
    full = _FS_W["name3_e"] + _FS_W["seg_a"] + _FS_W["bal_a"]
    # (2, 12): name corrupted at edit distance 1 -> the Winkler NEAR
    # level keeps most of its evidence
    name_near = _FS_W["name3_n"] + _FS_W["seg_a"] + _FS_W["bal_a"]
    assert got[(1, 11)] == full
    assert got[(2, 12)] == name_near > 0
    # (3, 13): name/seg/bal all disagree -> score < 0 -> cut
    assert (3, 13) not in got
    # (1, 14): cross-nation blocked out despite identical name
    assert (1, 14) not in got
    # blocking admits cross-key pairs inside a block: (1,12)/(2,11) share
    # the 16-char prefix and nation; every field disagrees -> cut
    assert (1, 12) not in got and (2, 11) not in got
    assert len(got) == 2


def test_balance_bucket_agreement_is_floor_banded(spark):
    clean, dirty = _frames(spark)
    got = {(r.doc_a, r.doc_b): r.score for r in _fs_score_pairs(clean, dirty).collect()}
    # 1200 and 1300 share floor(bal/1000) = 1 -> bal agrees for (1, 11)
    assert got[(1, 11)] - _FS_W["name3_e"] - _FS_W["seg_a"] == _FS_W["bal_a"]
