"""MinHash-LSH parameter planner (operators/lsh_plan.py): the S-curve
area minimization must reproduce the repo's own default, move with the
threshold the way the theory says, and respect the FP/FN weights."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from pmocr_spark.operators.lsh_plan import collision_prob, plan_bands


def test_reproduces_repo_default():
    """The catalog's q18 / dedup-index default (12 hashes, 4 bands of
    3) is exactly what the planner picks for the classic t=0.5."""
    p = plan_bands(12, 0.5)
    assert (p["bands"], p["rows"]) == (4, 3)
    assert p["bands"] * p["rows"] == 12


def test_rows_increase_with_threshold():
    """Higher thresholds want steeper curves further right — i.e. more
    rows per band (monotone non-decreasing in t)."""
    rows = [plan_bands(24, t)["rows"] for t in (0.2, 0.4, 0.6, 0.8)]
    assert rows == sorted(rows)
    assert rows[0] < rows[-1]


def test_threshold_est_is_exact_half_collision_point():
    for n, t in ((12, 0.5), (128, 0.8), (64, 0.3)):
        p = plan_bands(n, t)
        assert collision_prob(p["threshold_est"], p["bands"], p["rows"]) == pytest.approx(
            0.5, abs=1e-12
        )


def test_fp_weight_buys_precision():
    """Penalizing false positives 10x pushes the curve right (fewer
    bands -> fewer sub-threshold collisions), and the chosen plan's
    fp_area must actually drop."""
    base = plan_bands(12, 0.5)
    tight = plan_bands(12, 0.5, fp_weight=10.0)
    assert tight["bands"] < base["bands"]
    assert tight["fp_area"] < base["fp_area"]


def test_degenerate_inputs_rejected():
    with pytest.raises(ValueError):
        plan_bands(0, 0.5)
    with pytest.raises(ValueError):
        plan_bands(12, 0.0)
    with pytest.raises(ValueError):
        plan_bands(12, 1.0)


def test_prime_signature_still_plans():
    """A prime signature length has only the two trivial
    factorizations; the planner must still return one of them."""
    p = plan_bands(13, 0.5)
    assert (p["bands"], p["rows"]) in ((13, 1), (1, 13))


def test_cli_lsh_plan_prints_one_json_line():
    r = subprocess.run(
        [sys.executable, "-m", "pmocr_spark.cli", "--lsh-plan", "12,0.5"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    plan = json.loads(lines[0])
    assert (plan["bands"], plan["rows"]) == (4, 3)


def test_cli_lsh_plan_rejects_bad_spec():
    for spec in ("12", "12,2.0", "x,0.5", "1,2,3,4,5"):
        r = subprocess.run(
            [sys.executable, "-m", "pmocr_spark.cli", "--lsh-plan", spec],
            capture_output=True,
            text=True,
            timeout=60,
            cwd="/root/repo",
        )
        assert r.returncode != 0, spec
