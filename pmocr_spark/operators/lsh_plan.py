"""MinHash-LSH parameter planner: choose (bands, rows) for a target
Jaccard threshold.

The banded-LSH collision curve P(s) = 1 - (1 - s^r)^b (Leskovec,
Rajaraman & Ullman, *Mining of Massive Datasets* §3.4.2 — public) is an
S-curve whose inflection sits near (1/b)^(1/r). Real pipelines don't
hand-pick (b, r): they state "pairs above Jaccard t are duplicates" and
want the factorization of their signature budget n = b·r whose S-curve
best approximates the step function at t. This module does exactly that
selection, deterministically:

  cost(b, r) = fp_weight · ∫₀ᵗ P(s) ds   (candidate pairs below t:
                                          wasted verification work)
             + fn_weight · ∫ₜ¹ (1-P(s)) ds (true duplicates never
                                          bucketed together: missed)

evaluated by a fixed-grid midpoint rule (pure float arithmetic, no RNG,
no dependence on iteration order), minimized over every divisor
factorization of the signature length. `fp_weight` is the knob users
actually turn: verification cost per candidate (cheap exact-Jaccard
check → low weight, tolerate FPs) vs the cost of a missed duplicate.

Consumers: the catalog's q18 family and the persistent dedup index
(operators/dedup_index.py) default to 12 hashes in 4 bands of 3 —
`plan_bands(12, 0.5)` reproduces exactly that choice, pinned by test —
and the CLI `--lsh-plan` surface prints the plan for any
(n_hashes, threshold) so an operator can size an index before building
it. Reference parity: pmOCR has no tuning surface at all (every knob in
default.conf:* is a fixed scalar); this is the Spark-native analog of
sizing a config before a large run.
"""

from __future__ import annotations

#: midpoint-rule grid — fine enough that plan choices are stable (the
#: integrand is a smooth polynomial; 2000 cells put the quadrature
#: error orders below any cost gap between factorizations)
_GRID = 2000


def collision_prob(s: float, bands: int, rows: int) -> float:
    """P(two docs with Jaccard s share ≥1 LSH bucket) = 1-(1-s^r)^b."""
    return 1.0 - (1.0 - s**rows) ** bands


def _curve_cost(
    bands: int, rows: int, threshold: float, fp_weight: float, fn_weight: float
) -> float:
    """Weighted area between the S-curve and the ideal step at
    `threshold`, by midpoint rule on a fixed grid."""
    h = 1.0 / _GRID
    fp = 0.0
    fn = 0.0
    for i in range(_GRID):
        s = (i + 0.5) * h
        p = collision_prob(s, bands, rows)
        if s < threshold:
            fp += p * h
        else:
            fn += (1.0 - p) * h
    return fp_weight * fp + fn_weight * fn


def plan_bands(
    n_hashes: int,
    threshold: float,
    fp_weight: float = 1.0,
    fn_weight: float = 1.0,
) -> dict:
    """Best (bands, rows) factorization of `n_hashes` for `threshold`.

    Scans every divisor pair b·r = n_hashes (a signature length is
    small — 12, 128, 256 — so this is a trivially cheap exact search),
    scoring each by the weighted FP/FN area and breaking exact cost
    ties toward more bands (higher recall). Returns a dict with the
    chosen ``bands``/``rows``, the curve's exact 50%-collision point
    ``threshold_est`` = (1 - 0.5^(1/b))^(1/r) (MMDS quotes the
    (1/b)^(1/r) approximation; the exact form is defined for b=1 too),
    and the two weighted error areas.

    Raises ValueError on a non-positive signature length or a threshold
    outside (0, 1) — an LSH plan at t=0 or t=1 is degenerate by
    definition (every pair / no pair collides).
    """
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: dict | None = None
    for rows in range(1, n_hashes + 1):
        if n_hashes % rows:
            continue
        bands = n_hashes // rows
        cost = _curve_cost(bands, rows, threshold, fp_weight, fn_weight)
        cand = {
            "bands": bands,
            "rows": rows,
            "n_hashes": n_hashes,
            "threshold": threshold,
            "threshold_est": (1.0 - 0.5 ** (1.0 / bands)) ** (1.0 / rows),
            "cost": cost,
        }
        if best is None or cost < best["cost"] or (
            cost == best["cost"] and bands > best["bands"]
        ):
            best = cand
    assert best is not None
    best["fp_area"] = _curve_cost(best["bands"], best["rows"], threshold, 1.0, 0.0)
    best["fn_area"] = _curve_cost(best["bands"], best["rows"], threshold, 0.0, 1.0)
    return best
