"""Sorted-neighborhood candidate generation (queries._snm_candidates):
pair set equals the hand-rolled sliding-window definition, is invariant
to input partitioning (the two-pass rank is an exact global
row_number), and scales as O(n·(w-1)) rows with w."""

from __future__ import annotations

from pmocr_spark.queries import _snm_candidates


def _keyed(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, k string")
    return df.repartition(parts) if parts else df


def _py_snm(rows, w):
    """Reference: sort on (k, doc_id), pair each row with the next w-1."""
    order = [doc for doc, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    pairs = set()
    for i, a in enumerate(order):
        for b in order[i + 1 : i + w]:
            pairs.add((min(a, b), max(a, b)))
    return pairs


ROWS = [
    (10, "bb"),
    (3, "aa"),
    (7, "aa"),  # ties on k break by doc_id: 3 before 7
    (1, "cc"),
    (5, "bb"),
    (2, "dd"),
    (9, "ab"),
]


def test_snm_matches_reference_definition(spark):
    for w in (2, 3, 4):
        got = {
            (r.doc_a, r.doc_b)
            for r in _snm_candidates(_keyed(spark, ROWS), w=w).collect()
        }
        assert got == _py_snm(ROWS, w), (w, got)


def test_snm_partitioning_invariant(spark):
    base = {
        (r.doc_a, r.doc_b)
        for r in _snm_candidates(_keyed(spark, ROWS), w=3).collect()
    }
    for parts in (1, 5, 32):
        got = {
            (r.doc_a, r.doc_b)
            for r in _snm_candidates(_keyed(spark, ROWS, parts=parts), w=3).collect()
        }
        assert got == base, parts


def test_snm_pair_count_is_linear_in_window(spark):
    """n rows, window w -> exactly (n - w/2)·(w-1)-ish pairs: the full
    formula is sum over ranks of min(w-1, n-rank) = (w-1)·n - w·(w-1)/2.
    No quadratic blow-up, no duplicates."""
    n = 40
    rows = [(i, f"k{i:03d}") for i in range(n)]
    for w in (2, 4, 6):
        pairs = _snm_candidates(_keyed(spark, rows), w=w).collect()
        expect = (w - 1) * n - w * (w - 1) // 2
        assert len(pairs) == expect
        assert len({(p.doc_a, p.doc_b) for p in pairs}) == expect


def test_snm_dedup_cli(spark, tmp_path, capsys):
    """--snm-dedup maintenance mode: exact dup scores 1.0, prefix
    near-dups verified, unrelated docs excluded; knob validation."""
    import pytest

    from pmocr_spark import cli

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "totally different words here now folks"),
        (3, "alpha beta gamma delta epsilon zeta"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "docs")
    )
    out = str(tmp_path / "pairs")
    cli.main(["--snm-dedup", "--input", str(tmp_path / "docs"),
              "--output", out, "--master", "local[4]"])
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in spark.read.parquet(out).collect()}
    assert got[(0, 3)] == 1.0
    assert 0 < got[(0, 1)] < 1.0
    assert all(2 not in p for p in got)

    with pytest.raises(SystemExit):
        cli.parse_args(["--snm-dedup", "--input", "x"])  # no output
    with pytest.raises(SystemExit):
        cli.parse_args(["--snm-dedup", "--batch", "--input", "x",
                        "--output", "o"])
    with pytest.raises(SystemExit):
        cli.parse_args(["--snm-dedup", "--input", "x", "--output", "o",
                        "--snm-window", "1"])
    with pytest.raises(SystemExit):
        cli.parse_args(["--snm-window", "3", "--input", "x", "--output", "o"])
