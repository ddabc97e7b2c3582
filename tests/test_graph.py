"""Connected components (operators/graph.py): large-star/small-star vs a
pure-python union-find oracle, adversarial chain convergence, and the
cluster-safe reliable-checkpoint path."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pmocr_spark.operators.graph import connected_components, iter_checkpoint


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["node"]: r["label"] for r in out}


def test_cc_chain_200_links(spark):
    """The adversarial shape for min-label propagation: a 200-link chain
    needs ~200 propagation rounds but only O(log^2) star rounds — this
    is exactly the graph the round-2 verdict required to converge."""
    edges = [(i, i + 1) for i in range(200)]
    got = _labels(spark, edges)
    assert got == {i: 0 for i in range(201)}


def test_cc_two_components_and_star(spark):
    edges = [(5, 9), (9, 7), (100, 200), (100, 300), (100, 400)]
    got = _labels(spark, edges)
    assert got == {5: 5, 9: 5, 7: 5, 100: 100, 200: 100, 300: 100, 400: 100}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_random_vs_union_find(spark, seed):
    """Random graphs (mix of chains, cliques, isolated edges) against a
    union-find oracle — catches any formulation bug in the star ops."""
    rng = random.Random(seed)
    nodes = list(range(120))
    edges = set()
    while len(edges) < 90:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    touched = sorted({n for e in edges for n in e})
    expect = _union_find(edges, touched)
    got = _labels(spark, edges)
    assert got == {n: expect[n] for n in touched}


def test_cc_self_loops_and_duplicates(spark):
    """Self-loops are dropped, duplicate/reversed edges are harmless."""
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _labels(spark, edges)
    # node 3 only has a self-loop -> filtered out entirely (no real edge)
    assert got == {1: 1, 2: 1}


def test_cc_reliable_checkpoint_path(spark, tmp_path):
    """reliable=True routes through DataFrame.checkpoint() against the
    fault-tolerant checkpoint dir — the executor-loss-safe cluster path
    (localCheckpoint blocks die with an executor mid-iteration)."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame([(i, i + 1) for i in range(30)], "src long, dst long")
    out = connected_components(df, reliable=True).collect()
    assert {r["node"]: r["label"] for r in out} == {i: 0 for i in range(31)}
    # the knob actually wrote to the reliable dir
    assert any((tmp_path / "ckpt").rglob("*"))


def test_iter_checkpoint_env_knob(spark, tmp_path, monkeypatch):
    """PMOCR_RELIABLE_CHECKPOINT=1 flips the default to the reliable
    path without code changes (the cluster deployment story)."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck2"))
    monkeypatch.setenv("PMOCR_RELIABLE_CHECKPOINT", "1")
    df = spark.range(5).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    got = iter_checkpoint(df)
    assert got.count() == 5
    assert any((tmp_path / "ck2").rglob("*"))


def test_q50_split_is_leakage_free(spark):
    """Split arm: every doc gets a bucket in 0..9, all members of a dup
    cluster share one bucket (no train/test straddle), and singletons
    bucket off their own id."""
    from pyspark.sql import functions as F

    from pmocr_spark.queries import QUERY_FNS

    rows = (
        QUERY_FNS["q50_dup_components"](spark, "/root/testdata/sf0.001")
        .filter(F.col("part").isin("split", "component"))
        .collect()
    )
    split = {r.node: (r.value_a, r.value_b) for r in rows if r.part == "split"}
    comp = {r.node: r.value_a for r in rows if r.part == "component"}
    assert split and all(0 <= b <= 9 for _, b in split.values())
    # clustered docs: root == CC label, bucket constant per cluster
    by_root = {}
    for node, label in comp.items():
        assert split[node][0] == label
        by_root.setdefault(label, set()).add(split[node][1])
    assert by_root and all(len(b) == 1 for b in by_root.values())
    assert any(len({n for n, c in comp.items() if c == root}) > 1
               for root in by_root)
    # singleton docs root off themselves
    singles = [n for n in split if n not in comp]
    assert singles and all(split[n][0] == n for n in singles)
    # the 8/1/1 convention yields all three splits on the gate corpus
    buckets = {b for _, b in split.values()}
    assert buckets & set(range(8)) and 8 in buckets and 9 in buckets
