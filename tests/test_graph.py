"""E67 fixed-point PageRank: exact integer replay on a known graph,
hub-dominance property (centrality > degree at separating a template
hub from clique members), mass conservation, and edge cases."""

from __future__ import annotations

import pytest

from seizury_hrv_featuresextraction_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)


def _ref_pagerank(pairs, iters=3, scale=PR_SCALE, num=85, den=100):
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    deg: dict = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(deg)
    init = scale // n
    base = ((den - num) * init) // den
    r = {u: init for u in deg}
    for _ in range(iters):
        contrib: dict = {u: 0 for u in deg}
        for u, v in edges:
            contrib[v] += r[u] // deg[u]
        r = {u: base + (num * contrib[u]) // den for u in deg}
    return deg, r


# star hub 0 — 1..8, plus a 4-clique 10..13, plus a chain 20-21-22
PAIRS = (
    [(0, i) for i in range(1, 9)]
    + [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    + [(20, 21), (21, 22)]
)


def test_pagerank_matches_integer_replay(spark):
    df = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    got = {r.u: (r.deg, r.rank_fp) for r in pagerank_fixed_point(df).collect()}
    deg, want = _ref_pagerank(PAIRS)
    assert got == {u: (deg[u], want[u]) for u in deg}


def test_pagerank_hub_dominates(spark):
    df = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    r = {row.u: row.rank_fp for row in pagerank_fixed_point(df).collect()}
    # the star hub outranks every clique member even though clique
    # members have half its degree and tighter local mass
    assert r[0] > max(r[u] for u in (10, 11, 12, 13))
    # leaves of the star rank below everything central
    assert r[1] < r[10]
    # chain middle beats chain ends
    assert r[21] > r[20] == r[22]


def test_pagerank_mass_conserved(spark):
    df = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    total = sum(row.rank_fp for row in pagerank_fixed_point(df).collect())
    # integer truncation only ever LOSES mass, a few units per node per round
    n = 15
    assert PR_SCALE * 0.999 <= total <= PR_SCALE


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank_fixed_point(df).collect() == []


def test_pagerank_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    a = sorted((r.u, r.rank_fp) for r in pagerank_fixed_point(df).collect())
    b = sorted(
        (r.u, r.rank_fp)
        for r in pagerank_fixed_point(df.repartition(13), checkpoint=False).collect()
    )
    assert a == b
