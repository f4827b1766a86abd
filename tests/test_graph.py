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


# --- E113: degree-ordered triangle counting -------------------------------

from seizury_hrv_featuresextraction_spark.operators.graph import triangle_counts


def _brute_triangles(pairs):
    import itertools

    adj: dict = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = {u: 0 for u in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for u in (a, b, c):
                n_tri[u] += 1
    return {u: (len(adj[u]), n_tri[u]) for u in adj}


# star + clique + chain (from PAIRS) plus a closing edge (1, 2) that
# makes the hub participate in exactly one triangle, plus a clique-
# attached pendant that closes a second triangle overlapping the clique
TRI_PAIRS = PAIRS + [(1, 2), (14, 10), (14, 11), (2, 1), (5, 5)]


def test_triangle_counts_match_brute_force(spark):
    df = spark.createDataFrame(TRI_PAIRS, "id_a long, id_b long")
    got = {r.node: (r.deg, r.n_tri) for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(TRI_PAIRS)
    # sanity on the planted structure: 4-clique alone gives each member
    # 3 triangles; 14 closes one more with (10, 11)
    assert got[12] == (3, 3) and got[13] == (3, 3)
    assert got[10][1] == 4 and got[14][1] == 1
    # hub triangle (0,1,2); chain stays triangle-free
    assert got[0][1] == 1 and got[20][1] == 0


def test_triangle_counts_empty_and_triangle_free(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r.node: (r.deg, r.n_tri) for r in triangle_counts(df).collect()}
    assert got == {1: (1, 0), 2: (2, 0), 3: (1, 0)}
