"""Native vector math over array<float>/array<double> embedding columns.

Sequential left-to-right folds (F.aggregate / zip_with) so the floating
summation order is deterministic and identical to the SQL oracle's
list_sum(list_transform(...)) — bit-stable cross-engine comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot/(|a||b|); 0.0 when either norm is 0."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def lsh_bucket(vec: Column, n_planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket id in [0, 2^n_planes).

    Deterministic pseudo-planes: plane p, dim i weight =
    sin(seed + p*10007 + i*97) — fixed trig lattice, no RNG state, so
    every engine (and the SQL oracle) derives identical buckets.
    """
    def plane_sign(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x * F.sin(F.lit(float(seed)) + F.lit(float(p * 10007)) + i.cast("double") * F.lit(97.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))

    out = F.lit(0)
    for p in range(n_planes):
        out = out + plane_sign(p)
    return out
