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


def plane_weights(dim: int, g: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane ``g``: weight at dim i =
    md5-derived uniform in [-1, 1).

    Each weight is ``int(md5(f"{seed}:{g}:{i}")[:8], 16) / 2^31 - 1`` —
    a 32-bit integer divided by a power of two, so every weight is an
    EXACTLY representable double. The Spark plan, the SQL oracle and any
    NumPy check all inline the same bit pattern; unlike a sin() lattice
    there is no transcendental whose last ulp differs between
    java.lang.Math and libm (measured: ~0.2% of sin-lattice points
    differ by 1 ulp Spark-vs-DuckDB, a latent bucket-flip).
    """
    import hashlib

    return [
        int(hashlib.md5(f"{seed}:{g}:{i}".encode()).hexdigest()[:8], 16) / 2**31 - 1.0
        for i in range(dim)
    ]


def _plane_sign(vec: Column, dim: int, g: int, bit: int, seed: int) -> Column:
    """(1<<bit) if the projection of ``vec`` onto plane g is > 0 else 0."""
    from ..planutil import literal_array

    # every weight is a 32-bit-int / 2^31 - 1 whose repr() round-trips
    # exactly through the SQL parser (planutil.literal_array) — and the
    # per-element F.lit py4j cost across n_planes x bands plane arrays
    # was a measurable per-query-build driver wall
    ws = literal_array(plane_weights(dim, g, seed), "DOUBLE")
    proj = F.aggregate(
        F.zip_with(vec, ws, lambda x, w: x * w), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def _dim_guard(vec: Column, dim: int, out: Column) -> Column:
    """Fail loudly when ``vec``'s length differs from the plane dim.

    zip_with pads the shorter array with nulls, so a dim mismatch would
    silently make every projection NULL -> every vector lands in bucket 0
    -> the LSH blocking degenerates into an all-pairs cross join (output
    stays correct via the cosine verify, but the scale contract is gone).
    assert_true raises at runtime instead; it returns NULL on success, so
    when(guard.isNull(), out) == out for every valid row.
    """
    guard = F.assert_true(
        F.size(vec) == F.lit(dim),
        F.concat(
            F.lit(f"lsh: vector length != configured dim={dim} (got "),
            F.size(vec).cast("string"),
            F.lit(")"),
        ),
    )
    return F.when(guard.isNull(), out)


def lsh_bucket(vec: Column, n_planes: int = 8, seed: int = 7, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id in [0, 2^n_planes)."""
    out = F.lit(0)
    for p in range(n_planes):
        out = out + _plane_sign(vec, dim, p, p, seed)
    return _dim_guard(vec, dim, out)


def lsh_band_buckets(
    vec: Column, n_planes: int, n_bands: int, seed: int = 7, dim: int = 64
) -> Column:
    """array of ``n_bands`` independent LSH bucket ids (band-OR blocking).

    Band t uses global plane indices t*n_planes .. t*n_planes+n_planes-1
    of the same md5 weight family, so band 0 equals ``lsh_bucket`` and
    every band is deterministic and SQL-twin-reproducible. A pair of
    vectors is a candidate if ANY band bucket matches — recall
    1-(1-p^r)^B instead of the single-table p^r (the classic AND-OR
    amplification, mirroring the MinHash banding in operators/dedup.py).
    """
    out = F.array(
        *[
            sum(
                (_plane_sign(vec, dim, t * n_planes + p, p, seed) for p in range(1, n_planes)),
                _plane_sign(vec, dim, t * n_planes, 0, seed),
            )
            for t in range(n_bands)
        ]
    )
    return _dim_guard(vec, dim, out)


def hash_embed(text: Column, dim: int = 64) -> Column:
    """E45: deterministic text embedding by SIGNED FEATURE HASHING
    (Weinberger et al. 2009's hashing trick): each word scatters ±1 into
    bucket md5(word) mod dim (sign from the next hash nibble), then the
    vector L2-normalizes. Not a learned embedding — but a real,
    collision-tolerant one (inner products are unbiased estimates of
    word-overlap similarity), fully deterministic, and derivable by any
    engine from md5 alone, which makes the chunk -> embed -> ANN loop
    end-to-end value-oracled with no model stub.

    Components before normalization are INTEGER sums of ±1 — exact in
    both engines; the single float op is the final 1/sqrt(sum sq)
    scale. Cost caveat (measured r7, BENCH/curation_paths.md): the raw
    scatter is O(dim x n_words) per row, but the L2-normalize wrapper
    re-evaluates the raw aggregate per output slot (no common-subexpr
    elimination through when/transform), so the END-TO-END expression
    is effectively O(dim^2 x n_words) per row — it cliffs hard past
    dim ~16. Use this form only when the tiny-dim pass must stay fused
    into a scan; ``hash_embed_udf`` (bit-identical Arrow scatter,
    O(n_words + dim), flat across dims) is the default for standalone
    embedding jobs and anything above dim 16.
    Returns array<double> of length ``dim`` (all-zero docs embed as the
    zero vector, not NaN)."""
    from .text import words

    ws = words(F.coalesce(text, F.lit("")))
    bucket = lambda w: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit("e:"), w)), 1, 15), 16, 10
    ).cast("long") % dim
    sign = lambda w: F.when(  # noqa: E731
        F.conv(F.substring(F.md5(F.concat(F.lit("s:"), w)), 1, 1), 16, 10).cast("int") % 2
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            ws, F.lit(0.0), lambda acc, w: acc + F.when(bucket(w) == j, sign(w)).otherwise(F.lit(0.0))
        ),
    )
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(nrm > 0, F.transform(raw, lambda x: x / nrm)).otherwise(raw)


def hash_embed_udf(dim: int = 64):
    """Arrow-kernel twin of ``hash_embed`` for LARGE dims (r6 VERDICT
    ask #4): the expression form is O(dim x n_words) per row because
    each output slot re-scans the word list, so its cost grows linearly
    with dim; this Pandas UDF one-pass SCATTERS each word's +-1 into its
    bucket (O(n_words + dim) per row) and wins once dim is large —
    measured crossover in BENCH/curation_paths.md. Values are
    BIT-IDENTICAL to the expression form: bucket/sign come from the same
    md5 devices (hashlib over UTF-8 == Spark/DuckDB md5), the
    pre-normalization components are exact integer sums, and the one
    float op (x / sqrt(sum sq)) is the same IEEE double op in both
    paths. Per-batch word->(bucket, sign) memo exploits vocabulary
    repetition across the Arrow batch."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Java regex \\s is ASCII-only; mirror it (re.ASCII) so tokenization
    # matches functions.text.words exactly
    split_ws = re.compile(r"\s+", re.ASCII)

    # NOTE: module-level `from __future__ import annotations` stringifies
    # type hints, which breaks pandas_udf's eval-type inference — set the
    # annotations as live objects instead
    def k(texts):
        memo: dict[str, tuple[int, float]] = {}

        def slot(w: str) -> tuple[int, float]:
            got = memo.get(w)
            if got is None:
                b = int(hashlib.md5(b"e:" + w.encode()).hexdigest()[:15], 16) % dim
                s = 1.0 if int(hashlib.md5(b"s:" + w.encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
                got = memo[w] = (b, s)
            return got

        out = []
        for t in texts:
            raw = np.zeros(dim, dtype=np.float64)
            for w in split_ws.split(("" if t is None else t).strip().lower()):
                if w:
                    b, s = slot(w)
                    raw[b] += s
            nrm = float(np.sqrt(float(raw @ raw)))
            out.append(raw / nrm if nrm > 0 else raw)
        return pd.Series(out)

    k.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(k, "array<double>")
