"""E115: Fellegi–Sunter probabilistic record linkage scoring.

Reference parity: none (the reference has no linkage pass); this closes
the record-linkage family the E76 blocked edit-distance pairs opened —
FS is the canonical model (Fellegi & Sunter 1969, JASA) behind every
production entity-resolution system (Splink et al.): candidate pairs
from BLOCKING, a per-field agreement vector, and a match/non-match
likelihood ratio composed from per-field m- and u-probabilities.

Unsupervised u estimation: u_k (P(field k agrees | non-match)) is
taken as the observed agreement rate over ALL blocked pairs — the
standard shortcut when matches are rare (matches perturb the rate by
O(match prevalence)).  m_k (P(agree | match)) are caller-supplied
priors, passed as EXACT RATIONALS (num, den).

Determinism device (why there is no log-weight in sight): the usual
sum of ln(m/u) weights is transcendental — engines may differ in the
last ulp and a hash gate needs bit-equality.  Instead the likelihood
RATIO is computed directly: every per-field factor is one division of
two EXACT int64 products ((m_num * n) / (m_den * c_k) on agreement,
((m_den - m_num) * n) / (m_den * (n - c_k)) on disagreement — both
correctly-rounded IEEE doubles from exact integers), and factors fold
in ONE FIXED left-to-right order (the dict's insertion order, which
the SQL twin mirrors), so the product is bit-identical in any engine.
c_k is clamped to [1, n-1] so degenerate all-agree / none-agree fields
stay finite without a divide-by-zero branch.

Scale shape: ONE count aggregate over the blocked pairs produces the
1-row (n, c_1..c_K) stats frame, broadcast back over the pairs (the
repo's standard 1-row crossJoin-broadcast stats device) — scoring
itself is in-row expression work, zero extra shuffles beyond whatever
the caller's blocking join already paid, and the pair count is bounded
by the blocking key's occupancy, never |A| x |B|.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fellegi_sunter_scores(
    pairs: DataFrame,
    agreements: Mapping[str, tuple[int, int]],
    out_col: str = "lr",
    threshold: float | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Score blocked candidate ``pairs`` with the FS likelihood ratio.

    ``agreements`` maps each BOOLEAN agreement column already present
    on ``pairs`` to its m-probability as an exact rational
    ``(m_num, m_den)``; u-probabilities come from the data (agreement
    counts over all pairs).  NULL agreement values count as
    disagreement in both the u-counts and the per-row factor (CASE
    semantics match across engines).  Adds ``out_col`` (the ratio,
    rounded) and, when ``threshold`` is given, boolean ``is_match``.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    for g in agreements:
        # coalesce: an all-NULL column must count as 0 agreements (the
        # clamp then takes it to 1), not slip a NULL into least() — which
        # Spark SKIPS, silently yielding c = n - 1 and ~n-fold-inflated
        # ratios
        aggs.append(
            F.coalesce(F.sum(F.col(g).cast("long")), F.lit(0).cast("long")).alias(f"_c_{g}")
        )
    stats = pairs.agg(*aggs)
    j = pairs.crossJoin(F.broadcast(stats))
    lr = F.lit(1.0)
    for g, (m_num, m_den) in agreements.items():
        if not (0 < m_num < m_den):
            raise ValueError(f"m-probability for {g!r} must satisfy 0 < num < den")
        c = F.greatest(F.lit(1).cast("long"), F.least(F.col(f"_c_{g}"), F.col("n") - 1))
        agree = (F.lit(m_num) * F.col("n")).cast("double") / (F.lit(m_den) * c).cast("double")
        # greatest(1, n - c): with a single pair (n = 1) the clamp range
        # [1, n-1] is empty and n - c would be 0 — keep the factor finite
        # (a no-op whenever n > 1, since c <= n - 1 there)
        disagree = (F.lit(m_den - m_num) * F.col("n")).cast("double") / (
            F.lit(m_den) * F.greatest(F.lit(1).cast("long"), F.col("n") - c)
        ).cast("double")
        lr = lr * F.when(F.col(g), agree).otherwise(disagree)
    out = j.select(*pairs.columns, F.round(lr, round_digits).alias(out_col))
    if threshold is not None:
        out = out.withColumn("is_match", F.col(out_col) >= F.lit(float(threshold)))
    return out
