"""Behavioral analytics over event streams: ordered funnel conversion
and cohort retention — the two rollups a product/crawl telemetry team
runs daily, expressed shuffle-frugally (everything keys on the user
once; all step/cohort arithmetic is exact int64 micros until the final
rate division, per the cross-engine float policy at
plans/driver_queries.py:5-9).

Reference scope: the reference engine's windowed labeling + metrics
families (SURVEY.md section 2.8) stop at per-recording rollups; these
are the corpus-telemetry counterparts a 100 TB ingestion pipeline needs
(did users who VIEWED convert to CLICK then PURCHASE; does a crawl
cohort stay active).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_WEEK = 7 * US_PER_DAY


def _us(ts_col: str) -> Column:
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    horizon_s: int = 172_800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """E95: first-touch ordered funnel — per user, step 1 anchors at the
    user's EARLIEST step-1 event; each later step k anchors at the
    earliest step-k event inside (t_{k-1}, t_{k-1} + horizon]. Users are
    cohorted by the epoch day of their step-1 anchor; output is one row
    per (cohort day) with the users reaching each step and the
    step-over-step conversion rates.

    Scale shape: ONE corpus-scale exchange — the user-keyed window; the
    chained per-step minima are stacked UNORDERED aggregate windows over
    the same key (one Exchange, no sort), the per-user collapse reuses
    that partitioning (groupBy on the window key is shuffle-free under
    AQE), and the final per-day rollup is a bounded |days|-row exchange.
    Anchoring arithmetic is exact int64 micros; no floats until the two
    rate divisions. At 100 TB nothing here amplifies rows and no join
    exists to skew.
    """
    if not 2 <= len(steps) <= 4:
        raise ValueError("funnel_conversion supports 2-4 steps")
    w = Window.partitionBy(user_col)
    horizon_us = int(horizon_s) * 1_000_000
    cur = df.select(user_col, _us(ts_col).alias("__us"), F.col(type_col).alias("__t"))
    anchors: list[str] = []
    for i, step in enumerate(steps):
        col = f"__a{i}"
        if i == 0:
            cond = F.when(F.col("__t") == step, F.col("__us"))
        else:
            prev = F.col(anchors[-1])
            cond = F.when(
                (F.col("__t") == step)
                & (F.col("__us") > prev)
                & (F.col("__us") <= prev + F.lit(horizon_us)),
                F.col("__us"),
            )
        cur = cur.withColumn(col, F.min(cond).over(w))
        anchors.append(col)
    per_user = cur.groupBy(user_col).agg(*[F.max(a).alias(a) for a in anchors])
    return funnel_rollup(per_user, n_steps=len(steps))


def funnel_rollup(per_user: DataFrame, n_steps: int = 3) -> DataFrame:
    """The per-user-anchors -> per-cohort-day funnel tail shared by the
    batch path and the E95-S streaming leg (where ``per_user`` is the
    drained latest state row per user). Expects anchor columns
    __a0..__a{n_steps-1} in int64 micros."""
    anchors = [f"__a{i}" for i in range(n_steps)]
    day = (
        per_user.filter(F.col(anchors[0]).isNotNull())
        .withColumn(
            "cohort_day", F.floor(F.col(anchors[0]) / F.lit(US_PER_DAY)).cast("long")
        )
        .groupBy("cohort_day")
        .agg(
            *[
                F.sum(F.col(a).isNotNull().cast("long")).alias(f"n_step{i + 1}")
                for i, a in enumerate(anchors)
            ]
        )
    )
    out_cols = [F.col("cohort_day")] + [
        F.col(f"n_step{i + 1}") for i in range(n_steps)
    ]
    for i in range(1, n_steps):
        out_cols.append(
            F.when(
                F.col(f"n_step{i}") > 0,
                F.round(
                    F.col(f"n_step{i + 1}").cast("double")
                    / F.col(f"n_step{i}").cast("double"),
                    6,
                ),
            ).alias(f"conv_{i}_{i + 1}")
        )
    return day.select(*out_cols)


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """E96: weekly cohort retention — users are cohorted by the epoch
    week of their FIRST event; for every (cohort_week, age_week) the
    output counts users still active that week plus the retention rate
    vs the cohort's week-0 size. The triangle a telemetry team reads to
    see whether a crawl source / user population decays.

    Scale shape: one user-keyed window (the corpus-scale exchange)
    computes the first-event week; the (user, age) collapse reuses that
    partitioning; the (cohort, age) rollup and the week-0 backfill
    window run on the bounded weeks x weeks triangle. All week/age
    arithmetic is exact int64; the single division is the final rate.
    """
    wk = F.floor(_us(ts_col) / F.lit(US_PER_WEEK)).cast("long")
    return cohort_triangle(df.select(user_col, wk.alias("__wk")), user_col=user_col)


def cohort_triangle(pairs: DataFrame, user_col: str = "user_id") -> DataFrame:
    """The (user, epoch-week) -> retention-triangle tail shared by the
    batch path (cohort_retention) and the E96-S streaming leg (where
    ``pairs`` is the drained incrementally-maintained per-(user, week)
    activity state). Duplicate (user, week) rows are fine — the
    per-(user, cohort, age) collapse dedups them."""
    w = Window.partitionBy(user_col)
    base = (
        pairs.select(user_col, F.col("__wk").cast("long").alias("__wk"))
        .withColumn("__fw", F.min("__wk").over(w))
        .groupBy(user_col, F.col("__fw").alias("cohort_week"), (F.col("__wk") - F.col("__fw")).alias("age_week"))
        .agg(F.lit(1))
        .groupBy("cohort_week", "age_week")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    w0 = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("age_week") == 0, F.col("n_active"))).over(w0)
    return base.withColumn("cohort_size", size.cast("long")).select(
        "cohort_week",
        "age_week",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active").cast("double") / F.col("cohort_size").cast("double"), 6).alias(
            "retention"
        ),
    )
