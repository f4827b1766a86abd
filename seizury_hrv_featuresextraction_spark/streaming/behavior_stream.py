"""E96-S: streaming half of the cohort-retention triangle.

A user's cohort is the epoch week of their FIRST event — and with
late/out-of-order delivery a newly arrived EARLIER event can reassign
the user's cohort, so no per-(cohort, age) cell count can be maintained
directly (cells are not monotone under reassignment). The correct
streaming state is per-(user, week) activity: Spark's incremental
stateful aggregate maintains it with state bounded at
|users| x |weeks-in-horizon| rows regardless of stream length, every
emitted row is idempotent under re-delivery (the DISTINCT pair set is
what matters), and the triangle itself is the tiny batch tail
(`operators/behavior.py:cohort_triangle` — the SAME code path the batch
operator runs, so stream and batch agree by construction once the
drained pair sets are equal).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.behavior import US_PER_WEEK


def streaming_user_week_activity(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Incrementally maintained per-(user, epoch week) event counts —
    the sufficient state for cohort retention under out-of-order
    arrival. Output columns (user_id, __wk, n_events); feed the drained
    DISTINCT (user, week) pairs to ``cohort_triangle``."""
    wk = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(US_PER_WEEK)
    ).cast("long")
    return (
        stream_df.select(F.col(user_col).alias("user_id"), wk.alias("__wk"))
        .groupBy("user_id", "__wk")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# E95-S: streaming funnel — bounded per-user state under out-of-order arrival
# ---------------------------------------------------------------------------

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("__a0", T.LongType(), True),
        T.StructField("__a1", T.LongType(), True),
        T.StructField("__a2", T.LongType(), True),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("v1", T.LongType(), True),
        T.StructField("clicks", T.ArrayType(T.LongType()), True),
        T.StructField("purchases", T.ArrayType(T.LongType()), True),
        T.StructField("version", T.LongType(), True),
    ]
)


def make_funnel_fn(steps: tuple[str, str, str], horizon_us: int):
    """Build the applyInPandasWithState function for the 3-step funnel.

    Why this state is EXACT and BOUNDED under out-of-order arrival: the
    step-1 anchor t1 = min(view ts) is monotone non-increasing as late
    events land, so the step-2 candidate window (t1, t1+H] only ever
    moves LEFT — a click beyond the CURRENT t1+H can never become a
    step-2 anchor and is safely dropped; likewise t2 in [t1, t1+H]
    bounds step-3 candidates at t1+2H. Kept state is therefore
    (t1, clicks <= t1+H, purchases <= t1+2H): bounded by the per-user
    event rate within 2 horizons once the first view arrives (before
    any view, all clicks/purchases must be retained — a later-arriving
    view can make any of them an anchor; documented unbounded-only-
    until-step-1 regime). A late EARLIER view that lowers t1 correctly
    reassigns t2/t3 because the candidate lists are state, not just the
    minima."""
    s1, s2, s3 = steps

    def fn(key, pdf_iter: "Iterator[pd.DataFrame]", state: GroupState):
        (user_id,) = key
        if state.exists:
            v1, clicks, purchases, version = state.get
            clicks = list(clicks or [])
            purchases = list(purchases or [])
        else:
            v1, clicks, purchases, version = None, [], [], 0
        for pdf in pdf_iter:
            for t, us in zip(pdf["__t"], pdf["__us"]):
                # a NULL timestamp arrives as NaN; int(nan) would kill
                # the whole streaming query, while the batch operator's
                # F.min silently skips NULLs — match batch semantics
                if pd.isna(us):
                    continue
                us = int(us)
                version += 1
                if t == s1:
                    v1 = us if v1 is None else min(v1, us)
                elif t == s2:
                    clicks.append(us)
                elif t == s3:
                    purchases.append(us)
        if v1 is not None:
            clicks = [c for c in clicks if c <= v1 + horizon_us]
            purchases = [p for p in purchases if p <= v1 + 2 * horizon_us]
        clicks.sort()
        purchases.sort()
        a0, a1, a2 = v1, None, None
        if a0 is not None:
            a1 = next((c for c in clicks if a0 < c <= a0 + horizon_us), None)
        if a1 is not None:
            a2 = next((p for p in purchases if a1 < p <= a1 + horizon_us), None)
        state.update((v1, clicks, purchases, version))
        yield pd.DataFrame(
            [(user_id, version, a0, a1, a2)],
            columns=["user_id", "version", "__a0", "__a1", "__a2"],
        )

    return fn


def streaming_funnel_anchors(
    stream_df: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    horizon_s: int = 172_800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """E95-S: incrementally maintained per-user funnel anchors — emits
    (user_id, version, __a0, __a1, __a2) every trigger; ``version``
    counts processed events per user (monotone), so the drained sink's
    max-version row per user is the current state. Feed those rows to
    ``operators.behavior.funnel_rollup`` (the SAME tail the batch
    operator runs) for the per-cohort-day funnel."""
    fn = make_funnel_fn(steps, int(horizon_s) * 1_000_000)
    src = stream_df.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(type_col).alias("__t"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
