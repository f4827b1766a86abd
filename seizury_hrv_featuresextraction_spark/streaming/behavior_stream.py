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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
