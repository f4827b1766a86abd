"""E114-S: streaming half of the time-weighted average.

The batch operator (`operators/windows.py:time_weighted_avg`) needs
each observation's horizon — the NEXT observation per key — which a
stream only learns later.  So the streaming leg keeps exactly ONE
pending observation per key in state (bounded O(1): last_us, last
fixed-point value) and, when the next observation for that key
arrives, EMITS the completed hold interval apportioned across buckets
— the identical int64 segment rows the batch formulation integrates.
Aggregation to (key, bucket) TWA is the tiny batch tail
(`twa_from_segments`, the SAME code path the batch test uses), keeping
one stateful operator per query (the E96-S/E63 shape).

Ordering contract: per-key event times must be non-decreasing across
triggers (the file/Kafka-partition-per-key case); a row at or before
the pending observation's timestamp is LATE and dropped — within one
trigger, duplicate timestamps collapse to the max value exactly like
the batch operator's map-side collapse.  Fixed-point rounding uses the
decimal-string HALF_UP that Spark's `round` applies, so emitted
segments are bit-identical to the batch plan's.
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("v_fp", T.LongType(), False),
        T.StructField("o_us", T.LongType(), False),
    ]
)

TWA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType(), True),
        T.StructField("last_vfp", T.LongType(), True),
    ]
)


def _vfp(v: float, scale: int) -> int:
    # Spark round() = BigDecimal.valueOf(double) + HALF_UP, i.e. HALF_UP
    # on the shortest decimal repr — Python's round() banker's-rounds and
    # would diverge at exact .5 products (v=0.125, scale=100 -> 12.5)
    return int(
        decimal.Decimal(repr(v * scale)).to_integral_value(decimal.ROUND_HALF_UP)
    )


def make_twa_fn(bucket_us: int, value_scale: int):
    """Build the applyInPandasWithState function (importable for pure
    unit tests of the segment arithmetic)."""

    def fn(key, pdf_iter, state: GroupState):
        k = int(key[0])
        last = tuple(state.get) if state.exists else None
        obs: dict[int, int] = {}
        for pdf in pdf_iter:
            for us, v in zip(pdf["us"], pdf["v"]):
                us = int(us)
                vfp = _vfp(float(v), value_scale)
                # batch parity: duplicate timestamps keep the MAX value
                if us not in obs or vfp > obs[us]:
                    obs[us] = vfp
        out: list[tuple[int, int, int, int]] = []
        for us in sorted(obs):
            vfp = obs[us]
            if last is not None:
                lus, lvfp = last
                if us <= lus:
                    continue  # late (or cross-trigger dup): dropped
                # floor division — // is already the floor in Python
                for b in range(lus // bucket_us, (us - 1) // bucket_us + 1):
                    o_us = min(us, (b + 1) * bucket_us) - max(lus, b * bucket_us)
                    out.append((k, b, lvfp, o_us))
            last = (us, vfp)
        if last is not None:
            state.update(last)
        if out:
            yield pd.DataFrame(out, columns=["k", "b", "v_fp", "o_us"])

    return fn


def streaming_twa_segments(
    stream: DataFrame,
    on: str,
    by: str,
    value_col: str,
    bucket_us: int = 3_600_000_000,
    value_scale: int = 100,
) -> DataFrame:
    """Completed hold-interval segments (k, b, v_fp, o_us) from a
    stream; state is one pending observation per key."""
    df = (
        stream.select(
            F.col(by).cast("long").alias("k"),
            F.unix_micros(F.col(on).cast("timestamp")).alias("us"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(F.col("us").isNotNull() & F.col("v").isNotNull())
    )
    return df.groupBy("k").applyInPandasWithState(
        make_twa_fn(int(bucket_us), int(value_scale)),
        SEGMENT_SCHEMA,
        TWA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def twa_from_segments(
    segments: DataFrame,
    by: str = "user_id",
    bucket_us: int = 3_600_000_000,
    value_scale: int = 100,
) -> DataFrame:
    """The bounded batch tail: (key, bucket) TWA from segment rows —
    identical output columns to the batch operator."""
    B = F.lit(int(bucket_us))
    return (
        segments.groupBy("k", "b")
        .agg(
            F.sum(F.col("v_fp") * F.col("o_us")).alias("num"),
            F.sum("o_us").alias("den"),
        )
        .select(
            F.col("k").alias(by),
            (F.col("b") * B).cast("long").alias("bucket_us_start"),
            F.col("den").cast("long").alias("covered_us"),
            F.round(
                F.col("num").cast("double")
                / F.col("den").cast("double")
                / F.lit(float(value_scale)),
                6,
            ).alias("twa"),
        )
    )
