"""Windowing library: sliding grids, gap sessionization, lag/lead +
backfill, trailing sequence frames — all native window functions.

Reference parity targets:
- O41 sliding grid (data_processing_pipeline.py:692-713): integer-sample
  arithmetic, NOT F.window() alignment — generated explicitly with
  sequence()+explode so the grid matches the reference exactly.
- O45 trailing frames (lstm_sequences.py:104-160): 36-row trailing frame,
  label/timestamp from the LAST row, emitted only when full.
- O46 gap sessionization (evaluate_loso.py:91-115): new episode when the
  gap between consecutive timestamps exceeds a threshold.
- O48 debounce (stream_emulator.py:210-249): run-length state over a
  boolean stream, batch shape (gaps-and-islands of positives).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sliding_window_grid(
    doc_dims: DataFrame,
    window_samples: int,
    step_samples: int,
    sampling_rate: int,
) -> DataFrame:
    """(doc_id, n_samples) -> one row per (doc_id, window) with the
    reference's integer-sample grid. Native sequence()+explode (a UDTF
    shape, no Python)."""
    n_win = (F.col("n_samples") - window_samples) / step_samples  # floor via cast below
    n_win = F.floor(n_win).cast("long") + 1
    fs = float(sampling_rate)
    return (
        doc_dims.withColumn("n_windows", F.greatest(F.lit(0), n_win))
        .filter(F.col("n_windows") > 0)
        .withColumn("window_id", F.explode(F.sequence(F.lit(0), F.col("n_windows") - 1)))
        .select(
            "doc_id",
            "window_id",
            (F.col("window_id") * step_samples).alias("start_sample"),
            (F.col("window_id") * step_samples + window_samples // 2).alias("center_sample"),
            (F.col("window_id") * step_samples + window_samples).alias("end_sample"),
            (F.col("window_id") * step_samples / fs).alias("window_start_time"),
            ((F.col("window_id") * step_samples + window_samples // 2) / fs).alias("window_center_time"),
            ((F.col("window_id") * step_samples + window_samples) / fs).alias("window_end_time"),
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str] | str,
    gap: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands: new session when ts - lag(ts) > gap (strict >,
    evaluate_loso.py:96-98). session_id counts from 0 per key."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by).orderBy(ts_col)
    gap_flag = (F.col(ts_col) - F.lag(ts_col).over(w) > gap).cast("int")
    return df.withColumn(
        session_col,
        F.sum(F.coalesce(gap_flag, F.lit(0))).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_bounds(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str] | str,
    gap: float,
) -> DataFrame:
    """Sessionize then collapse to episodes (episode id, start, end,
    duration, n rows) — the O46 'seizure episodes' shape."""
    by = [by] if isinstance(by, str) else list(by)
    s = sessionize(df, ts_col, by, gap)
    return s.groupBy(*by, "session_id").agg(
        F.min(ts_col).alias("start_time"),
        F.max(ts_col).alias("end_time"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def backfill(
    df: DataFrame,
    value_col: str | Column,
    ts_col: str,
    by: Sequence[str] | str,
    out_col: str,
    direction: str = "backward",
) -> DataFrame:
    """Carry the last non-null value forward in time (direction=
    'backward': value observed at or before each row) or the next one
    back ('forward'). O13b/O45's NaN handling generalized."""
    by = [by] if isinstance(by, str) else list(by)
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
        filled = F.last(col, ignorenulls=True).over(w)
    else:
        w = Window.partitionBy(*by).orderBy(ts_col).rowsBetween(0, Window.unboundedFollowing)
        filled = F.first(col, ignorenulls=True).over(w)
    return df.withColumn(out_col, filled)


def resample_interpolate(
    obs: DataFrame,
    on: str,
    by: str,
    value_col: str,
    step: float,
) -> DataFrame:
    """E81: resample an irregular per-key series onto a regular time
    grid with linear interpolation (tail windows forward-filled) — the
    standalone form of the uniform-resampling step the reference's
    spectral path performs before Welch (hrv_features.py's interbeat
    resample; north-star "resampled interbeat series").

    Grid: t_k = ceil(min(on)/step)*step + k*step for k = 0..floor((max-
    gs)/step) — entirely inside [min, max], so a PREVIOUS observation
    always exists and only the exact-right-edge grid point can lack a
    strictly-later NEXT one (it forward-fills; ``tail_fill`` marks it).
    Interpolation is v_prev + (v_next - v_prev) * (t - e_prev) /
    (e_next - e_prev): identical IEEE arithmetic from identical doubles
    in any engine, so the output is value-twinnable without tolerance.

    Scale shape (the union+window gap-fill device, NOT two as-of
    joins): duplicate observation times are first collapsed (max value
    per (key, t) — makes prev/next well-defined), per-key bounds come
    from ONE tiny partial-agged groupBy, grid rows are amplified
    map-locally from the bounds rows (sequence+explode), and prev/next
    both come from two frames over ONE (key, t) sort — so the corpus is
    exchanged once for the fill, there are ZERO joins, and the grid
    exchange is the (bounded) grid itself. Two as-of joins would
    exchange the corpus twice and sort four times.
    """
    o = (
        obs.groupBy(F.col(by).alias("k"), F.col(on).alias("t"))
        .agg(F.max(value_col).alias("v"))
        .withColumn("is_obs", F.lit(1))
    )
    bounds = o.groupBy("k").agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
    gs = F.ceil(F.col("mn") / F.lit(step)) * F.lit(step)
    n = F.floor((F.col("mx") - gs) / F.lit(step)).cast("long")
    grid = (
        bounds.select("k", gs.alias("gs"), n.alias("n"))
        .filter(F.col("n") >= 0)
        .select("k", "gs", F.explode(F.sequence(F.lit(0).cast("long"), F.col("n"))).alias("i"))
        .select(
            "k",
            (F.col("gs") + F.col("i") * F.lit(step)).alias("t"),
            F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("is_obs"),
        )
    )
    u = o.select("k", "t", "v", "is_obs").unionByName(grid)
    # obs sorts before the grid marker at an equal t, so the backward
    # frame is inclusive (prev e <= t) and the forward frame strict
    # (next e > t) — no self-match, no zero denominator.
    order = [F.col("t").asc(), F.col("is_obs").desc()]
    wb = Window.partitionBy("k").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.partitionBy("k").orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
    obs_t = F.when(F.col("is_obs") == 1, F.col("t"))
    filled = (
        u.withColumn("pv", F.last("v", ignorenulls=True).over(wb))
        .withColumn("pt", F.last(obs_t, ignorenulls=True).over(wb))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wf))
        .withColumn("nt", F.first(obs_t, ignorenulls=True).over(wf))
        .filter(F.col("is_obs") == 0)
    )
    interp = F.when(F.col("nt").isNull(), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv")) * (F.col("t") - F.col("pt")) / (F.col("nt") - F.col("pt"))
    )
    return filled.select(
        F.col("k").alias(by),
        F.col("t").alias(on),
        interp.alias(value_col),
        F.col("nt").isNull().alias("tail_fill"),
    )


def trailing_frames(
    df: DataFrame,
    by: Sequence[str] | str,
    order_col: str,
    feature_cols: Sequence[str],
    seq_len: int,
    frame_col: str = "X",
    nan_to_zero: bool = True,
) -> DataFrame:
    """O45: per key ordered by ``order_col``, emit rows whose trailing
    ``seq_len``-row frame is full; frame = array of feature arrays
    (oldest first), label/ts from the last row (= the current row).

    NaN features are zeroed first (lstm_sequences.py:130-135).
    """
    by = [by] if isinstance(by, str) else list(by)
    feats = [
        F.coalesce(F.nanvl(F.col(c), F.lit(0.0)), F.lit(0.0)) if nan_to_zero else F.col(c)
        for c in feature_cols
    ]
    vec = F.array(*feats)
    w = Window.partitionBy(*by).orderBy(order_col).rowsBetween(-(seq_len - 1), 0)
    out = df.withColumn(frame_col, F.collect_list(vec).over(w))
    return out.filter(F.size(frame_col) == seq_len)


def debounce(
    df: DataFrame,
    by: Sequence[str] | str,
    order_col: str,
    positive: Column,
    k: int,
    alarm_col: str = "alarm",
) -> DataFrame:
    """O48: alarm fires on the k-th consecutive positive and then LATCHES
    for the rest of the key — the reference's ``alarm_active`` is set once
    (stream_emulator.py:231,242) and only reset between recordings
    (``reset_state``, :122-127,263), so at most ONE alarm per key.

    Batch gaps-and-islands: runs of positives get a run id; the alarm is
    the FIRST row whose within-run positive rank reaches k.
    """
    by = [by] if isinstance(by, str) else list(by)
    cum = Window.partitionBy(*by).orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    pos = positive.cast("int")
    df = df.withColumn("__pos", pos)
    # run id: number of negatives seen so far
    df = df.withColumn("__run", F.sum(1 - F.col("__pos")).over(cum))
    wrun = Window.partitionBy(*by, "__run").orderBy(order_col)
    df = df.withColumn("__pos_rank", F.sum("__pos").over(wrun.rowsBetween(Window.unboundedPreceding, 0)))
    cand = ((F.col("__pos") == 1) & (F.col("__pos_rank") == k)).cast("int")
    df = df.withColumn("__cand", cand)
    out = df.withColumn(
        alarm_col, (F.col("__cand") == 1) & (F.sum("__cand").over(cum) == 1)
    )
    return out.drop("__pos", "__run", "__pos_rank", "__cand")


def decay_features(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    n_lags: int = 4,
    out_col: str = "ewma",
) -> DataFrame:
    """E88: bounded-lag exponentially-weighted moving average per key —
    the tsfresh/feature-store trend feature (recent observations weigh
    more) in a form a distributed engine can twin exactly: the infinite
    recursive EWMA is order-dependent and unbounded-history, so it is
    truncated at n_lags,

        ewma_t = (sum_{j=0..L} a^j * x_{t-j}) / (sum over AVAILABLE j of a^j)

    with head rows (fewer than L predecessors) normalized by the
    weights actually present — no warm-up bias, no NULL propagation.

    Determinism devices: alpha defaults to 0.5 (an exact binary
    fraction, so a^j is exact and the weighted terms are single
    correctly-rounded IEEE multiplies) and both numerator and
    denominator fold in ONE FIXED left-to-right order (j = 0..L), so
    the result is bit-identical across engines/partitionings before
    the round(·,6).

    Scale shape: ONE window sort per key (the same exchange the O42
    lag/diff family already pays — composes with it for free); the lag
    chain is in-row expression work, zero joins, zero Python.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    num = F.col(value_col).cast("double")
    den = F.lit(1.0)
    for j in range(1, n_lags + 1):
        lj = F.lag(F.col(value_col).cast("double"), j).over(w)
        wj = F.lit(float(alpha**j))
        num = num + F.when(lj.isNotNull(), wj * lj).otherwise(F.lit(0.0))
        den = den + F.when(lj.isNotNull(), wj).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den, 6))


def time_weighted_avg(
    obs: DataFrame,
    on: str,
    by: str,
    value_col: str,
    bucket_us: int = 3_600_000_000,
    value_scale: int = 100,
) -> DataFrame:
    """E114: per-(key, bucket) TIME-weighted average of an irregular
    series under zero-order hold — each observation's value holds from
    its timestamp to the NEXT observation, and that holding interval is
    apportioned across the fixed time buckets it spans.  The plain
    row-average the O21-O26 aggs compute over-weights bursts (10 events
    in a minute count 10x); TWA is the telemetry/feature-store answer
    and what "average heart rate over the hour" actually means for
    irregular RR observations.

    Returns (``by``, bucket_us_start, covered_us, twa) — buckets a key
    never covers are absent; covered_us < bucket_us flags partial
    coverage at series edges (the last observation holds nothing: its
    horizon is unknown).

    Exactness device: the weighted integral is INT64 fixed-point —
    v_fp = round(v * value_scale) and microsecond overlaps are exact
    integers, and per group sum(v_fp * ov) <= value_scale * max|v| *
    bucket_us no matter how many rows land in the bucket (overlaps
    within one bucket tile it), so the sum cannot overflow and is
    shuffle-order-free.  The only float op is the final one divide of
    two exact int64s — bit-identical in any engine, twin-able without
    tolerance.

    Scale shape (same family as E81's union+window device): duplicate
    timestamps are collapsed map-side (max per (key, t) — makes the
    hold interval well-defined), ONE window sort per key finds each
    observation's horizon, bucket apportionment is map-local
    sequence+explode (amplification = buckets spanned, bounded by
    span/bucket), and ONE (key, bucket) agg finishes — zero joins,
    nothing but the corpus exchanged once for the sort and once
    (pre-aggregated) for the group.
    """
    o = (
        obs.select(
            F.col(by).alias("k"),
            F.unix_micros(F.col(on).cast("timestamp")).alias("us"),
            F.col(value_col).cast("double").alias("v"),
        )
        .where(F.col("us").isNotNull() & F.col("v").isNotNull())
        .groupBy("k", "us")
        .agg(F.max("v").alias("v"))
    )
    w = Window.partitionBy("k").orderBy("us")
    s = o.withColumn("nxt", F.lead("us").over(w)).where(
        F.col("nxt").isNotNull() & (F.col("nxt") > F.col("us"))
    )
    B = F.lit(int(bucket_us))
    bus = int(bucket_us)
    # FLOOR division, not `div` (which truncates toward zero): pre-epoch
    # timestamps must land in bucket -1, not be folded into bucket 0 and
    # have their sub-epoch mass dropped; x - positive_mod(x) is exactly
    # divisible, so the truncating div after it IS the floor
    fd_lo = f"(us - ((us % {bus} + {bus}) % {bus})) div {bus}"
    fd_hi = f"((nxt - 1) - (((nxt - 1) % {bus} + {bus}) % {bus})) div {bus}"
    seg = s.select(
        "k",
        "us",
        "nxt",
        F.round(F.col("v") * F.lit(int(value_scale))).cast("long").alias("v_fp"),
        F.explode(F.sequence(F.expr(fd_lo), F.expr(fd_hi))).alias("b"),
    )
    ov = seg.select(
        "k",
        "b",
        "v_fp",
        (
            F.least(F.col("nxt"), (F.col("b") + 1) * B) - F.greatest(F.col("us"), F.col("b") * B)
        ).alias("o_us"),
    )
    g = ov.groupBy("k", "b").agg(
        F.sum(F.col("v_fp") * F.col("o_us")).alias("num"),
        F.sum("o_us").alias("den"),
    )
    return g.select(
        F.col("k").alias(by),
        (F.col("b") * B).cast("long").alias("bucket_us_start"),
        F.col("den").cast("long").alias("covered_us"),
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double") / F.lit(float(value_scale)), 6
        ).alias("twa"),
    )
