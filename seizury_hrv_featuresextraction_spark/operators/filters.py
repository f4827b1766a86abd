"""Tachogram/series cleaning filters as native expressions.

O10 physiological range (ecg_processing.py:52-53,219-221),
O11 median/MAD artifact filter (ecg_processing.py:223-228),
O12 IQR/Tukey fences (ecg_processing.py:230-236),
O13b NaN guards (stream_emulator.py:163 etc.).

The per-key statistics use exact percentile/median (Catalyst `percentile`
/ `median`) computed once per key with a groupBy + broadcast-back join —
at 100 TB swap in `percentile_approx` behind the ``exact`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def physiological_filter(df: DataFrame, value_col: str, lo: float = 0.2, hi: float = 2.0) -> DataFrame:
    return df.filter(F.col(value_col).between(lo, hi))


def median_mad_filter(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | str,
    n_mads: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Keep rows with |v - median| <= n_mads * MAD (strict > dropped,
    ecg_processing.py:223-228). MAD = median(|v - median|)."""
    by = [by] if isinstance(by, str) else list(by)
    med_fn = (lambda c: F.median(c)) if exact else (lambda c: F.percentile_approx(c, 0.5))
    med = df.groupBy(*by).agg(med_fn(F.col(value_col)).alias("__med"))
    with_med = df.join(F.broadcast(med), by)
    mad = with_med.groupBy(*by).agg(
        med_fn(F.abs(F.col(value_col) - F.col("__med"))).alias("__mad")
    )
    out = with_med.join(F.broadcast(mad), by)
    return out.filter(
        F.abs(F.col(value_col) - F.col("__med")) <= n_mads * F.col("__mad")
    ).drop("__med", "__mad")


def iqr_filter(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | str,
    k: float = 1.5,
    exact: bool = True,
) -> DataFrame:
    """Tukey fences: keep q25 - k*IQR <= v <= q75 + k*IQR."""
    by = [by] if isinstance(by, str) else list(by)
    q_fn = (lambda c, p: F.percentile(c, F.lit(p))) if exact else (lambda c, p: F.percentile_approx(c, p))
    q = df.groupBy(*by).agg(
        q_fn(F.col(value_col), 0.25).alias("__q25"),
        q_fn(F.col(value_col), 0.75).alias("__q75"),
    )
    out = df.join(F.broadcast(q), by)
    iqr = F.col("__q75") - F.col("__q25")
    return out.filter(
        F.col(value_col).between(F.col("__q25") - k * iqr, F.col("__q75") + k * iqr)
    ).drop("__q25", "__q75")


def nan_to_zero(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """np.nan_to_num(v, 0.0) twin; also fills SQL NULLs."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.nanvl(F.col(c), F.lit(0.0)), F.lit(0.0)))
    return out


def grouped_mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    id_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """E100: per-group robust outlier flags via the modified z-score
    (Iglewicz-Hoaglin): rz = 0.6745*|x - median| / MAD, flag rz >
    z_thresh — the grouped companion of the global O11 median/MAD
    filter, for scrubbing a feature column whose scale differs per key
    (mean/stddev would let the outliers mask themselves). Medians are
    EXACT lower medians by the integer rank rule rn == (cnt+1) DIV 2
    over a deterministic (value, id) order — no percentile
    approximation, engine-reproducible under ties; MAD is the same rule
    over |x - median|. Groups with MAD = 0 (majority-constant) flag any
    nonzero deviation.

    Scale shape: two sorted windows over the SAME group key (one
    exchange, two sorts) + two unordered max-over-partition backfills;
    no joins, no row amplification. Returns only the flagged rows with
    (group, id, value, med, mad, rz).
    """
    keys = list(group_cols)
    x = F.col(value_col).cast("double")
    wg = Window.partitionBy(*keys)
    w1 = Window.partitionBy(*keys).orderBy(value_col, id_col)
    d1 = (
        # NULL values must not rank: Spark sorts them FIRST (shifting the
        # lower-median index, and a median rank landing ON a NULL makes
        # the whole group emit nothing) while DuckDB sorts them LAST —
        # a silent cross-engine divergence (r8 review finding)
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, id_col, x.alias(value_col))
        .withColumn("__rn", F.row_number().over(w1))
        .withColumn("__cnt", F.count(F.lit(1)).over(wg))
        .withColumn(
            "__med",
            F.max(
                F.when(F.col("__rn") == F.expr("(__cnt + 1) DIV 2"), F.col(value_col))
            ).over(wg),
        )
        .withColumn("__dev", F.abs(F.col(value_col) - F.col("__med")))
    )
    w2 = Window.partitionBy(*keys).orderBy("__dev", id_col)
    d2 = (
        d1.withColumn("__rn2", F.row_number().over(w2))
        .withColumn(
            "__mad",
            F.max(
                F.when(F.col("__rn2") == F.expr("(__cnt + 1) DIV 2"), F.col("__dev"))
            ).over(wg),
        )
        .withColumn(
            "__rz",
            F.when(
                F.col("__mad") > 0,
                F.round(F.lit(0.6745) * F.col("__dev") / F.col("__mad"), 6),
            ),
        )
    )
    flagged = d2.filter(
        F.when(F.col("__mad") > 0, F.col("__rz") > F.lit(float(z_thresh))).otherwise(
            F.col("__dev") > 0
        )
    )
    return flagged.select(
        *keys,
        id_col,
        value_col,
        F.col("__med").alias("med"),
        F.col("__mad").alias("mad"),
        F.col("__rz").alias("rz"),
    )
