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

from pyspark.sql import DataFrame
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
