"""Evaluation operators (reference evaluate_loso.py -> O40, O20, O46, O52).

- ``seizure_episodes``: label-2 windows sessionized into episodes with
  the reference's >30 s gap rule (evaluate_loso.py:91-115).
- ``loso_splits``: leave-one-(subject,recording)-out split pairs as
  semi/anti joins (evaluate_loso.py:137-160).
- ``detection_metrics``: confusion counts, sensitivity/specificity and
  FPR-per-hour (fp / (neg_windows * stride / 3600),
  evaluate_loso.py:253-288) as native aggregations.
- ``latest_alarm_before_onset``: arg-max by time (stream_emulator.py:
  366-368) via max_by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import session_bounds


def seizure_episodes(features: DataFrame, gap: float = 30.0) -> DataFrame:
    sz = features.filter(F.col("label") == 2)
    b = session_bounds(sz, "window_center_time", ["doc_id"], gap)
    return b.select(
        "doc_id",
        F.concat_ws("_", F.col("doc_id"), F.lit("seizure"), F.col("session_id").cast("string")).alias("episode_id"),
        "start_time",
        "end_time",
        "duration",
        F.col("n_rows").alias("n_windows"),
    )


def loso_splits(features: DataFrame) -> DataFrame:
    """One row per held-out doc: (held_out_doc, n_test, n_train)."""
    docs = features.select("doc_id").distinct()
    counts = features.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    total = features.count()
    return (
        docs.join(counts, "doc_id")
        .select(
            F.col("doc_id").alias("held_out_doc"),
            F.col("n").alias("n_test"),
            (F.lit(total) - F.col("n")).alias("n_train"),
        )
    )


def detection_metrics(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    stride_seconds: float = 5.0,
) -> DataFrame:
    """Binary confusion + sensitivity/specificity/FPR-per-hour.

    Positive class: label >= 1 (pre-seizure or ictal), matching the
    reference's window-level evaluation.
    """
    pos = (F.col(label_col) >= 1).cast("int")
    pred = F.col(pred_col).cast("int")
    agg = scored.agg(
        F.sum(pos * pred).alias("tp"),
        F.sum(pos * (1 - pred)).alias("fn"),
        F.sum((1 - pos) * pred).alias("fp"),
        F.sum((1 - pos) * (1 - pred)).alias("tn"),
    )
    return agg.select(
        "tp", "fn", "fp", "tn",
        F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn")))
        .otherwise(F.lit(0.0)).alias("sensitivity"),
        F.when(F.col("tn") + F.col("fp") > 0, F.col("tn") / (F.col("tn") + F.col("fp")))
        .otherwise(F.lit(0.0)).alias("specificity"),
        F.when(
            F.col("tn") + F.col("fp") > 0,
            F.col("fp") / ((F.col("tn") + F.col("fp")) * F.lit(stride_seconds) / 3600.0),
        ).otherwise(F.lit(0.0)).alias("fpr_per_hour"),
    )


def latest_alarm_before_onset(alarms: DataFrame, events: DataFrame) -> DataFrame:
    """Per (doc, onset): the latest alarm time strictly before onset."""
    j = alarms.join(F.broadcast(events), "doc_id").filter(
        F.col("alarm_time") < F.col("onset")
    )
    return j.groupBy("doc_id", "onset").agg(
        F.max("alarm_time").alias("latest_alarm"),
        (F.col("onset") - F.max("alarm_time")).alias("warning_seconds"),
    )
