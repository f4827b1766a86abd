"""Sequence-tensor building (reference lstm_sequences.py -> O45/O37/O7).

features table -> per-doc time-sorted trailing frames of seq_len feature
vectors, label/timestamp from the last row, NaN->0 first; optional
global z-normalization (two-pass) and class weights. The HDF5 tensor
sink (O7) becomes a parquet table with an array<array<double>> column —
columnar, splittable, and schema'd, which is what you want at 100 TB
instead of one giant HDF5 file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hrv import ALL_FEATURES
from ..operators.stats import class_weights, zscore_normalize
from ..operators.windows import trailing_frames


def build_sequences(
    features: DataFrame,
    seq_len: int = 36,
    feature_cols: list[str] | None = None,
    normalize: bool = False,
) -> DataFrame:
    """(doc_id, ts, X[seq_len][n_feat], label) per lstm_sequences.py:104-160.

    Label and timestamp come from the LAST row of each frame (:157);
    docs with < seq_len rows emit nothing (:117-118).
    """
    cols = feature_cols or ALL_FEATURES
    df = features
    if normalize:
        df = zscore_normalize(df, cols, ddof=0)
        cols = [c + "_z" for c in cols]
    framed = trailing_frames(
        df, by="doc_id", order_col="window_center_time",
        feature_cols=cols, seq_len=seq_len, frame_col="X",
    )
    return framed.select(
        "doc_id",
        F.col("window_center_time").alias("ts"),
        "X",
        F.col("label").cast("int").alias("label"),
    )


def sequence_dataset_info(sequences: DataFrame) -> dict:
    """dataset_info.json twin (O8/O38): counts + class weights."""
    n = sequences.count()
    weights = {r["label"]: r["weight"] for r in class_weights(sequences, "label").collect()}
    hist = {r["label"]: r["count"] for r in
            sequences.groupBy("label").agg(F.count(F.lit(1)).alias("count")).collect()}
    return {"n_sequences": n, "label_histogram": hist, "class_weights": weights}
