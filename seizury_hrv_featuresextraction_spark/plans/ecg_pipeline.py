"""Optional signal front-end plan: raw ECG table -> pre-tokenized
sequences (the input_hint table) -> flagship features.

Input shape: (doc_id string, signal array<double>, sampling_rate int) —
one recording per row (the Spark analogue of the reference's per-EDF
processing, data_processing_pipeline.py:628-679). The whole DSP chain
(bandpass filtfilt, R-peak detection, artifact filtering, int-ms
tokenization) runs in one Arrow stage; the output feeds
plans.hrv_pipeline.extract_features unchanged.

At scale, recordings are hours (≈1M samples @256 Hz ≈ 8 MB/row) — one
row per task unit is the right granularity because the IIR is
sequential; skew across recording lengths is then handled by the
flagship chunk-split downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from ..schemas import SEQUENCES_SCHEMA


def signals_to_sequences(signals: DataFrame, artifact_method: str = "threshold") -> DataFrame:
    """(doc_id, signal, sampling_rate) -> (doc_id, tokens, n_tok, source)."""

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..functions.ecg import ecg_to_tokens

        for batch in batches:
            if not batch.num_rows:
                continue
            cols = {batch.schema.names[i]: batch.column(i) for i in range(batch.num_columns)}
            doc_ids = cols["doc_id"].to_pylist()
            rates = cols["sampling_rate"].to_numpy(zero_copy_only=False)
            sig_list = cols["signal"]
            off = sig_list.offsets.to_numpy(zero_copy_only=False)
            flat = sig_list.values.to_numpy(zero_copy_only=False)

            toks: list[np.ndarray] = []
            for i in range(batch.num_rows):
                sig = flat[int(off[i]) : int(off[i + 1])]
                toks.append(ecg_to_tokens(sig, int(rates[i]), artifact_method))
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            new_off = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=new_off[1:])
            vals = np.concatenate(toks) if toks else np.array([], dtype=np.int32)
            tok_arr = pa.LargeListArray.from_arrays(
                pa.array(new_off, type=pa.int64()), pa.array(vals, type=pa.int32())
            ).cast(pa.list_(pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, type=pa.string()),
                    tok_arr,
                    pa.array(lens.astype(np.int32), type=pa.int32()),
                    pa.array(["ecg-frontend-v1"] * batch.num_rows, type=pa.string()),
                ],
                names=["doc_id", "tokens", "n_tok", "source"],
            )

    return signals.mapInArrow(gen, schema=SEQUENCES_SCHEMA)
