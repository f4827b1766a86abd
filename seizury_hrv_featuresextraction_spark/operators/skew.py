"""Skew layer: salted chunk-split of long token sequences.

One input row = one doc's full token array, so per-doc work is naturally
atomic; skew shows up as a handful of 20-80k-token docs pinning single
tasks (the reference has the same problem — one long EDF recording = one
slow worker with only a 600 s timeout, data_processing_pipeline.py:905).

``explode_chunks`` is an Arrow-vectorized mapInPandas that slices each
doc's decoded tachogram into self-contained chunks of at most
``max_windows_per_chunk`` windows. Chunks overlap by ``window - stride``
seconds of RR rows so no window spans a chunk boundary — results are
exactly the per-doc computation, just re-batched. A plain round-robin
``repartition`` afterwards spreads the chunks of a long doc across the
cluster; that is the flagship plan's ONE shuffle.

At 100 TB: chunk size bounds both task runtime and task memory
(each chunk carries <= max_windows * stride + window seconds of RR), so
a 1000-executor cluster stays busy even when doc lengths are Zipfian.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import HRVConfig
from ..schemas import CHUNKS_SCHEMA


def _chunk_rows(pdf: pd.DataFrame, cfg: HRVConfig) -> pd.DataFrame:
    fs = cfg.sampling_rate
    spw = cfg.window_samples()
    step = cfg.step_samples()
    wpc = max(1, cfg.max_windows_per_chunk)
    out: dict[str, list] = {k: [] for k in ("doc_id", "chunk_id", "win_lo", "n_win", "n_samples", "rr", "rr_t")}
    for doc_id, tokens in zip(pdf["doc_id"].to_numpy(), pdf["tokens"].to_numpy()):
        tok = np.asarray(tokens, dtype=np.int64)
        total_ms = int(tok.sum())
        n_samples = total_ms * fs // 1000
        n_windows = (n_samples - spw) // step + 1
        if n_windows <= 0:
            continue
        rr = tok.astype(np.float64) / 1000.0
        rr_t = np.cumsum(rr)
        n_chunks = (n_windows + wpc - 1) // wpc
        for c in range(n_chunks):
            win_lo = c * wpc
            n_win = min(wpc, n_windows - win_lo)
            t_lo = win_lo * step / fs
            t_hi = ((win_lo + n_win - 1) * step + spw) / fs
            lo = int(np.searchsorted(rr_t, t_lo, side="left"))
            hi = int(np.searchsorted(rr_t, t_hi, side="right"))
            out["doc_id"].append(doc_id)
            out["chunk_id"].append(c)
            out["win_lo"].append(win_lo)
            out["n_win"].append(n_win)
            out["n_samples"].append(n_samples)
            out["rr"].append(rr[lo:hi])
            out["rr_t"].append(rr_t[lo:hi])
    return pd.DataFrame(out)


def explode_chunks(sequences: DataFrame, cfg: HRVConfig) -> DataFrame:
    """sequences (doc_id, tokens, ...) -> chunk rows (CHUNKS_SCHEMA)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _chunk_rows(pdf, cfg)

    chunks = sequences.select("doc_id", "tokens").mapInPandas(gen, schema=CHUNKS_SCHEMA)
    if cfg.repartition_chunks:
        n = cfg.target_partitions or int(sequences.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        chunks = chunks.repartition(n)
    return chunks
