"""Deterministic synthetic input generator (FIXTURES.md F1/F2; seed 42).

Mirrors the reference's self-test synthesis (hrv_features.py:442-449: RR
= 0.8 s ± 0.1 gaussian, clipped to [0.4, 1.5] s) quantized to integer
milliseconds, with a long-tailed n_tok distribution to exercise skew and
salting, plus a small annotation table covering every labeling edge case
(labelers.py:61-99: t_target < 0, target_start < 0, target overlapping
ictal, clean preictal).

All generation is NumPy-seeded and independent of row/partition order, so
the same (seed, n_docs) always yields byte-identical tables — this is what
the per-row token-array-equality gate checks after a Spark round trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_sequences(
    n_docs: int = 24,
    seed: int = 42,
    short_range: tuple[int, int] = (400, 4000),
    long_range: tuple[int, int] = (20000, 80000),
    long_frac: float = 0.1,
) -> pd.DataFrame:
    """(doc_id, tokens, n_tok, source) with long-tailed n_tok."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        if rng.random() < long_frac:
            n_tok = int(rng.integers(long_range[0], long_range[1] + 1))
        else:
            n_tok = int(rng.integers(short_range[0], short_range[1] + 1))
        rr = 0.8 + 0.1 * rng.standard_normal(n_tok)
        rr = np.clip(rr, 0.4, 1.5)
        tokens = np.rint(rr * 1000.0).astype(np.int32)
        rows.append(
            {
                "doc_id": f"sub-{i // 4 + 1:03d}_ses-01_run-{i % 4 + 1:02d}",
                "tokens": tokens.tolist(),
                "n_tok": n_tok,
                "source": "synthetic-v1",
            }
        )
    return pd.DataFrame(rows)


def make_annotations(sequences: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """0-3 events per doc covering all FixedSPH edge cases.

    Events per doc, in onset order (the painting order):
    - doc%5==0: early seizure with t_target < 0 (target dropped) plus a
      later clean seizure (preictal + ictal windows).
    - doc%5==1: seizure at onset ~ sph + width/2 - eps so target_start < 0
      (target dropped, ictal kept).
    - doc%5==2: two seizures close together — the second's target overlaps
      the first's ictal region and its own; exercises skip_overlap AND
      cross-event overwrites.
    - doc%5==3: one clean mid-recording seizure.
    - doc%5==4: no events (all-normal doc).
    """
    rng = np.random.default_rng(seed + 1)
    rows = []
    for idx, srow in sequences.reset_index(drop=True).iterrows():
        doc = srow["doc_id"]
        dur_total = sum(srow["tokens"]) / 1000.0
        kind = idx % 5
        if kind == 4 or dur_total < 400.0:
            continue
        if kind == 0:
            rows.append((doc, 60.0 + float(rng.random()) * 10, 30.0, "sz_foc_ia"))
            if dur_total > 700:
                rows.append((doc, dur_total * 0.6, 45.0, "sz"))
        elif kind == 1:
            onset = 180.0 + 10.0 - 1.0  # target_start = onset-180-15 < 0
            rows.append((doc, onset, 20.0, "1.1"))
        elif kind == 2:
            onset1 = dur_total * 0.4
            rows.append((doc, onset1, 120.0, "sz_gen_t"))
            rows.append((doc, onset1 + 150.0, 30.0, "sz"))  # its target hits ev1 ictal
            rows.append((doc, dur_total * 0.2, 0.0, "bckg"))  # non-seizure distractor
        else:
            rows.append((doc, dur_total * 0.5, 60.0, "sz_foc_m2g"))
            rows.append((doc, dur_total * 0.1, 5.0, "artifact"))
    df = pd.DataFrame(rows, columns=["doc_id", "onset", "duration", "event_type"])
    return df.sort_values(["doc_id", "onset"], kind="mergesort").reset_index(drop=True)


# Full reference key set (data_processing_pipeline.py:463-501) and exact
# term list (:526-530) — NOT 'ictal' (so interictal/preictal stay negative).
SEIZURE_ILAE_CODES = {
    "1.1", "1.2", "1.3", "1.4", "1.5", "1.6", "1.7",
    "2.1", "2.2", "2.3", "2.4", "2.5",
    "3.1", "3.2", "3.3", "3.4", "3.5", "3.6", "3.7",
    "4.1", "4.2", "4.3", "4.4",
    "5.1", "5.2", "5.3",
    "6.1", "6.2", "6.3", "6.4", "6.5", "6.6", "6.7", "6.8",
    "7.1", "7.2", "7.3", "7.4",
}
SEIZURE_TERMS = (
    "seizure", "sz", "focal", "generalized", "tonic", "clonic",
    "myoclonic", "absence", "atonic", "spasm", "automatism",
)


def is_seizure_event_mask(event_type: pd.Series) -> pd.Series:
    """Pandas twin of the native predicate (data_processing_pipeline.py:506-532)."""
    low = event_type.astype(str).str.strip().str.lower()
    return (low != "") & (
        low.isin(SEIZURE_ILAE_CODES)
        | low.str.startswith("sz_")
        | (event_type == "sz")
        | low.str.contains("|".join(SEIZURE_TERMS), regex=True)
    )


def write_parquet(df: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if "tokens" in df.columns:
        schema = pa.schema(
            [
                pa.field("doc_id", pa.string()),
                pa.field("tokens", pa.list_(pa.int32())),
                pa.field("n_tok", pa.int32()),
                pa.field("source", pa.string()),
            ]
        )
        table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    else:
        table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, path)
