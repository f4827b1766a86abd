"""Hardware-ceiling probe for the scaling measurement.

Runs the SAME per-chunk kernel workload as the flagship plan through a
plain multiprocessing.Pool (no Spark, no shuffle, no Arrow) at N and 4N
workers, with BLAS pinned to 1 thread. This is the best any framework
could do on this box: a single shared-memory machine loses per-core
throughput as cores fill (all-core turbo, shared LLC/DRAM bandwidth), so
raw local[N]->local[4N] efficiency conflates that hardware effect with
software scaling. bench_scaling.py divides Spark's measured speedup by
this ideal speedup to report a hardware-normalized efficiency — which is
the number that predicts N->4N *executor* (separate-machine) scaling.

Usage: python tools/hw_ceiling.py [n_workers ...]  -> JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 384
TOKENS_PER_DOC = 13400  # matches the scaling bench's repeat~200 doc shape


def _make_doc(seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    tok = np.rint(np.clip(0.8 + 0.1 * rng.standard_normal(TOKENS_PER_DOC), 0.4, 1.5) * 1000)
    return tok.astype(np.int64)


def _work(seed: int) -> tuple[int, int]:
    import numpy as np

    from seizury_hrv_featuresextraction_spark.config import DEFAULT_CONFIG as cfg
    from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import _get_kernel

    kernel = _get_kernel(cfg)
    tok = _make_doc(seed)
    rr = tok / 1000.0
    rr_t = np.cumsum(rr)
    n_samples = int(tok.sum()) * cfg.sampling_rate // 1000
    n_win = (n_samples - cfg.window_samples()) // cfg.step_samples() + 1
    ids, feats = kernel.windows_for_chunk(rr, rr_t, 0, n_win)
    return len(tok), len(ids)


def measure(workers: int) -> dict:
    ctx = mp.get_context("spawn")
    with ctx.Pool(workers) as pool:
        pool.map(_work, range(workers))  # warm: imports + design cache
        t0 = time.time()
        out = pool.map(_work, range(N_DOCS))
        dt = time.time() - t0
    tokens = sum(o[0] for o in out)
    windows = sum(o[1] for o in out)
    return {
        "workers": workers,
        "elapsed_s": round(dt, 2),
        "tokens_per_sec": round(tokens / dt, 1),
        "windows_per_sec": round(windows / dt, 1),
    }


def main():
    workers = [int(a) for a in sys.argv[1:]] or [8, 32]
    print(json.dumps({str(w): measure(w) for w in workers}))


if __name__ == "__main__":
    main()
