"""N vs 4N *executor* scaling emulation (the north-rule criterion).

local[N] -> local[4N] inside ONE JVM conflates software scaling with
single-process contention (GC, allocator, Arrow IPC through one heap).
A real 4-executor cluster runs 4 separate JVMs. This harness emulates
exactly that with the engine's bucket partitioning (checkpoint.py):

- "1 executor":  one spark process (local[N]) computes all 4 doc buckets.
- "4 executors": four concurrent spark processes (local[N] each), one
  bucket per process, started through a file barrier so their compute
  phases overlap; wall time = slowest process (the real cluster metric).

efficiency = T_1exec / (4 * T_4exec)

Memory bandwidth is still shared (one box), so this remains a lower
bound on true multi-machine scaling; it removes the one-JVM artifacts.

Usage: python tools/bench_executors.py   (env: EXEC_CORES=8, EXEC_DOCS=768,
EXEC_TOKENS=30000) — appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
for v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
sys.path.insert(0, {repo!r})

data_dir, buckets, cores, barrier_dir, n_procs, tag, cpuset = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], int(sys.argv[5]),
    sys.argv[6], sys.argv[7])
# pin this "executor" (JVM + its python workers inherit) to its own cores:
# a real 4-executor cluster gives each executor disjoint CPUs; without
# this, 4 JVMs each size GC/netty pools for all 32 cores and thrash
lo, hi = (int(x) for x in cpuset.split("-"))
os.sched_setaffinity(0, range(lo, hi + 1))

from seizury_hrv_featuresextraction_spark.session import get_spark
from seizury_hrv_featuresextraction_spark.plans.hrv_pipeline import extract_features
from seizury_hrv_featuresextraction_spark.config import DEFAULT_CONFIG

spark = get_spark(
    app_name="exec-" + tag, master=f"local[{{cores}}]", shuffle_partitions=2 * cores,
    extra_conf={{
        # measured variants that did NOT help on this box: 6g heap (GC-
        # bound, 1.7x slower single-exec) and -Xms16g -XX:+AlwaysPreTouch
        # (64 GiB resident across 4 JVMs degraded both phases ~15%)
        "spark.driver.memory": "16g",
        "spark.local.dir": os.path.join("/dev/shm", "exec-" + tag),
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={{cores}}",
    }},
)
spark.sparkContext.setLogLevel("ERROR")
paths = [f"{{data_dir}}/bucket={{b}}" for b in buckets.split(",")]
seq = spark.read.parquet(*paths)
seq = seq.persist(); n_docs = seq.count()  # warm IO/cache before the barrier
# warm the FULL compute path (whole-stage codegen JIT, Python worker
# spawn + module imports, Lomb-Scargle design cache) before the barrier —
# a steady-state cluster executor is warm; without this the short 4-exec
# phase pays JIT/spawn inside its measured window while the long 1-exec
# phase amortizes it (asymmetric penalty)
extract_features(
    seq.limit(2 * cores), None, DEFAULT_CONFIG,
    fused=os.environ.get("EXEC_FUSED", "1") == "1",
).write.format("noop").mode("overwrite").save()

open(os.path.join(barrier_dir, f"ready-{{tag}}"), "w").close()
while len([f for f in os.listdir(barrier_dir) if f.startswith("ready-")]) < n_procs:
    time.sleep(0.05)

t0 = time.time()
feats = extract_features(seq, None, DEFAULT_CONFIG, fused=os.environ.get("EXEC_FUSED", "1") == "1")
n_win = feats.count()
dt = time.time() - t0
print(json.dumps({{"tag": tag, "docs": n_docs, "windows": n_win, "compute_s": round(dt, 2)}}))
"""


def prepare_data(tmp: str, n_docs: int, tokens: int) -> None:
    import numpy as np

    sys.path.insert(0, REPO)
    from seizury_hrv_featuresextraction_spark.datagen import make_sequences, write_parquet

    seq = make_sequences(n_docs, seed=42, short_range=(tokens, tokens), long_range=(tokens, tokens))
    # deterministic 4-way bucket split on the row index; each bucket is
    # written as many files so the scan has real input splits — a single
    # fat file would serialize the first (chunking) stage on one core,
    # exactly the input-layout mistake a 100 TB table must avoid
    files_per_bucket = 32
    for b in range(4):
        part = seq.iloc[b::4].reset_index(drop=True)
        os.makedirs(f"{tmp}/bucket={b}", exist_ok=True)
        for i in range(files_per_bucket):
            sub = part.iloc[i::files_per_bucket].reset_index(drop=True)
            if len(sub):
                write_parquet(sub, f"{tmp}/bucket={b}/part-{i:03d}.parquet")


def run_group(data_dir: str, groups: list[str], cores: int) -> list[dict]:
    """Launch one process per bucket group, barrier-synchronized, each
    pinned to a disjoint CPU range."""
    with tempfile.TemporaryDirectory() as barrier:
        script = WORKER.format(repo=REPO)
        procs = []
        for i, buckets in enumerate(groups):
            cpuset = f"{i * cores}-{(i + 1) * cores - 1}"
            p = subprocess.Popen(
                [sys.executable, "-c", script, data_dir, buckets, str(cores),
                 barrier, str(len(groups)), f"p{i}", cpuset],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
            procs.append(p)
        out = []
        for p in procs:
            stdout, _ = p.communicate(timeout=3600)
            for line in reversed(stdout.strip().splitlines()):
                if line.strip().startswith("{"):
                    out.append(json.loads(line))
                    break
        return out


def main():
    cores = int(os.environ.get("EXEC_CORES", "8"))
    n_docs = int(os.environ.get("EXEC_DOCS", "768"))
    tokens = int(os.environ.get("EXEC_TOKENS", "30000"))
    repeats = int(os.environ.get("EXEC_REPEATS", "3"))
    tmp = tempfile.mkdtemp(prefix="execbench-")
    prepare_data(tmp, n_docs, tokens)

    # single measurements on this shared VM vary by up to ~40% when all
    # 32 cores are loaded (observed 12.2-28.6 s for identical work with
    # <0.1% steal inside any one run); best-of-K estimates the machine's
    # capability rather than the interference draw
    t1 = w1 = None
    for _ in range(repeats):
        one = run_group(tmp, ["0,1,2,3"], cores)
        w1 = one[0]["windows"]
        t1 = one[0]["compute_s"] if t1 is None else min(t1, one[0]["compute_s"])
    print(f"1 executor  (local[{cores}], all buckets): best-of-{repeats} {t1}s, {w1} windows")

    t4 = w4 = None
    per_best = None
    for _ in range(repeats):
        four = run_group(tmp, ["0", "1", "2", "3"], cores)
        wall = max(r["compute_s"] for r in four)
        w4 = sum(r["windows"] for r in four)
        if t4 is None or wall < t4:
            t4, per_best = wall, [r["compute_s"] for r in four]
    print(f"4 executors (local[{cores}] x4, 1 bucket each): best-of-{repeats} wall {t4}s "
          f"(per-proc {per_best}), {w4} windows")
    assert w1 == w4, (w1, w4)
    eff = t1 / (4.0 * t4)
    print(f"executor-scaling efficiency 1 -> 4: {eff:.3f}")

    lines = [
        "",
        "## Executor-count scaling (separate processes — the faithful emulation)",
        "",
        f"Same engine, same input ({n_docs} docs x {tokens} tokens, {w1} windows),",
        f"buckets pre-partitioned by the engine's checkpoint layout. '4 executors' =",
        f"4 concurrent Spark processes (own JVM + Python workers, local[{cores}] each,",
        "barrier-synchronized compute), which is what N -> 4N executors means on a",
        "real cluster; only DRAM bandwidth is still shared.",
        "",
        f"| cluster | wall (s) | windows/sec |",
        f"|---|---|---|",
        f"| 1 executor x local[{cores}] | {t1} | {round(w1/t1)} |",
        f"| 4 executors x local[{cores}] | {t4} | {round(w4/t4)} |",
        "",
        f"**Executor-scaling efficiency (1 -> 4x): {eff:.3f}** (target >= 0.8;",
        f"best-of-{repeats} walls, full compute path warmed pre-barrier)",
    ]
    with open(os.path.join(REPO, "BENCH", "executors.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    # machine-readable result for bench_scaling.py's headline (it must
    # never stamp stale figures from hardcoded fallbacks — ADVICE r3)
    with open(os.path.join(REPO, "BENCH", "executors_latest.json"), "w") as f:
        json.dump(
            {"exec_eff": round(eff, 3), "t1": t1, "t4": t4, "cores": cores,
             "windows": w1, "repeats": repeats, "measured_at": time.time()},
            f,
        )
    print("appended to BENCH/executors.md; wrote BENCH/executors_latest.json")


if __name__ == "__main__":
    main()
