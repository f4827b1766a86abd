"""Measure the dedup scale paths against their brute-force baselines on
the FULL sf0.1 tables (no vec_id/doc caps) and write BENCH/dedup_paths.md.

The registered CORRECTNESS queries cap their inputs so the quadratic
baselines stay checkable; this harness is the scale evidence — same
operators, whole table, wall-clock side by side, and (new in r3)
MEASURED RECALL of each scale path against its baseline pair set.

Two embedding regimes, reported separately and honestly:

- raw table at tau=0.25 (the only populated band of the synthetic
  embeddings): hyperplane collision prob p = 1 - acos(s)/pi is 0.58 at
  s=0.25 vs 0.50 for s=0 — indistinguishable-from-random, so NO
  parameterization is sub-quadratic here; the band-OR path is tuned
  recall-first (target >= 0.9) and wins only the constant factor.
- planted near-dups at tau=0.95 (the actual dedup regime): p = 0.90,
  so a few 8-plane bands give recall ~0.99 while candidate volume drops
  by ~2^8/B — both high recall AND sub-quadratic.

Usage: python tools/bench_dedup_paths.py  (env: SPARK_GRAFT_SF_DIR, CPUS)
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from seizury_hrv_featuresextraction_spark.operators.dedup import (  # noqa: E402
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from seizury_hrv_featuresextraction_spark.functions.vectors import plane_weights  # noqa: E402
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timed_pairs(df):
    """(elapsed, set of (id_a, id_b)) — pair sets are small enough at
    sf0.1 to collect for exact recall computation."""
    t0 = time.time()
    pairs = set((r[0], r[1]) for r in df.select("id_a", "id_b").collect())
    return time.time() - t0, pairs


def planted_corpus(spark, emb_pdf):
    """corpus = embeddings UNION deterministic perturbed copies: copy of
    vec v gets id v+100000 and vector v + 0.08|v| * u/|u| with u the
    md5-weight lattice plane (1000 + vec_id) — cos(v, v') ~ 0.997, fully
    reproducible, derived from driver data only."""
    V = np.array([np.asarray(r, dtype=np.float64) for r in emb_pdf["embedding"]])
    ids = emb_pdf["vec_id"].to_numpy()
    U = np.array([plane_weights(V.shape[1], 1000 + int(i)) for i in ids])
    U = U / np.linalg.norm(U, axis=1, keepdims=True)
    Vd = V + 0.08 * np.linalg.norm(V, axis=1, keepdims=True) * U
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, V)]
    rows += [(int(i) + 100000, [float(x) for x in v]) for i, v in zip(ids, Vd)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dedup-paths", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()
    n_vecs = emb.count()

    rows = []

    # n-gram Jaccard: unrestricted shingle self-join vs LSH-candidate verify
    t_all, p_all = timed_pairs(
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_words=3, min_jaccard=0.2)
    )
    cand = minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=4, band_size=2, shingle_words=3)
    t_lsh, p_lsh = timed_pairs(
        ngram_jaccard_pairs(docs, "text", "doc_id", shingle_words=3, min_jaccard=0.2,
                            candidates=cand)
    )
    rows.append(("n-gram Jaccard (j>=0.2)", f"{n_docs} docs", t_all, p_all, t_lsh, p_lsh))

    # embedding near-dup, RAW table at tau=0.25: brute vs the registered
    # band-OR path (r=3 planes x B=12 bands, recall-first)
    t_bf, p_bf = timed_pairs(embedding_near_dups(emb, "embedding", "vec_id", min_cosine=0.25))
    t_b, p_b = timed_pairs(
        embedding_near_dups(emb, "embedding", "vec_id", min_cosine=0.25,
                            n_planes=3, n_bands=12)
    )
    rows.append(("embedding near-dup tau=0.25", f"{n_vecs} vecs", t_bf, p_bf, t_b, p_b))

    # embedding near-dup, PLANTED tau=0.95 (the true near-dup regime):
    # 8-plane bands -> 256 buckets/band, B=8 bands
    corpus = planted_corpus(spark, emb.toPandas())
    corpus.cache().count()
    t_pbf, p_pbf = timed_pairs(
        embedding_near_dups(corpus, "embedding", "vec_id", min_cosine=0.95)
    )
    t_pl, p_pl = timed_pairs(
        embedding_near_dups(corpus, "embedding", "vec_id", min_cosine=0.95,
                            n_planes=8, n_bands=8)
    )
    rows.append(
        ("embedding near-dup tau=0.95 (planted)", f"{2 * n_vecs} vecs", t_pbf, p_pbf, t_pl, p_pl)
    )

    lines = [
        "# Dedup scale-path vs baseline (full tables, no caps)",
        "",
        f"Input: `{sf_dir}` on local[{cpus}]. The CORRECTNESS queries run both",
        "variants on capped inputs with DuckDB value-hash twins; this table is",
        "the wall-clock + RECALL evidence for the registered scale paths when",
        "the quadratic baselines are still feasible at all.",
        "",
        "| operator | input | baseline (s) | baseline pairs | scale path (s) | scale pairs | recall | speedup |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, inp, tb, pb_, ts, ps in rows:
        rec = len(ps & pb_) / len(pb_) if pb_ else 1.0
        lines.append(
            f"| {name} | {inp} | {tb:.2f} | {len(pb_)} | {ts:.2f} | {len(ps)} "
            f"| {rec:.3f} | {tb / ts:.1f}x |"
        )
    lines += [
        "",
        "Scale-path pair sets are subsets of the baselines by construction",
        "(candidates are verified with the exact metric before thresholding).",
        "",
        "## Why two embedding rows",
        "",
        "Random-hyperplane collision probability is p(s) = 1 - acos(s)/pi:",
        "p(0.25) = 0.58 vs p(0) = 0.50 — at tau=0.25 (the only populated band",
        "of the synthetic embeddings) similar and random pairs are nearly",
        "indistinguishable to ANY hyperplane family, so no parameterization is",
        "sub-quadratic; the registered band-OR path (r=3, B=12) is tuned",
        "recall-first (measured above, target >= 0.9; the r2 single-table path",
        "scored 0.12) and its win is a constant factor (cheap int-equality",
        "join + distinct before the expensive cosine).",
        "",
        "At tau=0.95, p = 0.90: an 8-plane band keeps q = p^8 = 0.43 of true",
        "pairs while passing only 0.5^8 = 0.4% of random pairs per band — the",
        "planted row shows both recall ~1 and the decisive speedup. At 100 TB",
        "this is the operating point (dedup thresholds are 0.9+); bucket width",
        "r scales with log2(corpus/bucket-budget) and B with the recall target",
        "via 1-(1-p^r)^B.",
    ]
    out = os.path.join(REPO, "BENCH", "dedup_paths.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
