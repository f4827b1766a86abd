"""Measured throughput of the r4 curation operators on the FULL sf0.1
documents table (5000 docs, ~1.5 MB text) — writes BENCH/curation_paths.md.

Each op is timed best-of-K end-to-end (plan + execute + drain), and
reported as docs/sec and MB/sec of text. These are per-doc scan-stage or
broadcast operators (plan tests pin zero/one shuffles), so docs/sec at
local[CPUS] is the per-32-core ingest rate a 1000-executor cluster
multiplies out — there is no cross-partition coordination to lose.

Usage: python tools/bench_curation.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from seizury_hrv_featuresextraction_spark.operators.curation import (  # noqa: E402
    corpus_df_scrub,
    decontaminate_overlap,
    gopher_repetition_filter,
    high_df_words,
    redact_pii,
    repetition_stats,
)
from seizury_hrv_featuresextraction_spark.operators.dedup import (  # noqa: E402
    dedup_exact_keep,
    derive_url,
    spread,
    url_dedup_keep,
)
from seizury_hrv_featuresextraction_spark.operators.stats import cap_per_group  # noqa: E402
from seizury_hrv_featuresextraction_spark.functions.text import words  # noqa: E402
from seizury_hrv_featuresextraction_spark.session import get_spark  # noqa: E402
from seizury_hrv_featuresextraction_spark.sources.registry import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEST_OF = 3


def timed(df, best_of: int = BEST_OF) -> tuple[float, int]:
    """best-of-K wall to fully materialize df (collect, not count: a
    count() over a global aggregate would let Catalyst prune the very
    expressions being measured)."""
    best, n = 1e18, 0
    for _ in range(best_of):
        t0 = time.time()
        n = len(df.collect())
        best = min(best, time.time() - t0)
    return best, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(app_name="bench-curation", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spread(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    mb = (docs.agg(F.sum(F.length("text"))).first()[0] or 0) / 1e6

    rows: list[tuple[str, float, int]] = []

    # E25a stats / E25b filter — force full evaluation via agg over outputs
    s = repetition_stats(docs).agg(
        F.sum("dup_word_frac"), F.sum("top_word_frac"), F.sum("dup_2gram_frac")
    )
    t, _ = timed(s)
    rows.append(("repetition_stats (E25a)", t, n_docs))
    t, kept = timed(gopher_repetition_filter(docs).select("doc_id"))
    rows.append((f"gopher_repetition_filter (E25b, kept {kept})", t, n_docs))

    # E26 scrub: DF pass (agg+collect) reported separately from the rewrite
    t0 = time.time()
    blocked = high_df_words(docs, max_df_frac=0.78125)
    t_df = time.time() - t0
    rows.append((f"high_df_words (E26 DF agg, {len(blocked)} blocked)", t_df, n_docs))
    t, _ = timed(
        corpus_df_scrub(docs, blocked).agg(
            F.sum("n_removed"), F.sum(F.length("text_scrubbed"))
        )
    )
    rows.append(("corpus_df_scrub rewrite (E26)", t, n_docs))

    # E27 PII (planted text so the regexes actually match)
    planted = docs.withColumn(
        "t2",
        F.concat(
            F.col("text"), F.lit(" doc"), F.col("doc_id").cast("string"),
            F.lit("@m.example.com +1-555-0100 10.0.0.7"),
        ),
    )
    t, _ = timed(
        redact_pii(planted, "t2").agg(
            F.sum("n_email"), F.sum("n_phone"), F.sum(F.length("text_redacted"))
        )
    )
    rows.append(("redact_pii (E27)", t, n_docs))

    # E28 decontamination (word 5-grams, md5 %5 eval split)
    toks = docs.select("doc_id", words(F.col("text")).alias("toks"))
    h = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(5),
    )
    toks = toks.withColumn("is_eval", h == 0)
    t, flagged = timed(
        decontaminate_overlap(
            toks.filter(~F.col("is_eval")), toks.filter(F.col("is_eval")), n=5,
            tokens_col="toks",
        )
    )
    rows.append((f"decontaminate_overlap (E28, {flagged} flagged)", t, n_docs))

    # E30 composed pipeline end-to-end
    u = url_dedup_keep(derive_url(docs)).drop("url")
    g = gopher_repetition_filter(u)
    e = dedup_exact_keep(g, "text", "doc_id")
    c = cap_per_group(e, "doc_id", "source", k=20).select("doc_id", "source", "domain")
    t, out_n = timed(c)
    rows.append((f"curation_pipeline (E30, {out_n} survivors)", t, n_docs))

    # E36 substring-span detection / E37 rewrite (r5)
    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        substring_dedup_apply,
        substring_dup_spans,
    )

    t, n_spans = timed(substring_dup_spans(docs, "text", "doc_id", n=10))
    rows.append((f"substring_dup_spans (E36, {n_spans} spans)", t, n_docs))
    t, _ = timed(
        substring_dedup_apply(docs, "text", "doc_id", n=10).agg(
            F.sum("n_removed"), F.sum(F.length("text_clean"))
        )
    )
    rows.append(("substring_dedup_apply (E37 rewrite)", t, n_docs))

    # r6 operators: keep-one rewrite, linear classifier, mixture /
    # importance sampling, RAG chunking, hash embeddings
    from seizury_hrv_featuresextraction_spark.functions.vectors import hash_embed
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        chunk_documents,
        hashed_linear_classifier,
        md5_feature_weights,
    )
    from seizury_hrv_featuresextraction_spark.operators.stats import (
        importance_sample,
        mixture_sample,
    )

    t, _ = timed(
        substring_dedup_apply(docs, "text", "doc_id", n=10, keep_first=True).agg(
            F.sum("n_removed"), F.sum(F.length("text_clean"))
        )
    )
    rows.append(("substring_dedup_keep_one (E37b)", t, n_docs))

    scored = hashed_linear_classifier(docs, md5_feature_weights(1024), score_round=6)
    t, _ = timed(scored.agg(F.sum("score"), F.sum(F.col("keep").cast("int"))))
    rows.append(("hashed_linear_classifier (E40, dim 1024)", t, n_docs))

    t, kept = timed(mixture_sample(docs, "doc_id", "source").select("doc_id"))
    rows.append((f"mixture_sample (E41, kept {kept})", t, n_docs))

    t, kept = timed(importance_sample(scored, "doc_id", "prob").select("doc_id"))
    rows.append((f"importance_sample (E42 over E40 prob, kept {kept})", t, n_docs))

    chunks = chunk_documents(docs, "doc_id", "text", chunk_words=32, stride=24)
    t, n_chunks = timed(chunks.select("doc_id", "chunk_id"))
    rows.append((f"chunk_documents (E43, {n_chunks} chunks)", t, n_docs))

    t, _ = timed(
        chunks.select(hash_embed(F.col("chunk_text"), dim=16).alias("v")).agg(
            F.sum(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
        )
    )
    rows.append(("chunk hash_embed dim16 (E45)", t, n_docs))

    # r7 operators: winnowing sketch + pair consumer, budget selection
    from seizury_hrv_featuresextraction_spark.operators.curation import (
        quality_budget_select,
    )
    from seizury_hrv_featuresextraction_spark.operators.dedup import (
        fingerprint_overlap_pairs,
        winnowing_fingerprints,
    )

    wfp = winnowing_fingerprints(docs, "text", "doc_id", k=5, w=4)
    n_fp = wfp.count()
    # agg over the VALUES (not count): drains 1 row instead of ~100k
    # py4j Row objects, which would otherwise dominate the wall
    t, _ = timed(wfp.agg(F.sum("fp"), F.sum("pos")))
    rows.append((f"winnowing_fingerprints (E50, {n_fp} fps)", t, n_docs))

    t, n_pairs = timed(
        fingerprint_overlap_pairs(docs, "text", "doc_id", k=5, w=4, min_shared=2, df_cap=10)
    )
    rows.append((f"fingerprint_overlap_pairs (E50b, {n_pairs} pairs)", t, n_docs))

    t, kept = timed(
        quality_budget_select(docs, md5_feature_weights(1024), budget=800).select("doc_id")
    )
    rows.append((f"quality_budget_select (E51, kept {kept})", t, n_docs))

    lines = [
        "# BENCH/curation_paths.md — measured curation-operator throughput",
        "",
        f"- input: `{sf_dir}` documents — {n_docs} docs, {mb:.1f} MB text",
        f"- local[{cpus}], best-of-{BEST_OF} walls, BLAS pinned to 1 thread",
        "- per-doc ops are scan-stage (zero shuffle, plan-test-pinned), so",
        "  docs/sec here is a per-node ingest rate that multiplies across",
        "  executors; the corpus-level passes (DF agg, eval shingles) reduce",
        "  to a broadcast-scale set before touching the big side.",
        "",
        "| operator | wall (s) | docs/sec | MB/sec |",
        "|---|---|---|---|",
    ]
    for name, t, n in rows:
        lines.append(f"| {name} | {t:.2f} | {n / t:,.0f} | {mb / t:.1f} |")
    path = os.path.join(REPO, "BENCH", "curation_paths.md")
    # preserve one-off measured sections (Bloom-vs-exact, pack-vs-pad)
    # appended after the throughput table: everything from the first
    # "## " heading onward survives a re-run
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        i = old.find("\n## ")
        if i >= 0:
            tail = "\n" + old[i:]
    with open(path, "w") as f:
        f.write("\n".join(lines) + tail + ("\n" if not tail.endswith("\n") else ""))
    print(f"wrote {path}")
    print(json.dumps({n: round(t, 2) for n, t, _ in rows}))
    spark.stop()


if __name__ == "__main__":
    main()
