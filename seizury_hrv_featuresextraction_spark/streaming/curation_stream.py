"""Streaming twin of the E30 composed curation pipeline (VERDICT r4
item 7): URL-keyed dedup -> Gopher repetition filter -> exact content
dedup -> per-source quota cap, as ONE continuous Structured Streaming
query over a document stream.

Semantics vs batch (plans/driver_queries.py:curation_pipeline): the
per-doc stages (URL normalization/domain, repetition stats + filter)
are stateless expressions and behave identically. The three KEYED
stages are necessarily FIRST-ARRIVAL on a stream — an append-mode query
cannot retract an emitted row, so:

- URL dedup keeps the first-seen doc per normalized URL
  (``dropDuplicates`` state), where batch keeps min(doc_id);
- content dedup keeps the first-seen doc per content fingerprint,
  where batch keeps min(doc_id);
- the quota admits the first k survivors per source in arrival order
  (counting state in ``applyInPandasWithState``; ties within one
  microbatch broken by the batch plan's deterministic
  (md5(doc_id), doc_id) hash order), where batch takes the k smallest
  in that hash order over the WHOLE corpus.

The two plans produce identical output exactly when each key group's
batch keeper arrives before the rest of its group — the equivalence the
streaming test drives by delivering microbatches in hash order. Under
arbitrary arrival order the streaming pass keeps the same NUMBER of
docs per key/source (min(k, group count)); only which representative
survives can differ, which is the standard production contract for
streaming admission (state stores cannot hold the corpus-wide argmin).

State at scale: the two dedup stages hold one fingerprint per distinct
key — unbounded over an infinite stream; real deployments bound them
with ``withWatermark`` + ``dropDuplicatesWithinWatermark`` exactly as
``tests/test_streaming_dedup.py`` shows (documents here carry no event
time, so this module keeps the unbounded form). The quota state is one
counter per source — trivially bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import doc_fingerprint
from ..operators.curation import gopher_repetition_filter
from ..operators.dedup import derive_url, normalize_url, url_domain

QUOTA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("domain", T.StringType(), True),
        T.StructField("n_words", T.LongType(), True),
    ]
)

QUOTA_STATE_SCHEMA = T.StructType([T.StructField("admitted", T.LongType(), True)])


def make_quota_fn(k: int):
    """Per-source admission counter: admit rows while fewer than ``k``
    have been admitted, processing each microbatch in the batch plan's
    (md5(doc_id), doc_id) order so a single-batch delivery reproduces
    ``cap_per_group`` exactly."""

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        admitted = int(state.get[0]) if state.exists else 0
        # concat ALL chunks then sort once — chunks arrive in shuffle
        # order within the group (see streaming/hrv_stream.py)
        chunks = [c for c in pdf_iter if len(c)]
        if not chunks:
            state.update((admitted,))
            yield pd.DataFrame(columns=[f.name for f in QUOTA_OUT_SCHEMA.fields])
            return
        pdf = pd.concat(chunks, ignore_index=True)
        order = pdf["doc_id"].map(lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        pdf = pdf.loc[order.sort_values().index]
        take = max(0, k - admitted)
        out = pdf.iloc[:take]
        state.update((admitted + len(out),))
        yield out[[f.name for f in QUOTA_OUT_SCHEMA.fields]]

    return fn


def streaming_curation_pipeline(docs: DataFrame, k: int = 20) -> DataFrame:
    """documents stream (doc_id, text, source, ...) -> curated survivors
    (doc_id, source, domain, n_words), the E30 chain end-to-end:

    1. synthetic URL + normalization + domain (stateless expressions),
       first-seen keeper per normalized URL;
    2. Gopher repetition stats + filter (stateless expressions);
    3. first-seen keeper per exact content fingerprint;
    4. per-source quota of ``k`` (stateful counter).

    Three stateful operators chained in one append-mode query — the
    shape Spark supports for dedup + arbitrary state since the multiple-
    stateful-operator unification."""
    d = (
        derive_url(docs)
        .withColumn("__url_norm", normalize_url(F.col("url")))
        .withColumn("domain", url_domain(F.col("__url_norm")))
        .dropDuplicates(["__url_norm"])
        .drop("__url_norm", "url")
    )
    g = gopher_repetition_filter(d)
    e = (
        g.withColumn("__fp", doc_fingerprint(F.col("text")))
        .dropDuplicates(["__fp"])
        .drop("__fp")
    )
    keyed = e.select("doc_id", "source", "domain", F.col("n_words").cast("long").alias("n_words"))
    fn = make_quota_fn(k)
    return keyed.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=QUOTA_OUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_against_reference(
    stream_df: DataFrame,
    ref_keys: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 4,
    band_size: int = 2,
    shingle_words: int = 3,
) -> DataFrame:
    """E47b streaming leg: continuous-ingestion dedup of a document
    STREAM against the maintained (kind, key) reference table — the
    steady-state crawl pipeline as one append-mode query. Unlike the
    keyed stages above, the per-doc decision here is STATELESS (each
    doc's fate depends only on itself and the static reference), so
    drained output == ``dedup_against_reference`` on the same rows
    under ANY microbatch split — exact equality, no first-arrival
    caveat.

    Shape: exact-fp stage is a stream-static LEFT ANTI join against the
    fp keys (static side corpus-scale, shuffled/bucketed — never
    collected). Band stage computes the doc's LSH band keys IN-ROW
    (functions.text.minhash_signature — same values as the batch
    signature aggregate) and drops on ``arrays_overlap`` with the
    static band-key set carried as a one-row broadcast array: the
    explode + join-back + per-doc any() the batch plan uses is a
    streaming aggregation, which an append stream cannot do statelessly.
    The broadcast bound is the E28 decontamination contract — at corpus
    scale swap the exact array for the E28b Bloom bitmap (same one-row
    broadcast shape, one-sided error). Docs with no shingles skip the
    band check (the batch signature table has no row for them)."""
    from ..functions.text import doc_fingerprint, minhash_signature, word_shingles

    ref_fp = ref_keys.filter(F.col("kind") == "fp").select(F.col("key").alias("__fp"))
    fp_surv = (
        stream_df.withColumn("__fp", doc_fingerprint(F.col(text_col)))
        .join(ref_fp, "__fp", "left_anti")
        .drop("__fp")
    )

    n_bands = n_hashes // band_size
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_words), n_hashes)
    my_bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.array_join(F.slice(sig, b * band_size + 1, band_size), "|"),
        ),
    )
    ref_band_arr = ref_keys.filter(F.col("kind") == "band").agg(
        F.collect_set("key").alias("__ref_bands")
    )
    withref = fp_surv.withColumn("__bands", my_bands).join(
        F.broadcast(ref_band_arr), F.lit(True)
    )
    # size() is -1 for NULL arrays: <= 0 covers both the no-shingle and
    # NULL-text docs (batch: no signature row -> survives the band stage)
    kept = withref.filter(
        (F.size(word_shingles(F.col(text_col), shingle_words)) <= 0)
        | ~F.arrays_overlap(F.col("__bands"), F.col("__ref_bands"))
    )
    return kept.drop("__bands", "__ref_bands")


def streaming_fingerprint_overlap(
    stream_df: DataFrame,
    ref_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "event_time",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    lateness: str = "30 seconds",
    window: str = "1 minute",
) -> DataFrame:
    """E50c streaming leg (r8, closes r7 verdict item 7): MOSS-grade
    copy EVIDENCE pairs from a watermarked crawl stream against the
    maintained winnowing-sketch table — (window_start, new_id, ref_id,
    shared_fps). The E47b streaming anti-join can only say "this doc
    collides with the corpus"; this query names WHICH corpus document
    was copied, continuously, as crawl pages arrive.

    Shape: winnowing selection is the SAME in-row expression as the
    batch sketch (`operators/dedup.py:winnow_keys` — identical keys by
    construction), fps de-duplicated per doc in-row, then explode ->
    stream-STATIC inner join on the 8-byte fp key (stateless; the
    static corpus sketch is read, never collected) -> a genuinely
    WATERMARKED streaming aggregation on (event window, new_id,
    ref_id): state is bounded by the watermark and each pair row emits
    exactly once when its window closes (append mode). Evidence counts
    within one doc are exact regardless of microbatch split because a
    doc's fps carry its single event time — a doc never straddles
    windows."""
    from ..operators.dedup import winnow_packed_keys, winnow_select
    from ..functions.text import words

    ws = words(F.coalesce(F.col(text_col), F.lit("")))
    packed = F.when(F.size(ws) >= k, winnow_packed_keys(ws, k)).otherwise(
        F.array().cast("array<long>")
    )
    # selection keys are identical to the batch sketch by construction
    # (same winnow_packed_keys/winnow_select split; r9 projects the
    # key array as its own column so it evaluates once per doc)
    fps_of = lambda keys: F.array_distinct(  # noqa: E731
        F.transform(
            winnow_select(keys, w),
            lambda key: F.shiftright(key, 32).cast("long"),
        )
    )
    # watermark FIRST, then explode: the watermark node must sit above
    # the raw stream so a doc with no fingerprints (short/NULL text)
    # still advances the event clock — placed after the explode, the
    # inner fp join's inferred IsNotNull(fp) gets pushed below the
    # watermark operator and fp-less heartbeat rows never reach it
    # (observed: eventTime.max = None on heartbeat batches), so windows
    # never close
    ex = (
        stream_df.withWatermark(time_col, lateness)
        .select(
            F.col(id_col).alias("new_id"),
            F.col(time_col).alias("__t"),
            packed.alias("__keys"),
        )
        .select(
            "new_id",
            "__t",
            F.explode(fps_of(F.col("__keys"))).alias("fp"),
        )
    )
    ref = ref_fps.select(F.col("doc_id").alias("ref_id"), "fp").distinct()
    j = ex.join(ref, "fp")
    return (
        j.groupBy(F.window("__t", window).alias("__w"), "new_id", "ref_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .select(
            F.col("__w.start").alias("window_start"),
            "new_id",
            "ref_id",
            "shared_fps",
        )
    )
