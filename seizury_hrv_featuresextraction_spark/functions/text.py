"""Native text-analysis Column builders for training-data pipelines:
shingling, MinHash, SimHash, fingerprints, token counting, language-ID
and quality heuristics.

Everything here is a pure Catalyst expression (higher-order functions on
arrays + md5) — no Python UDFs, so the hot path stays in whole-stage
codegen and every function has an ANSI-SQL twin for the DuckDB oracle.

Hash choice: md5 (hex string) rather than xxhash64, because it is the
one hash with identical semantics in Spark, DuckDB, and Python — the
correctness oracle depends on that. At 100 TB scale swap HASH_EXPR for
xxhash64 (same plumbing, faster); the LSH math is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column) -> Column:
    """Lower-cased whitespace tokens, empties removed.

    array_remove(split(...), '') instead of a filter() lambda: split never
    yields nulls, so the two are element-for-element identical, but
    array_remove is a plain collection expression while the lambda filter
    is interpreted per element (measured 1.5x on the sf1.0 shingle scan).
    """
    return F.array_remove(F.split(F.lower(F.trim(text)), r"\s+"), "")


def _safe_range(k: Column) -> Column:
    """sequence(1, k), or an empty array when k < 1 (Spark's sequence
    DESCENDS when start > stop, so the guard is mandatory)."""
    return F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined).

    PERF: in corpus-scan hot paths, materialize the word array as a
    COLUMN first and call ``word_shingles_of`` — referencing the
    words() expression from inside the transform lambda re-inlines the
    regex split into the per-ELEMENT body (CollapseProject keeps a
    multi-referenced expensive projection, so the two-step select is
    stable; measured 10x on the sf1.0 n-gram explode)."""
    return word_shingles_of(words(text), n)


def word_shingles_of(ws: Column, n: int = 3) -> Column:
    """``word_shingles`` over an already-materialized word array.

    Per-shingle element_at lookups instead of slice(ws, i, n): slice
    allocates an n-element array per lambda call just to concat it;
    n direct lookups produce the same string with no intermediate
    (measured 2-3x on the sf1.0 shingle scan, values identical).
    """
    return F.array_distinct(
        F.transform(
            _safe_range(F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
        )
    )


def char_shingles(text: Column, n: int = 8) -> Column:
    """Distinct character n-grams."""
    t = F.lower(text)
    return F.array_distinct(
        F.transform(
            _safe_range(F.length(t) - (n - 1)),
            lambda i: F.substring(t, i, n),
        )
    )


def minhash_signature(shingles: Column, n_hashes: int = 8) -> Column:
    """Array of n_hashes MinHash values: min over shingles of
    md5(seed || ':' || shingle). Seeded rehash instead of permutations —
    standard banding-ready signature."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(seed.cast("string"), F.lit(":"), s)))
        ),
    )


def simhash64(tokens: Column) -> Column:
    """60-bit SimHash over token md5s (bits 0..59 of the first 15 hex
    chars — 15 so the value fits a signed BIGINT in every engine).

    bit k of the result = 1 iff sum over tokens of (2*bit_k(md5(tok))-1)
    is positive.
    """
    hashes = F.transform(tokens, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    # F.shiftright/shiftleft only take int literals; call_function reaches
    # the SQL variants that accept a Column shift amount (the lambda var k)
    shr = lambda h, k: F.call_function("shiftright", h, k.cast("int"))  # noqa: E731
    shl = lambda k: F.call_function("shiftleft", F.lit(1).cast("long"), k.cast("int"))  # noqa: E731
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(59)),
        F.lit(0).cast("long"),
        lambda acc, k: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda a, h: a + (shr(h, k).bitwiseAND(F.lit(1).cast("long")) * 2 - 1),
            )
            > 0,
            shl(k),
        ).otherwise(F.lit(0).cast("long")),
    )


def doc_fingerprint(text: Column, prefix_len: int = 16) -> Column:
    """Cheap exact-dup fingerprint: md5 prefix of normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, prefix_len)


def token_count(text: Column) -> Column:
    return F.size(words(text))


# BPE-ish segmentation: runs of letters / digits / single punctuation —
# a deterministic stand-in for a subword tokenizer's pre-tokenization.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpeish_token_count(text: Column) -> Column:
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(F.lower(text), "(" + BPE_ISH_PATTERN + ")", "$1"),
                "",
            ),
            lambda t: F.trim(t) != "",
        )
    )


DEFAULT_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or DEFAULT_STOPWORDS
    ws = words(text)
    hits = F.size(F.filter(ws, lambda w: w.isin(sw)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword heuristics (quality scoring)."""
    ws = words(text)
    n_chars = F.length(text)
    n_words = F.size(ws)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.when(n_words > 0, (F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w))) / n_words).otherwise(F.lit(0.0)),
        "stopword_ratio": stopword_ratio(text),
        "punct_ratio": F.when(
            n_chars > 0,
            F.length(F.regexp_replace(text, r"[^.,;:!?'\"()]", "")) / n_chars,
        ).otherwise(F.lit(0.0)),
        "upper_ratio": F.when(
            n_chars > 0, F.length(F.regexp_replace(text, r"[^A-Z]", "")) / n_chars
        ).otherwise(F.lit(0.0)),
    }


# tiny n-gram language-ID: stopword-family scoring, deterministic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
}


def langid(text: Column) -> Column:
    """argmax over marker-hit counts; 'und' when nothing matches."""
    ws = words(text)

    def hit_count(markers: list[str]) -> Column:
        # NB: the lambda must be single-arg — a two-arg lambda is
        # interpreted by F.filter as (element, index)
        return F.size(F.filter(ws, lambda w: w.isin(markers)))

    scored = F.array(
        *[
            F.struct(hit_count(markers).alias("score"), F.lit(lang).alias("lang"))
            for lang, markers in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)  # struct compare: score first, then lang
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def tfidf_top_terms(df, text_col: str, id_col: str, k: int = 3, rank_round: int | None = None):
    """TF-IDF top-k terms per document (E16), pure Catalyst:

    explode words -> tf per (doc, term) -> document frequency per term
    (one agg over the same exploded set) -> idf = ln(N/df) -> top-k per
    doc by (score desc, term asc). Two shuffles total (term stats, the
    per-doc window); at corpus scale the df table is the only global
    state and it is bounded by vocabulary size, not corpus size.

    ``rank_round``: rank on round(score, n) instead of the raw score —
    cross-engine rank stability for the oracle twin (ln() can differ by
    1 ulp between the JVM and libm, which could flip the order of two
    nearly-tied DIFFERENT terms; ranking on the rounded score pins the
    comparison to the same 6-decimal values both engines emit).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = df.select(F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("w"))
    tf = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(dfreq, "w")
        .join(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")))
    )
    rank_key = F.round("score", rank_round) if rank_round is not None else F.col("score")
    win = Window.partitionBy("id").orderBy(F.desc(rank_key), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "w", "tf", "df", "score")
    )
