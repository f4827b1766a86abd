"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — each returns a DataFrame and composes with
the rest of the engine. Scale notes per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_shingles, doc_fingerprint, minhash_signature, simhash64, word_shingles, words
from ..functions.vectors import cosine, lsh_bucket, to_double


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint. One shuffle on the
    16-byte fingerprint (not the full text). Keeps min(id) per group."""
    fp = df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return groups


def dedup_exact_keep(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The deduplicated view: one row per fingerprint (the keeper)."""
    fp = df.withColumn("fp", doc_fingerprint(F.col(text_col)))
    w_min = dedup_exact(df, text_col, id_col).select("fp", "keeper_id")
    return fp.join(F.broadcast(w_min), "fp").filter(F.col(id_col) == F.col("keeper_id")).drop("fp", "keeper_id")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_words: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    signature (n_hashes minhashes) -> bands of band_size -> self-join on
    (band_idx, band_value) -> distinct (a < b) pairs. The join key is a
    short string; the shuffle carries only (id, band) rows — at 100 TB
    this is the standard shingle->minhash->band->bucket-join plan, and
    hot buckets (boilerplate docs) are the skew case AQE handles.
    """
    n_bands = n_hashes // band_size
    sig = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_words).alias("sg"),
    ).filter(F.size("sg") > 0).select(
        "id", minhash_signature(F.col("sg"), n_hashes).alias("sig")
    )
    bands = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.concat_ws("|", F.slice(F.col("sig"), b * band_size + 1, band_size)).alias("band_val"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_val")
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_words: int = 3,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing >=1 shingle (or a supplied
    candidate-pair set): |A∩B| via a shingle self-join, |A∪B| = |A|+|B|-∩.

    At scale: restrict with ``candidates`` (e.g. minhash_lsh_pairs) —
    the unrestricted shingle join is quadratic in hot shingles.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["id_a", "id_b"], "left_semi")
    out = (
        inter.join(F.broadcast(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")), "id_a")
        .join(F.broadcast(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")), "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select("id_a", "id_b", "n_inter", "jaccard")


def simhash_near_dups(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 60-bit simhash, blocked by 4 x 15-bit
    chunks (any pair within hamming distance 3 shares at least one exact
    chunk — pigeonhole), verified with bit_count on the xor."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(words(F.col(text_col))).alias("sh"))
    chunks = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk_idx"),
                    F.shiftright(F.col("sh"), c * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("chunk_val"),
                ),
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk_idx", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    min_cosine: float = 0.95,
    n_planes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    n_planes=0: brute-force all pairs (correctness baseline — only for
    bounded inputs). n_planes>0: random-hyperplane LSH blocking first —
    the scale path (pairs only form inside a bucket).
    """
    base = df.select(F.col(id_col).alias("id"), to_double(F.col(vec_col)).alias("v"))
    if n_planes > 0:
        base = base.withColumn("bucket", lsh_bucket(F.col("v"), n_planes))
        join_cond = (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    else:
        join_cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .filter(F.col("cos") >= min_cosine)
    )
