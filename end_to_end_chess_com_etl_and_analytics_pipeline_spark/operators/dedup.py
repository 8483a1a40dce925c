"""Deduplication operators for the training-data pipeline extensions.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — all pure DataFrame compositions (no Python UDFs), built on the
cross-engine md5 hash contract (functions.hashing) so every stage is
verifiable against the DuckDB oracle.

Scale design (100 TB corpus):

- exact dedup: one shuffle on the 60-bit fingerprint (a groupBy on a
  uniformly-distributed key — no skew by construction).
- MinHash LSH: per-doc signature is a map-side projection (explode
  shingles → groupBy doc × seed min). Candidate generation shuffles on
  *band signature* — each bucket holds only colliding docs, so the
  pairwise step is bounded per bucket instead of O(n²) global.
- SimHash: 64-bit signature from per-token hash bits; near-dup = equal
  signature band keys; same bucketing argument.
- n-gram Jaccard: exact verify step over candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.rounding import round_fixed
from ..functions.text import fingerprint, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per normalized-text fingerprint."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signature per document, long shape (id, seed, minhash):
    for seed i, min over shingles of h(concat(i, '|', shingle)).  The
    long shape keeps downstream banding a pure groupBy and is exactly
    recomputable by the DuckDB oracle (shared md5 contract)."""
    shingled = df.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, shingle_len)).alias("shingle"),
    ).distinct()
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    seeded = shingled.select(id_col, seeds, "shingle")
    hashed = seeded.withColumn(
        "h",
        md5_long(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))),
    )
    return hashed.groupBy(id_col, "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band of
    their MinHash signature.  rows = (id_a, id_b) with id_a < id_b."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_table(df, text_col, id_col, num_hashes, shingle_len)
    banded = sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
    band_sig = banded.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list(F.col("minhash"))))).alias(
            "band_key"
        )
    )
    a = band_sig.select(
        F.col(id_col).alias("id_a"), "band", F.col("band_key")
    )
    b = band_sig.select(
        F.col(id_col).alias("id_b"), "band", F.col("band_key")
    )
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for near-dup pairs.

    Without ``candidates``, generates pairs via an inverted shingle index
    (docs sharing ≥1 shingle) — still bounded by shingle collision lists,
    not O(n²).  With ``candidates`` (e.g. LSH output), verifies only those.
    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    """
    shingled = (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_len)).alias("shingle"),
        )
        .distinct()
    )
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    if candidates is None:
        a = shingled.select(F.col(id_col).alias("id_a"), "shingle")
        b = shingled.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
    else:
        pair_sh = candidates.join(
            shingled.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
        )
        inter = (
            pair_sh.join(
                shingled.select(F.col(id_col).alias("id_b"), "shingle"),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_common"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            round_fixed(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash: per-token 60-bit hash → for each bit position, sum of
    (+1/-1); signature bit = 1 where the sum is positive.  Computed with
    explode + groupBy (pure relational — bit b of token-hash h is
    (h >> b) & 1), giving (id, simhash) as a ``bits``-wide bigint."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    hashed = toks.withColumn("h", md5_long(F.col("tok")))
    bit_idx = F.explode(F.array(*[F.lit(b) for b in range(bits)])).alias("bit")
    bit_rows = hashed.select(id_col, bit_idx, "h").withColumn(
        "vote",
        F.when(F.expr("(shiftright(h, bit) & CAST(1 AS BIGINT)) = 1"), 1).otherwise(-1),
    )
    votes = bit_rows.groupBy(id_col, "bit").agg(F.sum("vote").alias("s"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ threshold.

    Brute-force O(n²) formulation for correctness; the scale path buckets
    by coarse quantization first (see similarity.ivf_topk) so only
    same-cell pairs are compared."""
    from ..functions.vectors import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", round_fixed(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
