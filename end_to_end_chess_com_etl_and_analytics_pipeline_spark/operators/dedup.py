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


def minhash_signature_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signature per document as one array column — a pure
    *projection*: for seed i, array_min over shingles of
    h(concat(i, '|', shingle)).  No explode, no shuffle; at 100 TB the
    signature stage is map-side only (min over a multiset ignores the
    duplicate shingles a distinct would have removed, so semantics equal
    the distinct-shingle formulation)."""
    shingles = word_shingles(text_col, shingle_len)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(
                shingles,
                lambda s: md5_long(
                    F.concat(seed.cast("string"), F.lit("|"), s)
                ),
            )
        ),
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signatures in long shape (id, seed, minhash) — the
    oracle-comparable view of :func:`minhash_signature_array` (the
    explode is map-side; still no shuffle)."""
    arr = minhash_signature_array(df, text_col, id_col, num_hashes, shingle_len)
    return arr.select(
        id_col,
        F.posexplode("signature").alias("seed", "minhash"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band of
    their MinHash signature.  rows = (id_a, id_b) with id_a < id_b.

    Band signatures are computed per-row from the signature array (pure
    projection); the only shuffle in the whole pipeline is the bucket
    self-join on (band, band_key) — each bucket holds only colliding
    docs, so candidate generation is bucket-local, never O(n²) global."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_array(df, text_col, id_col, num_hashes, shingle_len)
    band_entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    ),
                )
            ).alias("band_key"),
        ),
    )
    band_sig = sig.select(
        F.col(id_col), F.explode(band_entries).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
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
    (+1/-1) votes weighted by token frequency; signature bit = 1 where
    the sum is positive.  Computed as a pure per-row projection (nested
    higher-order aggregates over the token-hash array) — no explode, no
    shuffle; at 100 TB this is scan-speed."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    with_hashes = df.select(
        F.col(id_col), F.transform(toks, lambda t: md5_long(t)).alias("hs")
    )
    simhash = F.expr(
        f"""
        aggregate(
            sequence(0, {bits - 1}),
            CAST(0 AS BIGINT),
            (acc, b) -> acc + IF(
                aggregate(hs, 0, (a2, h) -> a2 + IF((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
                shiftleft(CAST(1 AS BIGINT), b),
                CAST(0 AS BIGINT)))
        """
    )
    return with_hashes.select(id_col, simhash.alias("simhash"))


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
