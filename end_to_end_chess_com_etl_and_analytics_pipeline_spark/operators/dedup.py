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

from ..functions.fastlit import array_lit
from ..functions.hashing import (
    MINHASH_H_MOD,
    MINHASH_PRIME,
    SHINGLE_COMBINE_B,
    md5_long,
    minhash_coeffs,
)
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


def _shingle_hash_df(
    df: DataFrame, text_col: str, id_col: str, shingle_len: int
) -> DataFrame:
    """(id, __hs): shingle hashes per document, built as one md5 per
    token (30-bit) then a polynomial combine of ``shingle_len``
    consecutive token hashes mod 2^31-1 — integer ops only, no
    per-shingle string allocation.  Documents shorter than one shingle
    fold all their token hashes into a single value.  Staged selects
    keep each expensive alias evaluated once.

    NULL-text docs are EXCLUDED (no content → nothing to fingerprint);
    without this, every NULL doc hashes to the identical empty
    signature and the LSH layers above weld them into one giant bogus
    near-dup cluster (found by the NULL-injected differential sweep).
    The DuckDB oracles drop them the same way (tokenizing NULL yields
    NULL, which unnest discards)."""
    from ..session import cached_column

    def _build():
        th = F.transform(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""),
            lambda t: md5_long(t) % MINHASH_H_MOD,
        )

        def _poly(arr):
            return F.aggregate(
                arr,
                F.lit(0).cast("bigint"),
                lambda acc, h: (acc * F.lit(SHINGLE_COMBINE_B) + h)
                % F.lit(MINHASH_PRIME),
            )

        n = F.size(F.col("__th"))
        hs = F.when(
            n < shingle_len, F.array(_poly(F.col("__th")))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(shingle_len - 1)),
                lambda i: _poly(F.slice(F.col("__th"), i, shingle_len)),
            )
        )
        return th, hs

    # the tree is a pure function of (text_col, shingle_len) — build it
    # once per session (session.cached_column; expression structure
    # only, never data)
    th, hs = cached_column(
        df.sparkSession, ("shingle_hs", text_col, shingle_len), _build
    )
    df = df.where(F.col(text_col).isNotNull())
    with_th = df.select(F.col(id_col), th.alias("__th"))
    return with_th.select(F.col(id_col), hs.alias("__hs"))


def minhash_signature_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signature per document as one array column — a pure
    *projection*, no explode, no shuffle; at 100 TB the signature stage
    is map-side only.

    Cost model (why three staged selects):

    1. ONE md5 per *token* (not per shingle, and never one per
       shingle×seed): ``__th`` = 30-bit token hashes.
    2. Shingle identity is the polynomial combine of ``shingle_len``
       consecutive token hashes mod 2^31-1 (``__hs``) — integer
       multiply-adds replace the per-shingle slice+join string
       allocation that dominated the original formulation (≈10×).
       Documents shorter than one shingle fold all their token hashes
       into a single value.
    3. The i-th hash function is the universal family g_i(h) =
       (a_i*h + b_i) mod p (hashing.minhash_coeffs); h < 2^31 and
       a_i < 2^31 keep every product under 2^62 — exact BIGINT in both
       engines.

    Each stage's alias is multi-referenced, which CollapseProject keeps
    materialized, so no stage is recomputed per consumer.  Min over the
    shingle multiset equals min over distinct shingles, so semantics
    match the oracle's distinct-shingle formulation.
    """
    a_co, b_co = minhash_coeffs(num_hashes)
    with_hs = _shingle_hash_df(df, text_col, id_col, shingle_len)

    # the per-seed expression tree is a pure function of num_hashes, so
    # build it once per session (session.cached_column — ~6 py4j round
    # trips per seed, 0.3-0.4 s per CALL at 16 seeds before the memo).
    # The tree itself stays the UNROLLED per-seed form: a zip_with over
    # two coefficient-array literals was measured 1.3-1.7× slower to
    # EXECUTE at sf0.1 (x20 1.11→1.83 s, x35 0.98→1.46 s — the paired
    # lambda variables defeat the flat per-seed evaluation), so the
    # memo buys the build saving without touching the executed plan.
    from ..session import cached_column

    def _build():
        def _g(a: int, b: int):
            return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

        return F.array(
            *[
                F.array_min(F.transform(F.col("__hs"), _g(a_co[i], b_co[i])))
                for i in range(num_hashes)
            ]
        )

    sig = cached_column(df.sparkSession, ("minhash_sig", num_hashes), _build)
    return with_hs.select(F.col(id_col), sig.alias("signature"))


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """MinHash signatures in long shape (id, seed, minhash) — the
    oracle-comparable view of :func:`minhash_signature_array` (the
    explode is map-side; still no shuffle).

    Explodes a FOLDABLE literal (seed, a, b) array rather than the
    signature itself: InferFiltersFromGenerate skips foldable generator
    children, so the optimizer never clones the expensive hash projection
    into an inferred size()>0 filter, and the Generate node acts as a
    barrier that keeps the one-md5-per-token pass evaluated once."""
    a_co, b_co = minhash_coeffs(num_hashes)
    # fastlit: one two-node literal instead of num_hashes struct
    # constructions (see minhash_signature_array) — still a FOLDABLE
    # generator child, so the InferFiltersFromGenerate barrier below
    # holds unchanged
    seeds = array_lit(
        df.sparkSession,
        [
            {"seed": i, "a": int(a_co[i]), "b": int(b_co[i])}
            for i in range(num_hashes)
        ],
        "array<struct<seed:int,a:bigint,b:bigint>>",
    )
    exploded = _shingle_hash_df(df, text_col, id_col, shingle_len).select(
        F.col(id_col), F.col("__hs"), F.explode(seeds).alias("sb")
    )
    return exploded.select(
        id_col,
        F.col("sb.seed").alias("seed"),
        F.array_min(
            F.transform(
                F.col("__hs"),
                lambda h: (h * F.col("sb.a") + F.col("sb.b")) % F.lit(MINHASH_PRIME),
            )
        ).alias("minhash"),
    )


def _band_bucket_pairs(band_sig: DataFrame, id_col: str) -> DataFrame:
    """Candidate pairs (id_a < id_b) from a (id, band, band_key) table.

    The band table is staged with ``localCheckpoint`` so the expensive
    signature subtree above it is evaluated ONCE (a plain self-join
    would clone it into both join sides); a warehouse deployment stages
    to parquet instead — same plan shape, durable.  Candidates then come
    from a self-equi-join on (band, band_key).  Versus the previous
    collect_list-then-explode bucket expansion, a hot bucket (one viral
    duplicate cluster) is no longer concentrated into a single task and
    a single giant array row (2 GB array ceiling at 100 TB): the join
    shuffles both sides by key and AQE skew-join splitting
    (spark.sql.adaptive.skewJoin) breaks oversized buckets across
    tasks.  Pair expansion inside a bucket is still O(|bucket|²) — that
    is inherent to LSH — but it is now parallel and bounded per task.
    """
    staged = band_sig.localCheckpoint(eager=False)
    a = staged.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = staged.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def band_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
) -> DataFrame:
    """The LSH band index: one (id, band, band_key) row per doc per band.
    This is the table a warehouse *persists* (partitioned by band) so
    later batches can probe it without touching corpus text again —
    see :func:`incremental_lsh_matches`.

    Explodes a FOLDABLE band-index literal (not an expression over the
    signature): InferFiltersFromGenerate would otherwise clone the full
    signature expression into an inferred filter and double the md5
    pass.  The Generate barrier keeps ``signature`` computed once per
    doc; the per-band key is then a cheap slice+md5 over 2 bigints."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_array(df, text_col, id_col, num_hashes, shingle_len)
    return sig.select(
        F.col(id_col),
        F.col("signature"),
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.slice(
                        F.col("signature"),
                        F.col("band") * rows_per_band + 1,
                        F.lit(rows_per_band),
                    )
                ),
            )
        ).alias("band_key"),
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
    projection); the staged band table then self-joins on
    (band, band_key) — each bucket holds only colliding docs, so
    candidate generation is bucket-local, never O(n²) global, and hot
    buckets are skew-split across tasks (see _band_bucket_pairs)."""
    return _band_bucket_pairs(
        band_signatures(df, text_col, id_col, num_hashes, bands, shingle_len),
        id_col,
    )


def incremental_lsh_matches(
    corpus_index: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    probe_signatures: DataFrame | None = None,
) -> DataFrame:
    """Probe a NEW batch against an EXISTING corpus LSH index — the
    daily-ingest shape of dedup at 100 TB: the corpus index
    (:func:`band_signatures` output, persisted) is never rebuilt and
    never self-joined; each arriving batch computes its own band
    signatures (O(batch)) and equi-joins the index on (band, band_key).

    Returns one row per batch doc: the number of DISTINCT colliding
    corpus docs, the smallest colliding corpus id (NULL when none), and
    ``is_novel``.  Batch-internal duplicates are out of scope here —
    run :func:`minhash_lsh_pairs` within the batch for those.

    ``probe_signatures`` (optional) supplies the batch's
    :func:`band_signatures` output precomputed — callers that already
    derived probe and index from ONE signature pass over a combined
    frame (x35's one-shot shape) pass it to avoid a second
    shingle+minhash pass over the batch text.

    Scale: the join shuffles by (band, band_key); a viral band bucket
    is split by AQE skew-join exactly as in the self-join path.  The
    per-doc aggregation shuffles only batch ids."""
    if probe_signatures is None:
        probe_signatures = band_signatures(
            batch, text_col, id_col, num_hashes, bands, shingle_len
        )
    probe = probe_signatures.select(
        F.col(id_col).alias("__bid"), "band", "band_key"
    )
    idx = corpus_index.select(
        F.col(id_col).alias("__cid"), "band", "band_key"
    )
    hits = (
        probe.join(idx, ["band", "band_key"])
        .groupBy("__bid")
        .agg(
            F.countDistinct("__cid").alias("n_corpus_collisions"),
            F.min("__cid").alias("first_match"),
        )
    )
    return (
        batch.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("__bid"), "left")
        .select(
            id_col,
            F.coalesce("n_corpus_collisions", F.lit(0)).alias(
                "n_corpus_collisions"
            ),
            "first_match",
            F.col("first_match").isNull().alias("is_novel"),
        )
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
    shuffle; at 100 TB this is scan-speed.

    Cost note (r2 bench regression investigated in r4, sf0.1=5000 docs):
    ~0.57s is the md5→60-bit token hashing (the shared oracle contract)
    and ~0.65s the vote aggregation.  Measured alternatives — one
    aggregate per bit, and packed 16-bit-lane scalar accumulators — run
    1.19s and 1.71s against this form's 1.23s: Spark evaluates
    higher-order functions interpreted, so per-token work, not the
    accumulator shape, is the floor.  The remaining alternative
    (explode + groupBy vote sum) would trade a scan-local projection
    for a full-corpus shuffle — worse at every scale that matters.

    NULL-text docs are excluded, as in the MinHash family
    (_shingle_hash_df): no content → no signature, matching the
    oracle's NULL-tokenization drop."""
    from ..functions.text import casefold

    df = df.where(F.col(text_col).isNotNull())
    toks = F.filter(F.split(casefold(F.col(text_col)), r"\s+"), lambda t: t != "")
    with_hashes = df.select(
        F.col(id_col), F.transform(toks, lambda t: md5_long(t)).alias("hs")
    )
    # Single pass over the token hashes accumulating all `bits` counters
    # at once (zip_with), then one finish step: bit b is set iff more
    # than half the tokens have bit b set (equivalent to the +1/-1 vote
    # sum being positive).  One traversal instead of one per bit, and a
    # much smaller expression tree to compile.
    simhash = F.expr(
        f"""
        aggregate(
            hs,
            struct(CAST(0 AS INT) AS n, array_repeat(CAST(0 AS INT), {bits}) AS cnt),
            (acc, h) -> struct(acc.n + 1 AS n,
                               zip_with(acc.cnt, sequence(0, {bits - 1}),
                                        (c, b) -> c + CAST(shiftright(h, b) & 1 AS INT)) AS cnt),
            acc -> aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),
                             (s, b) -> s + IF(2 * acc.cnt[b] > acc.n,
                                              shiftleft(CAST(1 AS BIGINT), b),
                                              CAST(0 AS BIGINT))))
        """
    )
    return with_hashes.select(id_col, simhash.alias("simhash"))


def srp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random hyperplanes for signed-random-projection LSH
    (Charikar 2002).  Fixed seed so the Spark operator and the DuckDB
    oracle SQL embed the same literals."""
    import random

    rng = random.Random(0x51A9E5)
    return [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_auto_geometry(
    n_vectors: int, bands: int = 4, max_bits: int | None = None
) -> tuple[int, int]:
    """Size SRP-LSH bits-per-band to the corpus: ``ceil(log2 n)``,
    floored at 8, so the expected band-bucket occupancy stays O(1) and
    candidate generation stays bucket-local as n grows.  With a FIXED
    width b, candidates grow as n²/2^b — measured in SCALE.md's
    fixed-dup probe: 8-bit bands at 60k vectors cost 18 s producing
    ZERO output at threshold 0.9 (pure candidate burn), while the
    log2(n)-sized 16-bit bands ran 3.4× base for 30× data.  Computed
    integer-exact as ``(n-1).bit_length()`` — identical to
    ``ceil(log2 n)`` for every n ≥ 2 but float-free, so a SQL oracle
    can reproduce it with ``length(bin(n-1))`` and never disagree at a
    power-of-two boundary.  ``max_bits`` caps the width (x14's oracle
    embeds plane literals for bands·max_bits planes — the cap bounds
    that SQL; the engine path defaults to 32 — past 32 bits the bucket
    space already exceeds any realistic executor count and wider keys
    only thin buckets below the O(1)-occupancy target, while an
    UNCAPPED width would outgrow even a long fold at absurd n).
    Returns (n_planes, bands)."""
    bits = max(8, (max(n_vectors, 2) - 1).bit_length())
    bits = min(bits, 32 if max_bits is None else max_bits)
    return bits * bands, bands


def embedding_lsh_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int | str = 32,
    bands: int = 4,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup at scale: signed-random-projection LSH.

    Signature bit j = sign(v · plane_j); docs sharing any band of the
    bit signature become candidate pairs (same skew-safe band self-join
    as MinHash LSH, _band_bucket_pairs), then candidates are verified
    with exact cosine ≥ threshold.  Unlike the brute-force kernel
    (:func:`embedding_near_dup_pairs`, O(n²)), the pairwise step is
    bucket-local — the 100 TB path.  Norms are staged once per vector so
    the verify (which dominates: |candidates| >> |vectors|) does one
    aggregation per pair, not three.  Returns (id_a, id_b, cos).

    Selectivity is governed by bits-per-band (``n_planes // bands``).
    The default 8-bit bands give a 256-key space per band: a random
    (cos≈0) pair collides in a band with p≈2^-8, while a near-dup pair
    at cos ≥ 0.9 (angle ≤ 26°) collides with p ≈ (1-θ/π)^8 ≈ 0.29 per
    band → ≈ 0.75 over 4 bands — candidates shrink by orders of
    magnitude versus the earlier 4-bit geometry (which admitted ~23% of
    ALL pairs) at modest recall cost for high-cosine pairs.  For still
    larger corpora, grow bits-per-band with log2(n) (and add bands to
    hold recall): collision probability per band must shrink faster
    than the O(n²) pair space grows.  Pass ``n_planes="auto"`` to size
    the width from a corpus count via :func:`lsh_auto_geometry` — one
    cheap count() per call; the explicit ints stay the oracle-pinned
    registry geometry (x14)."""
    from ..functions.vectors import usable_vec

    df = df.where(usable_vec(F.col(vec_col)))
    from ..functions.vectors import cosine_staged, norm

    if n_planes == "auto":
        n_planes, bands = lsh_auto_geometry(df.count(), bands)
    rows_per_band = n_planes // bands
    planes = srp_planes(n_planes, dim)
    # One transform over a single array<array<double>> Literal node
    # instead of n_planes separate aggregate trees each holding `dim`
    # F.lit calls: the plan carries one leaf instead of 2048 literal
    # nodes, so every analysis pass is O(1) over it (fastlit; measured
    # at sf0.1: build+exec 0.64s vs 2.6s for the per-plane form,
    # identical results).
    from ..functions.fastlit import array_lit

    planes_lit = array_lit(
        df.sparkSession,
        [[float(v) for v in plane] for plane in planes],
        "array<array<double>>",
    )
    dots = F.transform(
        planes_lit,
        lambda p: F.aggregate(
            F.zip_with(F.col(vec_col), p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    staged = df.select(F.col(id_col), dots.alias("__dots"))
    bits = F.transform(
        F.col("__dots"), lambda d: F.when(d >= 0, F.lit(1)).otherwise(F.lit(0))
    )
    with_bits = staged.select(F.col(id_col), bits.alias("__bits"))
    band_sig = with_bits.select(
        F.col(id_col),
        F.col("__bits"),
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    ).select(
        id_col,
        "band",
        F.aggregate(
            F.slice(
                F.col("__bits"), F.col("band") * rows_per_band + 1, rows_per_band
            ),
            # long accumulator: an int fold overflows past 31 bits per
            # band (ANSI job kill / silent wraparound collisions); the
            # key is join-internal so the widening is invisible outside
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + b,
        ).alias("band_key"),
    )
    cand = _band_bucket_pairs(band_sig, id_col)
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos",
            round_fixed(
                cosine_staged(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp k-gram sketch).

    Every character k-gram gets the polynomial hash
    h(i) = sum_j code(s[i+j]) * B^(k-1-j) mod P, computed from ONE staged
    char-codes array per row (cheap integer multiply-adds; no per-gram
    string allocation or md5).  The winnowing-style sketch keeps the
    grams with ``h % W == 0`` — a content-defined subset stable under
    shifts/edits elsewhere in the document — and summarizes them as
    (count, md5-of-sorted-set).  Pure projection: no shuffle at any
    scale."""
    from ..functions.text import ROLLING_B, ROLLING_K, ROLLING_P, ROLLING_W

    k = ROLLING_K if k is None else k
    w = ROLLING_W if w is None else w
    codes = F.transform(
        F.split(F.col(text_col), ""), lambda ch: F.ascii(ch).cast("bigint")
    )
    staged = df.select(F.col(id_col), codes.alias("__codes"))
    n_positions = F.size(F.col("__codes")) - F.lit(k - 1)
    # guard: Spark's sequence(1, 0) is DESCENDING ([1, 0]), so a doc
    # shorter than k chars must short-circuit to an empty gram list
    kh = F.when(
        n_positions < 1, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_positions, F.lit(1))),
            lambda i: F.aggregate(
                F.slice(F.col("__codes"), i, k),
                F.lit(0).cast("bigint"),
                lambda acc, ch: (acc * ROLLING_B + ch) % ROLLING_P,
            ),
        )
    )
    sel = F.sort_array(F.array_distinct(F.filter(kh, lambda h: h % w == 0)))
    # second staging step: `sel` is consumed twice below — keep the k-gram
    # pass from running once per consumer
    sketched = staged.select(F.col(id_col), sel.alias("__sel"))
    return sketched.select(
        id_col,
        F.size("__sel").alias("n_grams"),
        F.md5(F.concat_ws(",", F.col("__sel"))).alias("fp_sketch"),
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
    same-cell pairs are compared.  Norms are staged once per vector, not
    recomputed per pair (cosine_staged — bit-identical).

    Only usable vectors participate (finite components, nonzero norm —
    functions.vectors.usable_vec): cosine is 0/0-undefined on zero
    vectors and one NaN component would poison every pair it joins."""
    from ..functions.vectors import cosine_staged, norm, usable_vec

    df = df.where(usable_vec(F.col(vec_col)))
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            round_fixed(
                cosine_staged(
                    F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
