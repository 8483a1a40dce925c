"""Fuzzy (edit-distance) self-join: all pairs within Levenshtein
distance ``max_dist`` of each other on a short key column — the
entity-resolution / near-key-matching primitive the exact-dedup and
shingle-Jaccard operators don't cover (they need shared tokens; edit
distance catches typos, truncations, and single-character drift).

Algorithm (PassJoin-style segment banding, Li et al., VLDB 2012 — the
published partition-based string-similarity-join family):

1. Collapse the corpus to DISTINCT keys.  Docs sharing a key pair up
   at distance 0 through a plain equality self-join — the segment
   machinery only ever sees unique strings, so exact-duplicate hot
   keys can never blow up candidate generation.
2. Segment side: each distinct key of length L splits into
   ``max_dist+1`` contiguous segments (as even as possible, earlier
   segments take the remainder).  Pigeonhole: at most ``max_dist``
   edits can touch at most ``max_dist`` segments, so if
   ``ed(s,t) <= max_dist`` at least one segment of s survives intact
   in t, shifted by at most ``max_dist`` positions (the net indel
   budget).  This is the lossless banding invariant — verified against
   a brute-force cross join in tests/test_fuzzy.py.
3. Probe side: each distinct key t of length M emits, for every
   partner length L in [M-max_dist, M] (pairs generate from the
   longer string, ties on length orient by key order), every segment
   index i, and every start within +-max_dist of the segment's home
   position, the substring of t of that segment's length.  For
   max_dist=2 that is <= 3*3*5 = 45 bounded probe rows per key.
4. Candidates = equi-join of segment and probe records on
   (partner_len, segment_idx, substring_value) — a hash shuffle on
   bounded-fanout keys, NEVER an all-pairs product.  Verify with the
   thresholded native ``levenshtein(l, r, max_dist)`` (returns -1
   early once the band is exceeded — O(max_dist * len) per pair, not
   O(len^2)), then expand candidate key pairs back to doc pairs
   through the (id, key) map.

Scale design (100 TB corpus): one DISTINCT shuffle on the key, two
scan-local explode projections, one candidate equi-join keyed by
segment value (fanout bounded by banding), and two key-equality
expansion joins.  No window, no crossJoin, no driver collect; every
stage is whole-stage-codegen'd native expressions (no UDFs).

Reference parity: the reference has no fuzzy-matching operator at all
(its dedup is exact SQL ``row_number`` latest-wins —
python_scripts.py); this extends the same "collapse near-identical
records" intent to typo-distance keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_layout(length: Column, i: Column, n_seg: int) -> tuple[Column, Column]:
    """(start_pos, seg_len) of segment ``i`` when a string of ``length``
    chars splits into ``n_seg`` as-even-as-possible parts; the first
    ``length % n_seg`` segments take one extra char.  Positions are
    0-based; empty segments (length < n_seg) get seg_len 0."""
    base = F.floor(length / n_seg).cast("int")
    rem = (length % n_seg).cast("int")
    seg_len = (base + F.when(i < rem, 1).otherwise(0)).cast("int")
    start = (i * base + F.least(i, rem)).cast("int")
    return start, seg_len


def edit_distance_pairs(
    df: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    max_dist: int = 2,
    min_key_len: int = 0,
) -> DataFrame:
    """All unordered id pairs whose keys are within ``max_dist``
    Levenshtein edits: (id_a < id_b, dist).  Keys are compared exactly
    as given — normalize (casefold / ASCII-squash) upstream so both
    engines agree on character counting.

    ``min_key_len`` is the degenerate-key guard: rows whose key is
    shorter than it emit NO pairs.  Aggressive upstream normalization
    (e.g. an ASCII squash over a CJK/RTL corpus) can map a large
    fraction of documents to the empty string; without the gate those
    all become mutual distance-0 "matches" — a quadratic, semantically
    meaningless output.  A short key carries too little signal to call
    two documents near-duplicates anyway, so the gate is a semantic
    floor, not just a blow-up guard.  Set 0 to disable (exact
    brute-force parity on tiny fixtures)."""
    d = int(max_dist)
    n_seg = d + 1
    doc_keys = df.select(
        F.col(id_col).alias("__id"), F.col(key_col).alias("__key")
    ).where(
        F.col("__key").isNotNull()
        & (F.length("__key") >= int(min_key_len))
    )

    # --- distance-0 pairs: equality self-join on the key ------------
    a, b = doc_keys.alias("a"), doc_keys.alias("b")
    same = a.join(
        b,
        (F.col("a.__key") == F.col("b.__key"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        F.lit(0).cast("int").alias("dist"),
    )

    # --- cross-key candidates over DISTINCT keys ---------------------
    keys = doc_keys.select("__key").distinct()

    # segment records: the indexed (shorter-or-equal) side
    seg_start, seg_len = _seg_layout(F.col("s_len"), F.col("__i"), n_seg)
    segments = (
        keys.select(
            F.col("__key").alias("key_s"),
            F.length("__key").alias("s_len"),
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("__i"),
        )
        .select(
            "key_s",
            "s_len",
            "__i",
            F.substring(F.col("key_s"), seg_start + 1, seg_len).alias("__val"),
        )
    )

    # probe records: for each partner length, segment index, and
    # shifted start, the substring of this key with that segment's
    # length.  starts outside [0, M - seg_len] are clamped away; an
    # inverted range yields no probes for that (length, index).
    probes = (
        keys.select(
            F.col("__key").alias("key_t"),
            F.length("__key").alias("t_len"),
            F.explode(
                F.sequence(F.lit(0), F.least(F.lit(d), F.length("__key")))
            ).alias("__dL"),
        )
        .select(
            "key_t",
            "t_len",
            (F.col("t_len") - F.col("__dL")).alias("p_len"),
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("__i"),
        )
    )
    p_start, p_len_col = _seg_layout(F.col("p_len"), F.col("__i"), n_seg)
    start_lo = F.greatest(p_start - d, F.lit(0))
    start_hi = F.least(p_start + d, F.col("t_len") - p_len_col)
    probes = (
        probes.select(
            "key_t",
            "t_len",
            "p_len",
            "__i",
            p_len_col.alias("__slen"),
            F.explode(
                F.when(
                    start_hi >= start_lo, F.sequence(start_lo, start_hi)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("__start"),
        )
        .select(
            "key_t",
            "t_len",
            "p_len",
            "__i",
            F.substring(
                F.col("key_t"), F.col("__start") + 1, F.col("__slen")
            ).alias("__val"),
        )
        # NO .distinct() here (r12): duplicate probe rows (different
        # shifted starts yielding the same substring) only duplicate
        # candidate pairs, and ``candidates`` below already pays a
        # distinct — deduping probes first cost a full exchange of the
        # exploded probe set (≤45 rows/key either way, so the join
        # fanout bound is unchanged).  Interleaved A/B at sf0.1:
        # 1.880 s vs 2.052 s best-of-8, the no-distinct side winning
        # every warm rep (guide §2.4: remove shuffles outright).
    )

    candidates = (
        segments.join(
            probes,
            (segments.s_len == probes.p_len)
            & (segments["__i"] == probes["__i"])
            & (segments["__val"] == probes["__val"]),
        )
        .where(
            (F.col("s_len") < F.col("t_len"))
            | (
                (F.col("s_len") == F.col("t_len"))
                & (F.col("key_s") < F.col("key_t"))
            )
        )
        .select("key_s", "key_t")
        .distinct()
    )
    # thresholded verify: -1 once the band is exceeded, else the exact
    # distance (and key_s != key_t here, so dist >= 1 — disjoint from
    # the distance-0 equality pairs above)
    verified = candidates.select(
        "key_s",
        "key_t",
        F.levenshtein(F.col("key_s"), F.col("key_t"), d).alias("dist"),
    ).where(F.col("dist") >= 0)

    cross = (
        verified.join(
            doc_keys.alias("da"), F.col("key_s") == F.col("da.__key")
        )
        .join(doc_keys.alias("db"), F.col("key_t") == F.col("db.__key"))
        .select(
            F.least(F.col("da.__id"), F.col("db.__id")).alias("id_a"),
            F.greatest(F.col("da.__id"), F.col("db.__id")).alias("id_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
    return same.unionByName(cross)
