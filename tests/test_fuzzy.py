"""x63 fuzzy (edit-distance) join: PassJoin banding losslessness.

The candidate generation is a lossless band by the pigeonhole argument
(operators/fuzzy.py docstring); these tests check the claim against
brute force on adversarial shapes — pure indel shifts (the alignment
drift the shifted probe windows exist for), equal-length substitution
clusters, exact-duplicate hot keys, and a seeded random corpus.
"""

from __future__ import annotations

import itertools
import random

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.fuzzy import (
    edit_distance_pairs,
)

from tests.conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def _brute(keys: dict[int, str], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for (ia, ka), (ib, kb) in itertools.combinations(sorted(keys.items()), 2):
        dist = _lev(ka, kb)
        if dist <= d:
            out.add((ia, ib, dist))
    return out


def _run(spark, keys: dict[int, str], d: int = 2) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(
        [(i, k) for i, k in keys.items()], "doc_id long, key string"
    )
    got = edit_distance_pairs(df, key_col="key", id_col="doc_id", max_dist=d)
    return {(r.id_a, r.id_b, r.dist) for r in got.collect()}


def test_indel_shift_pairs_found(spark):
    """Pure insert/delete edits shift the alignment — the case a naive
    same-position segment match loses and the +-d probe windows keep."""
    keys = {
        1: "abcdefghijkl",
        2: "XYabcdefghijkl",  # two inserts at the front: shift +2
        3: "abcdefghijklXY",  # two inserts at the back
        4: "acdefghijkl",  # one delete inside
        5: "abcdefghijklmno",  # distance 3 from key 1 — excluded
        6: "zzzzzzzzzzzz",  # far from everything
    }
    assert _run(spark, keys) == _brute(keys, 2)


def test_equal_length_substitutions(spark):
    keys = {
        1: "abcdefgh",
        2: "abcdefgX",  # 1 sub
        3: "abXdefgY",  # 2 subs
        4: "XbXdefgY",  # 3 subs from 1 — excluded vs 1, dist 1 vs 3
    }
    assert _run(spark, keys) == _brute(keys, 2)


def test_exact_duplicate_hot_keys_collapse(spark):
    """Duplicate keys pair at distance 0 via the equality join; the
    segment machinery sees each key once (hot keys can't amplify)."""
    keys = {i: "same prefix here" for i in range(1, 7)}
    keys[10] = "same prefix herX"
    got = _run(spark, keys)
    assert got == _brute(keys, 2)
    # 6 dups -> C(6,2)=15 zero-distance pairs + 6 pairs at distance 1
    assert sum(1 for (_, _, d) in got if d == 0) == 15
    assert sum(1 for (_, _, d) in got if d == 1) == 6


def test_short_and_empty_keys(spark):
    keys = {1: "", 2: "a", 3: "ab", 4: "abc", 5: "abcd", 6: "xy"}
    assert _run(spark, keys) == _brute(keys, 2)


def test_min_key_len_gate_drops_short_keys(spark):
    """min_key_len is the degenerate-key guard: keys below the floor
    emit NO pairs (neither distance-0 nor banded), keys at/above it
    behave exactly as before."""
    keys = {1: "", 2: "", 3: "ab", 4: "abc", 5: "abcdef", 6: "abcdeX"}
    df = spark.createDataFrame(
        list(keys.items()), "doc_id long, key string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(
            df, key_col="key", id_col="doc_id", max_dist=2, min_key_len=4
        ).collect()
    }
    want = _brute({i: k for i, k in keys.items() if len(k) >= 4}, 2)
    assert got == want
    # the two empty keys would have paired at distance 0 without the gate
    assert (1, 2, 0) not in got and (5, 6, 1) in got


def test_cjk_rtl_corpus_does_not_degenerate(spark):
    """The x63 contract corner the guard exists for: an ASCII-squash
    over a pure-CJK/RTL corpus maps every document to the empty key.
    Without the min-key gate they all become mutual distance-0
    'matches' (quadratic, meaningless); with it they emit nothing,
    while genuine ASCII near-keys still pair."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _FUZZY_MIN_KEY,
        _fuzzy_key_expr,
    )

    rows = [
        (1, "引擎测试文档一"),   # pure CJK
        (2, "大规模数据处理"),   # pure CJK
        (3, "בדיקת מסמך"),  # Hebrew (RTL)
        (4, "مستند اختبار"),  # Arabic (RTL)
        (5, "duplicate english doc"),
        (6, "duplicXte english doc"),  # 1 edit inside the 16-char prefix
        (7, "ok"),                      # squashes to a 2-char key: gated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keyed = df.select("doc_id", _fuzzy_key_expr().alias("fkey"))
    # precondition: the squash really does empty these keys
    empties = {
        r.doc_id for r in keyed.where("length(fkey) = 0").collect()
    }
    assert {1, 2} <= empties
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(
            keyed,
            key_col="fkey",
            id_col="doc_id",
            max_dist=2,
            min_key_len=_FUZZY_MIN_KEY,
        ).collect()
    }
    assert got == {(5, 6, 1)}


@pytest.mark.parametrize("seed", [7, 41])
def test_random_corpus_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    alpha = "abcd"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(4, 12)))
            for _ in range(30)]
    keys: dict[int, str] = {}
    i = 0
    for s in base:
        keys[i] = s
        i += 1
        # planted neighbors: substitution, deletion, insertion
        if rng.random() < 0.5:
            p = rng.randrange(len(s))
            keys[i] = s[:p] + rng.choice(alpha) + s[p + 1:]
            i += 1
        if rng.random() < 0.3:
            p = rng.randrange(len(s))
            keys[i] = s[:p] + s[p + 1:]
            i += 1
        if rng.random() < 0.3:
            p = rng.randrange(len(s) + 1)
            keys[i] = s[:p] + rng.choice(alpha) + s[p:]
            i += 1
    assert _run(spark, keys) == _brute(keys, 2)


def test_max_dist_one_band(spark):
    keys = {1: "abcdefgh", 2: "abcdefgX", 3: "abXdefgY", 4: "abcdefghi"}
    assert _run(spark, keys, d=1) == _brute(keys, 1)


def test_no_cartesian_in_plan(spark):
    """The scale contract: candidate generation is an equi-join on
    segment values — never a cross product or nested-loop join."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x63_fuzzy_join,
    )

    plan = x63_fuzzy_join(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x63_matches_oracle(spark, duck):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _x63_sql,
        x63_fuzzy_join,
    )

    got = sorted(
        (r.id_a, r.id_b, r.dist) for r in x63_fuzzy_join(spark, SF_DIR).collect()
    )
    want = sorted(tuple(r) for r in duck.sql(_x63_sql()).fetchall())
    assert got == want and len(got) > 0
