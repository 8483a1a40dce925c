"""Edge-case hardening for the text/dedup operators: inputs the parquet
fixtures never contain (empty text, whitespace-only, single token,
multi-byte unicode) must not crash and must stay deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_signature_array,
    rolling_fingerprint,
    simhash_signatures,
)

EDGE_DOCS = [
    (0, ""),
    (1, "   "),
    (2, "one"),
    (3, "two words"),
    (4, "exactly three word"),
    (5, "héllo wörld — ünïcode päyload"),
    (6, "a a a a a a a a"),  # degenerate repetition
    (7, "tab\tand\nnewline separated tokens here"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_DOCS, "doc_id: long, text: string")


def test_minhash_handles_degenerate_docs(edge_df):
    rows = {r.doc_id: r.signature for r in minhash_signature_array(edge_df).collect()}
    assert set(rows) == {d for d, _ in EDGE_DOCS}
    for sig in rows.values():
        assert len(sig) == 16
        assert all(v is not None and 0 <= v for v in sig)
    # repeated-token doc: every shingle identical -> all mins well-defined
    assert rows[6] == [min([v]) for v in rows[6]]


def test_simhash_handles_degenerate_docs(edge_df):
    rows = {r.doc_id: r.simhash for r in simhash_signatures(edge_df).collect()}
    assert set(rows) == {d for d, _ in EDGE_DOCS}
    # empty/whitespace docs: zero tokens -> all-zero signature
    assert rows[0] == 0
    assert rows[1] == 0
    assert all(v is not None for v in rows.values())


def test_rolling_fingerprint_handles_short_docs(edge_df):
    rows = {r.doc_id: (r.n_grams, r.fp_sketch) for r in rolling_fingerprint(edge_df).collect()}
    # doc shorter than k chars -> zero grams, md5 of empty string
    assert rows[2][0] == 0
    import hashlib

    assert rows[2][1] == hashlib.md5(b"").hexdigest()
    assert all(n >= 0 for n, _ in rows.values())


def test_rolling_fingerprint_empty_selection_matches_oracle(spark, duck):
    """A doc long enough to produce grams but whose winnowed selection
    (h % W == 0) is EMPTY must agree across engines.  Found at sf0.1
    (doc 2055): Spark's array_join('') vs DuckDB's array_to_string → NULL
    on empty lists — the oracle must coalesce (sweep r4 regression)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _X13_SQL,
    )

    # the sf0.1 fixture text that exposed the mismatch
    text = (
        "column row row group big slow merge order the agg order slow "
        "small agg stream sort fast"
    )
    df = spark.createDataFrame([(0, text)], "doc_id: long, text: string")
    assert rolling_fingerprint(df).collect()[0].n_grams == 0  # the trap
    got = rolling_fingerprint(df).collect()[0]
    duck.sql("CREATE OR REPLACE TABLE __edge(doc_id BIGINT, text VARCHAR)")
    duck.sql(f"INSERT INTO __edge VALUES (0, '{text}')")
    want = duck.sql(_X13_SQL.replace("FROM documents", "FROM __edge")).fetchall()[0]
    assert (got.doc_id, got.n_grams, got.fp_sketch) == want


def test_exact_dedup_determinism(edge_df):
    a = sorted(map(tuple, exact_dedup(edge_df).collect()))
    b = sorted(map(tuple, exact_dedup(edge_df).collect()))
    assert a == b
    # whitespace-only normalizes like empty -> same fingerprint group
    fps = {
        r.keep_id: r.fp
        for r in exact_dedup(edge_df).select("keep_id", "fp").collect()
    }
    assert 0 in fps and fps.get(0) is not None


def test_casefold_matches_duckdb_on_divergent_unicode(spark):
    """casefold ≡ CASEFOLD_SQL on every class of input where raw
    lower() diverges between the engines (İ SpecialCasing, final-sigma
    contextual rule) plus a broad non-divergent control set."""
    import duckdb

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        CASEFOLD_SQL,
        casefold,
    )

    cases = [
        "İstanbul ıssız TİTLE İ",
        "ΟΔΟΣ ΕΛΛΑΣ ΣΙΓΜΑ ς σ",
        "héllo STRASSE ÜBER ß ẞ",
        "日本語 テキスト 😀",
        "ﬁﬂ ǅǈ ǆǉ 𝕞𝕒𝕥𝕙",
        "",
        "plain ascii TEXT",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "i: long, t: string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", casefold("t").alias("c")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(cases):
        want = con.execute(
            f"SELECT {CASEFOLD_SQL.format(c='?')}", [t]
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)
