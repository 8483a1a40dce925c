"""S5/S8 JDBC round-trip against embedded Derby (no external DB needed).

The reference loads the gold star into PostgreSQL with pandas
``to_sql(if_exists="replace")`` (python_scripts.py:629-676), which drops
and recreates the table from the DataFrame schema.  Our ``write_jdbc``
instead overwrites with ``truncate=true`` so the warehouse DDL survives
reloads.  Derby runs embedded in the Spark JVM (its jars ship with
Spark), so both JDBC paths are exercised for real: scan, subquery
pushdown (the watermark query), overwrite, append, and the
DDL-preserving truncate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    dim_results_seed,
    read_jdbc,
    write_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
PROPS = {"driver": DRIVER}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby") / "warehouse_db"
    return f"jdbc:derby:{db_dir};create=true"


def _raw_connection(spark, url):
    """A direct java.sql connection for DDL/metadata the DataFrame API
    doesn't expose (same embedded engine, same JVM)."""
    jvm = spark._sc._jvm
    jvm.java.lang.Class.forName(DRIVER)
    return jvm.java.sql.DriverManager.getConnection(url)


def test_jdbc_roundtrip_and_watermark_pushdown(spark, derby_url):
    seed = dim_results_seed(spark)
    write_jdbc(seed, derby_url, "dim_results", properties=PROPS)
    back = read_jdbc(spark, derby_url, "dim_results", properties=PROPS)
    assert back.count() == 15
    assert sorted(back.columns) == sorted(seed.columns)
    assert {r.result_code for r in back.collect()} == {
        r.result_code for r in seed.collect()
    }

    # the reference's watermark query (get_last_updated_date.sql) as a
    # pushed-down subquery: the MAX runs inside the database.  Identifiers
    # are quoted because Spark's JDBC writer creates case-exact
    # (quoted-lowercase) columns while Derby upper-cases bare names.
    wm = read_jdbc(
        spark,
        derby_url,
        '(SELECT MAX(CAST("result_code" AS VARCHAR(64))) AS "last_code"'
        " FROM dim_results) w",
        properties=PROPS,
    )
    assert wm.collect()[0].last_code == "win"


def test_jdbc_append_adds_rows(spark, derby_url):
    fact = spark.range(5).select(
        F.col("id").alias("game_id"), (F.col("id") * 100).alias("rating")
    )
    write_jdbc(fact, derby_url, "fact_mini", properties=PROPS)
    write_jdbc(fact, derby_url, "fact_mini", mode="append", properties=PROPS)
    back = read_jdbc(spark, derby_url, "fact_mini", properties=PROPS)
    assert back.count() == 10


def test_jdbc_truncate_preserves_ddl(spark, derby_url):
    """Overwrite must TRUNCATE, not drop/recreate: a hand-written VARCHAR
    column survives, where a recreate-from-DataFrame would produce
    Derby's default CLOB mapping for StringType."""
    con = _raw_connection(spark, derby_url)
    try:
        st = con.createStatement()
        st.execute(
            "CREATE TABLE typed_dim (code VARCHAR(64) NOT NULL, label VARCHAR(200))"
        )
        st.execute("INSERT INTO typed_dim VALUES ('old', 'stale row')")
        st.close()
    finally:
        con.close()

    fresh = spark.createDataFrame(
        [("win", "Win"), ("lose", "Loss")], "code: string, label: string"
    )
    write_jdbc(fresh, derby_url, "typed_dim", properties=PROPS)

    back = read_jdbc(spark, derby_url, "typed_dim", properties=PROPS)
    # columns come back upper-cased: Derby folds the unquoted DDL names
    assert {r.CODE for r in back.collect()} == {"win", "lose"}  # old row gone

    con = _raw_connection(spark, derby_url)
    try:
        md = con.getMetaData().getColumns(None, None, "TYPED_DIM", "CODE")
        assert md.next()
        # java.sql.Types.VARCHAR == 12; a drop/recreate would yield CLOB (2005)
        assert md.getInt("DATA_TYPE") == 12
        md.close()
    finally:
        con.close()
