"""Driver contract: named Spark queries + matching DuckDB oracle SQL.

One entry per operator family from SURVEY.md §2 (plus the training-data
extension operators), run by the driver at sf0.01 and compared row-count /
schema / order-insensitive value-hash against DuckDB over the same
parquet.  DuckDB-differential is the *right* oracle here: the reference's
semantics are DuckDB semantics (its whole engine is embedded DuckDB), so
agreement with DuckDB is agreement with the reference.

Cross-engine determinism rules used throughout (so value-hashes match
bit-for-bit):

- money sums go through integer cents: ``CAST(ROUND(x*100, 0) AS BIGINT)``
  summed as exact integers in both engines, then ``/100.0`` — immune to
  float summation order (Spark's partial aggregation order is
  nondeterministic; DuckDB's is sequential).
- every aggregate / computed column is aliased identically on both sides
  (the driver sorts columns by name before hashing).
- DuckDB's integer SUM returns HUGEINT and EXTRACT returns BIGINT — the
  oracle SQL casts to match Spark's types.
- rankings carry explicit tie-breaks on a unique key.
- the dedup/LSH family uses the shared md5 60-bit hash contract
  (functions.hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed, round_fixed_sql
from ..operators.prefix_join import longest_prefix_match
from ..sources.tables import load_table


def cents(c: Column) -> Column:
    """Exact integer cents of a money expression (see module docstring)."""
    return F.round(c * 100, 0).cast("bigint")


def money_sum(c: Column) -> Column:
    """Order-independent, cross-engine-exact sum of a money expression."""
    return F.sum(cents(c)) / F.lit(100.0)


def _money_sum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(ROUND(({expr}) * 100, 0) AS BIGINT)) AS BIGINT) / 100.0"


# ---------------------------------------------------------------------------
# Core relational inventory (SURVEY.md §2.1-2.8)
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A5 + P7 + F10: the flagship scan→filter→hash-aggregate query
    (TPC-H Q1 shape).  Plan: parquet scan with pushed timestamp filter →
    partial agg (map-side combine) → 6-group final agg.  No joins, one
    shuffle of 6 grouped rows — this is the plan at any scale."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2025-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            round_fixed(F.avg("l_quantity"), 6).alias("avg_qty"),
            round_fixed(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       {_money_sum_sql('l_extendedprice')} AS sum_base_price,
       {_money_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {round_fixed_sql('AVG(l_quantity)', 6)} AS avg_qty,
       {round_fixed_sql('AVG(l_discount)', 6)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2025-06-01'
GROUP BY l_returnflag, l_linestatus
"""


def q02_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/F10/F11: wide projection with computed columns and casts —
    the silver-transform shape (python_scripts.py:169-195) on lineitem.
    Pure map-side projection: no shuffle, fully codegen'd."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        round_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "disc_price"
        ),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.year("l_shipdate").alias("ship_year"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


_Q02_SQL = f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       {round_fixed_sql('l_extendedprice * (1 - l_discount)', 2)} AS disc_price,
       concat_ws('/', l_returnflag, l_linestatus) AS flag_status,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
       CAST(l_shipdate AS DATE) AS ship_date,
       l_quantity > 25 AS is_bulk
FROM lineitem
"""


def q03_case_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P7/F6-F8: searched multi-arm CASE + BETWEEN quarter bucketing +
    date-part extraction — the dim_date build shape
    (python_scripts.py:326-366)."""
    o = load_table(spark, "orders", sf_dir)
    month = F.month("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        month.alias("order_month"),
        F.date_format("o_orderdate", "MMMM").alias("month_name"),
        F.date_format("o_orderdate", "EEEE").alias("weekday"),
        F.when(month.between(1, 3), 1)
        .when(month.between(4, 6), 2)
        .when(month.between(7, 9), 3)
        .otherwise(4)
        .alias("order_quarter"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_class"),
    )


_Q03_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
       strftime(o_orderdate, '%B') AS month_name,
       trim(strftime(o_orderdate, '%A')) AS weekday,
       CASE WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 1 AND 3 THEN 1
            WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 4 AND 6 THEN 2
            WHEN EXTRACT(MONTH FROM o_orderdate) BETWEEN 7 AND 9 THEN 3
            ELSE 4 END AS order_quarter,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_class
FROM orders
"""


def q04_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P7: LIKE contains + prefix predicates and BETWEEN
    (test.ipynb cells 11, 14, 28).  Predicates push to the parquet scan."""
    p = load_table(spark, "part", sf_dir)
    return p.where(
        (F.col("p_type").like("%ECONOMY%") | F.col("p_name").like("red%"))
        & F.col("p_size").between(10, 40)
    ).select("p_partkey", "p_name", "p_type", "p_size")


_Q04_SQL = """
SELECT p_partkey, p_name, p_type, p_size
FROM part
WHERE (p_type LIKE '%ECONOMY%' OR p_name LIKE 'red%')
  AND p_size BETWEEN 10 AND 40
"""


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J3: NOT-IN-subquery insert-if-absent shape
    (python_scripts.py:265-268) as a broadcast LEFT ANTI join — customers
    outside the EUROPE region.  Keys are non-null so NOT IN ≡ anti join
    (the NULL edge is pinned separately in tests, SURVEY.md §4.3)."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    euro_nations = (
        n.join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            n.n_regionkey == r.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("c_nationkey"))
    )
    return c.join(F.broadcast(euro_nations), "c_nationkey", "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


_Q05_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_nationkey NOT IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
"""


def q06_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/P6/J2: the latest-wins dedup kernel — ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY ts DESC) → rn=1 (python_scripts.py:576-598
    with game_url→user_id, last_updated→ts).  One shuffle on the
    partition key; explicit event_id tie-break for determinism."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            "value",
        )
    )


_Q06_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
WHERE rn = 1
"""


def q07_star_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/A2: multi-way star join with a role-playing dim — nation joined
    twice under different roles (customer's vs supplier's), exactly the
    reference's dim_results double-join pattern (python_scripts.py:566-573).
    The two nation roles are explicitly broadcast; orders/customer/
    supplier are left to AQE, which broadcasts them while they fit and
    falls back to shuffled joins at scale — the right plan at 100 TB,
    where orders is *not* broadcastable."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cust_nation = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


_Q07_SQL = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       {_money_sum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY n1.n_name, n2.n_name
"""


def q08_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3: global top-k by sort — Spark plans TakeOrderedAndProject
    (per-partition top-k, then k-way merge on the driver: no global
    sort exchange).  Explicit o_orderkey tie-break."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_Q08_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q09_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/A1: UNION with set semantics (dedup) over two order slices —
    the dim append shape (python_scripts.py:269-271)."""
    o = load_table(spark, "orders", sf_dir)
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    return urgent.unionByName(finished).distinct()


_Q09_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
WHERE o_orderstatus = 'F'
"""


def q10_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/A2: UNION ALL (bag semantics — the fact append,
    python_scripts.py:580-582) + group count to keep output bounded."""
    o = load_table(spark, "orders", sf_dir)
    first = o.where(F.col("o_orderkey") % 2 == 0)
    second = o.where(F.col("o_totalprice") > 200000)
    return (
        first.unionByName(second)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"))
    )


_Q10_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_rows FROM (
    SELECT * FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT * FROM orders WHERE o_totalprice > 200000)
GROUP BY o_orderstatus
"""


def q11_distinct_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3/A4: DISTINCT counts (incl. multi-column) + MAX watermark
    (test.ipynb cell 26; get_last_updated_date.sql)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
        F.max("l_shipdate").alias("watermark_ts"),
    )


_Q11_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts,
       -- multi-column DISTINCT: Spark (SQL-standard) skips a tuple when
       -- ANY member is NULL; DuckDB's row constructor would count
       -- (NULL, x) as a distinct non-NULL struct — FILTER aligns them
       COUNT(DISTINCT (l_returnflag, l_linestatus))
           FILTER (WHERE l_returnflag IS NOT NULL
                     AND l_linestatus IS NOT NULL) AS n_flag_status,
       MAX(l_shipdate) AS watermark_ts
FROM lineitem
"""


def q12_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F12: the scalar function battery — regexp_extract on a text
    blob (the PGN-header pattern), date parts/formatting, replace,
    concat, casts, epoch seconds — all codegen'd JVM expressions (the
    reference runs six Python UDFs for this tier; we run zero)."""
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        # try_cast: regexp_extract yields '' on a k-less props, and an
        # ANSI-mode cast('') aborts the job; the oracle's TRY_CAST agrees
        F.regexp_extract("props", r'"k": (\d+)', 1).try_cast("int").alias("k_value"),
        F.hour("ts").alias("ts_hour"),
        F.col("ts").cast("date").alias("ts_date"),
        F.date_format("ts", "MMMM").alias("month_name"),
        F.upper("event_type").alias("evt_upper"),
        F.replace(F.col("event_type"), F.lit("e"), F.lit("E")).alias("evt_replaced"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias("tag"),
        F.unix_timestamp("ts").alias("epoch_secs"),
        F.length("props").alias("props_len"),
    )


_Q12_SQL = """
SELECT event_id,
       TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS k_value,
       CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS ts_hour,
       CAST(ts AS DATE) AS ts_date,
       strftime(ts, '%B') AS month_name,
       upper(event_type) AS evt_upper,
       replace(event_type, 'e', 'E') AS evt_replaced,
       concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS tag,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_secs,
       CAST(length(props) AS INTEGER) AS props_len
FROM events
"""


def q13_prefix_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/D8: the longest-prefix-match join — the reference's
    ``get_opening`` interpreter loop (test.ipynb cell 28) as one
    set-oriented job: explode token-prefixes → broadcast equi-join →
    max_by(match, length).  Lexicon = 2- and 3-word leading phrases of
    every 20th document (deterministic, derived from the fixture).

    spread=False: the lexicon side is broadcast-bound and the probe
    side's map work (split + ≤3 slices) is lighter than the exchange a
    spread would insert."""
    docs = load_table(spark, "documents", sf_dir, spread=False)
    words = F.split(F.col("text"), F.lit(" "))
    # both phrase lengths from ONE scan of the sampled docs (a union of
    # two filtered selects would scan the table twice)
    phrases = F.filter(
        F.array(
            F.when(F.size(words) >= 2, F.array_join(F.slice(words, 1, 2), " ")),
            F.when(F.size(words) >= 3, F.array_join(F.slice(words, 1, 3), " ")),
        ),
        lambda p: p.isNotNull(),
    )
    lexicon = (
        docs.where(F.col("doc_id") % 20 == 0)
        .select(F.explode(phrases).alias("phrase"))
        .distinct()
    )
    matched = longest_prefix_match(
        probe=docs.select("doc_id", "text"),
        probe_col="text",
        lexicon=lexicon,
        lexicon_key="phrase",
        max_tokens=3,
        id_col="doc_id",
    )
    return matched.select("doc_id", F.col("matched_phrase"))


_Q13_SQL = """
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents),
lex AS (
    SELECT array_to_string(w[1:2], ' ') AS phrase FROM words
    WHERE doc_id % 20 = 0 AND len(w) >= 2
    UNION
    SELECT array_to_string(w[1:3], ' ') AS phrase FROM words
    WHERE doc_id % 20 = 0 AND len(w) >= 3),
prefixes AS (
    SELECT doc_id, array_to_string(w[1:CAST(r.i AS INTEGER)], ' ') AS prefix
    FROM words, range(1, 4) r(i) WHERE r.i <= len(w)),
matches AS (
    SELECT p.doc_id, max_by(p.prefix, length(p.prefix)) AS matched_phrase
    FROM prefixes p JOIN lex ON p.prefix = lex.phrase
    GROUP BY p.doc_id)
SELECT d.doc_id, m.matched_phrase
FROM documents d LEFT JOIN matches m ON d.doc_id = m.doc_id
"""


def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation: revenue by (year, priority) with ROLLUP
    subtotals and grand total — the multi-granularity dashboard shape
    the reference leaves to Power BI (README.md:29-33).  One shuffle
    computes every grouping level (Spark Expand + single hash agg);
    grouping_id disambiguates rollup NULLs from data NULLs."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            "o_orderpriority",
            cents(F.col("o_totalprice")).alias("price_cents"),
        )
        .rollup("o_year", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )


_Q14_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       o_orderpriority,
       CAST(GROUPING(CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER),
                     o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY ROLLUP (CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER),
                 o_orderpriority)
"""


def q15_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise top-k: each supplier's 3 highest-price lineitems —
    rank-in-partition with a full deterministic tie-break.  One shuffle
    on the group key; AQE handles group-count skew.  (The reference's
    only window is W1's dedup rank; this is the general ranked-retrieval
    form.)"""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


_Q15_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
           ) AS rnk
    FROM lineitem)
WHERE rnk <= 3
"""


def q16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per year spread across priority
    columns — the crosstab shape dashboards want.  Values are declared
    (not discovered), so it's ONE pass / one shuffle; an undeclared
    pivot would first scan for distinct values."""
    o = load_table(spark, "orders", sf_dir)
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        o.select(F.year("o_orderdate").alias("o_year"), "o_orderpriority")
        .groupBy("o_year")
        .pivot("o_orderpriority", priorities)
        .agg(F.count(F.lit(1)))
        .select(
            "o_year",
            *[
                F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(f"p{i + 1}")
                for i, p in enumerate(priorities)
            ],
        )
    )


_Q16_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY 1
"""


def q17_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics (the reference stops at UNION):
    customers with urgent orders but no finished ones, plus the overlap
    count as a cross-check column."""
    o = load_table(spark, "orders", sf_dir)
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    only_urgent = urgent.subtract(finished)  # EXCEPT (distinct) semantics
    both = urgent.intersect(finished)
    return only_urgent.select("o_custkey").withColumn(
        "n_overlap_custs", F.lit(None).cast("long")
    ).unionByName(
        both.agg(
            F.lit(None).cast("long").alias("o_custkey"),
            F.count("*").alias("n_overlap_custs"),
        )
    )


_Q17_SQL = """
SELECT o_custkey, CAST(NULL AS BIGINT) AS n_overlap_custs FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT CAST(NULL AS BIGINT), COUNT(*) FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q18_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long, the inverse of q16): lineitem's four
    numeric measures melted to (key, metric, value) rows.  Narrow
    Expand over the scan — no shuffle at all; values pass through
    bit-exact (no aggregation)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.where(F.col("l_orderkey") % 1000 == 0).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_Q18_SQL = """
SELECT l_orderkey, l_linenumber, m.metric,
       CASE m.metric WHEN 'l_quantity' THEN l_quantity
                     WHEN 'l_extendedprice' THEN l_extendedprice
                     WHEN 'l_discount' THEN l_discount
                     ELSE l_tax END AS value
FROM lineitem,
     (VALUES ('l_quantity'), ('l_extendedprice'), ('l_discount'), ('l_tax'))
         m(metric)
WHERE l_orderkey % 1000 = 0
"""


def q19_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and quartile (interpolated) — the exact
    counterpart to x21's sketch path.  At 100 TB you reach for
    percentile_approx (x21); the exact form exists for the scales where
    it's affordable, and both engines interpolate identically
    ((a+b)/2 on IEEE doubles), so this is oracle-comparable."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q25_price"),
        F.count("*").alias("n_items"),
    )


_Q19_SQL = """
SELECT l_returnflag,
       median(l_extendedprice) AS median_price,
       quantile_cont(l_extendedprice, 0.25) AS q25_price,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


def q20_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: customers with at least one urgent order.
    ``left_semi`` emits each qualifying customer exactly once however
    many orders match (an inner join would duplicate), and only the
    customer columns flow — the probe side never widens.  At scale the
    filter on orders prunes before the shuffle; when the distinct key
    set is small AQE can broadcast it."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_Q20_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


def q21_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions beyond ROW_NUMBER: lag/lead neighbors,
    a running (cumulative) aggregate, and dense_rank — one shuffle on
    user_id serves every window.  The running sum accumulates an exact
    integer (floor-cents of value) because engines disagree on the
    float association of incremental window sums; ordering carries an
    event_id tie-break so every function is deterministic."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrank = Window.partitionBy("user_id").orderBy(F.col("value").desc())
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).over(wcum).alias(
            "running_cents"
        ),
        F.row_number().over(w).alias("event_no"),
        F.dense_rank().over(wrank).alias("value_rank"),
    )


_Q21_SQL = """
SELECT event_id, user_id,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_cents,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS event_no,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value DESC)
           AS INTEGER) AS value_rank
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every grouping combination of (status, priority) in ONE
    pass — q14's ROLLUP generalized to the full lattice.  Spark plans a
    single Expand (4 replicas of each input row) feeding one hash
    aggregate, so the scan happens once however many grouping sets are
    requested; grouping_id disambiguates subtotal NULLs from data
    NULLs.  Money flows as integer cents (module docstring)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderstatus",
            "o_orderpriority",
            cents(F.col("o_totalprice")).alias("price_cents"),
        )
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("price_cents").alias("revenue_cents"),
        )
    )


_Q22_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q23_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed value out of the JSON
    ``props`` payload and aggregate on it — the schema-on-read shape
    every event pipeline needs.  ``get_json_object`` is a JVM-side
    expression (Jackson under codegen), so extraction rides the scan
    projection with no shuffle of the raw JSON; only (event_type, k)
    flows into the aggregate.  avg is computed as exact-integer
    sum/count so both engines divide the same two integers."""
    e = load_table(spark, "events", sf_dir)
    # try_cast: a non-numeric "k" would abort under ANSI; NULL instead
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            (F.sum("k") / F.count("k")).alias("avg_k"),
        )
    )


_Q23_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(k) AS BIGINT) / COUNT(k) AS avg_k
FROM (SELECT event_type, TRY_CAST(props->>'$.k' AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


def q24_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): the distinct
    event types each user has fired, joined into one deterministic
    CSV.  Spark composes it as collect_set → array_sort → array_join —
    partial-aggregable (sets merge map-side), and the explicit sort
    makes the result order-insensitive, which STRING_AGG alone does not
    guarantee.  State per group is bounded by the distinct-value count,
    not the row count."""
    e = load_table(spark, "events", sf_dir)
    return e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.count_distinct(F.col("event_type")).alias("n_types"),
        F.count("*").alias("n_events"),
    )


_Q24_SQL = """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
       COUNT(DISTINCT event_type) AS n_types,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def q25_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build: collapse each user's
    event stream into attribute *runs* (rows only where event_type
    changed), then derive [valid_from, valid_to) intervals and the
    is_current flag with LEAD.  Both window passes share one shuffle on
    user_id (same partitioning, Spark reuses the exchange).  This is
    the standard warehouse history-table shape the reference's
    dim tables would need under updates (create_dim_*.sql are
    truncate-reload; SCD2 is the incremental form).

    NULL contract (r9 null probe): events with NULL event_type are
    EXCLUDED — a NULL attribute observation carries no dimension
    signal (the dedup family's no-content-no-fingerprint rule).  The
    alternative (letting them through the lag collapse) silently SPLITS
    a run without starting one — the dropped NULL row still changes
    prev_type — which breaks the streaming merge's invariant that
    version rows are a sufficient statistic of history
    (tests/test_streaming_scd2.py::test_streaming_scd2_null_event_type).
    NULL ts events sort first (Spark ASC default), which the oracle
    must state explicitly — DuckDB defaults to NULLS LAST."""
    e = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .where(F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return runs.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


_Q25_SQL = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts NULLS FIRST, event_id)
               AS prev_type
    FROM events WHERE event_type IS NOT NULL),
runs AS (
    SELECT user_id, event_type, ts, event_id FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id,
       event_type AS attr_value,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       LEAD(ts) OVER w IS NULL AS is_current
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
"""


def q26_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev, correlation) computed the
    cross-engine-exact way: accumulate integer moments (n, Σv, Σv²,
    Σk, Σk², Σvk — all exact BIGINTs, order-independent), then derive
    the floating-point statistics from those identical integers with
    an identical expression tree.  Native stddev_samp/corr are
    float-accumulating and order-dependent, so their last bits differ
    run-to-run under Spark's nondeterministic partial-agg order — the
    moment form is how you get a *deterministic* answer at any scale.
    value flows as cents; k comes out of the JSON props."""
    e = load_table(spark, "events", sf_dir)
    v = cents(F.col("value"))
    # try_cast: a non-numeric "k" would abort under ANSI; NULL instead
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    base = e.select("event_type", v.alias("v"), k.alias("k"))
    agg = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum(F.col("v") * F.col("k")).alias("svk"),
    )
    n, sv, svv = F.col("n"), F.col("sv"), F.col("svv")
    sk, skk, svk = F.col("sk"), F.col("skk"), F.col("svk")
    var_v = (n * svv - sv * sv) / (n * (n - F.lit(1)))
    dv = F.sqrt((n * svv - sv * sv).cast("double"))
    dk = F.sqrt((n * skk - sk * sk).cast("double"))
    return agg.select(
        "event_type",
        "n",
        "sv",
        "sk",
        F.sqrt(var_v).alias("stddev_cents"),
        ((n * svk - sv * sk).cast("double") / (dv * dk)).alias("corr_vk"),
    )


_Q26_SQL = """
WITH base AS (
    SELECT event_type,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
           TRY_CAST(props->>'$.k' AS BIGINT) AS k
    FROM events),
agg AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sv,
           CAST(SUM(v * v) AS BIGINT) AS svv,
           CAST(SUM(k) AS BIGINT) AS sk,
           CAST(SUM(k * k) AS BIGINT) AS skk,
           CAST(SUM(v * k) AS BIGINT) AS svk
    FROM base GROUP BY event_type)
SELECT event_type, n, sv, sk,
       sqrt((n * svv - sv * sv) / (n * (n - 1))) AS stddev_cents,
       CAST(n * svk - sv * sk AS DOUBLE)
           / (sqrt(CAST(n * svv - sv * sv AS DOUBLE))
              * sqrt(CAST(n * skk - sk * sk AS DOUBLE))) AS corr_vk
FROM agg
"""


def q27_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analysis: how many users progressed
    view → click → purchase *in time order*.  One aggregation computes
    each user's first timestamp per stage (conditional MIN — no
    self-joins, no window), a projection tests stage-ordering, and a
    single-row final agg counts survivors.  The classic N-way
    self-join funnel shuffles the events table N times; this shape
    shuffles it once regardless of funnel depth."""
    e = load_table(spark, "events", sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    tv, tc, tp = F.col("t_view"), F.col("t_click"), F.col("t_purchase")
    s1 = tv.isNotNull()
    s2 = s1 & tc.isNotNull() & (tc > tv)
    s3 = s2 & tp.isNotNull() & (tp > tc)
    return per_user.select(
        s1.cast("long").alias("s1"),
        s2.cast("long").alias("s2"),
        s3.cast("long").alias("s3"),
    ).agg(
        F.count("*").alias("n_users"),
        F.sum("s1").alias("n_view"),
        F.sum("s2").alias("n_view_click"),
        F.sum("s3").alias("n_full_funnel"),
    )


_Q27_SQL = """
WITH per_user AS (
    SELECT user_id,
           MIN(ts) FILTER (event_type = 'view') AS t_view,
           MIN(ts) FILTER (event_type = 'click') AS t_click,
           MIN(ts) FILTER (event_type = 'purchase') AS t_purchase
    FROM events GROUP BY user_id),
stages AS (
    SELECT CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
           CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                     AND t_click > t_view THEN 1 ELSE 0 END AS s2,
           CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                     AND t_click > t_view AND t_purchase IS NOT NULL
                     AND t_purchase > t_click THEN 1 ELSE 0 END AS s3
    FROM per_user)
SELECT COUNT(*) AS n_users,
       CAST(SUM(s1) AS BIGINT) AS n_view,
       CAST(SUM(s2) AS BIGINT) AS n_view_click,
       CAST(SUM(s3) AS BIGINT) AS n_full_funnel
FROM stages
"""


def q28_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries through the SQL-first interface:
    orders priced above their customer's average.  Catalyst
    *decorrelates* each subquery into an aggregate + equi-join — no
    per-row re-execution (observed plan: 2 joins, 3 scans; Spark does
    not merge the two sibling subqueries, so the hand-fused form — one
    groupBy computing (count, sum) and a single join — is the plan to
    write at 100 TB; this query exists to prove the SQL path gives the
    *correct* answer either way).  The comparison cross-multiplies
    exact integer cents (price*n > sum) instead of comparing against a
    float AVG, whose last bits depend on Spark's nondeterministic
    partial-agg order."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, tables=["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                  * (SELECT COUNT(*) FROM orders i
                     WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(ROUND(i.o_totalprice * 100, 0) AS BIGINT))
                 FROM orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


_Q28_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
          * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT CAST(SUM(CAST(ROUND(i.o_totalprice * 100, 0) AS BIGINT))
                     AS BIGINT)
         FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind q14's ROLLUP and
    q22's CUBE): status-only, priority-only, and grand-total groupings
    in ONE Expand + one hash aggregate — disjoint marginal reports from
    a single scan, the shape that otherwise takes N passes."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, tables=["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS revenue_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_Q29_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_computed_projection": q02_computed_projection,
    "q03_case_date_buckets": q03_case_date_buckets,
    "q04_like_filters": q04_like_filters,
    "q05_anti_join": q05_anti_join,
    "q06_latest_event_per_user": q06_latest_event_per_user,
    "q07_star_join_rollup": q07_star_join_rollup,
    "q08_top_orders": q08_top_orders,
    "q09_set_ops": q09_set_ops,
    "q10_union_all_counts": q10_union_all_counts,
    "q11_distinct_watermark": q11_distinct_watermark,
    "q12_scalar_suite": q12_scalar_suite,
    "q13_prefix_match": q13_prefix_match,
    "q14_rollup": q14_rollup,
    "q15_group_topk": q15_group_topk,
    "q16_pivot": q16_pivot,
    "q17_intersect_except": q17_intersect_except,
    "q18_unpivot": q18_unpivot,
    "q19_exact_median": q19_exact_median,
    "q20_semi_join": q20_semi_join,
    "q21_window_suite": q21_window_suite,
    "q22_cube": q22_cube,
    "q23_json_extract": q23_json_extract,
    "q24_string_agg": q24_string_agg,
    "q25_scd2": q25_scd2,
    "q26_stats_moments": q26_stats_moments,
    "q27_funnel": q27_funnel,
    "q28_correlated_subquery": q28_correlated_subquery,
    "q29_grouping_sets": q29_grouping_sets,
}

ORACLE: dict[str, str] = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_computed_projection": _Q02_SQL,
    "q03_case_date_buckets": _Q03_SQL,
    "q04_like_filters": _Q04_SQL,
    "q05_anti_join": _Q05_SQL,
    "q06_latest_event_per_user": _Q06_SQL,
    "q07_star_join_rollup": _Q07_SQL,
    "q08_top_orders": _Q08_SQL,
    "q09_set_ops": _Q09_SQL,
    "q10_union_all_counts": _Q10_SQL,
    "q11_distinct_watermark": _Q11_SQL,
    "q12_scalar_suite": _Q12_SQL,
    "q13_prefix_match": _Q13_SQL,
    "q14_rollup": _Q14_SQL,
    "q15_group_topk": _Q15_SQL,
    "q16_pivot": _Q16_SQL,
    "q17_intersect_except": _Q17_SQL,
    "q18_unpivot": _Q18_SQL,
    "q19_exact_median": _Q19_SQL,
    "q20_semi_join": _Q20_SQL,
    "q21_window_suite": _Q21_SQL,
    "q22_cube": _Q22_SQL,
    "q23_json_extract": _Q23_SQL,
    "q24_string_agg": _Q24_SQL,
    "q25_scd2": _Q25_SQL,
    "q26_stats_moments": _Q26_SQL,
    "q27_funnel": _Q27_SQL,
    "q28_correlated_subquery": _Q28_SQL,
    "q29_grouping_sets": _Q29_SQL,
}
