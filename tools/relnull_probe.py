"""NULL-injected differential sweep for the RELATIONAL family: oracle
parity when the TPC-H-ish fact columns hold NULLs (the x-family's
dirty-data probe is tools/null_probe.py; this covers the q-queries,
whose fixtures otherwise never exercise NULL semantics in aggregates,
windows, sets, and joins).

Derivation: a copy of the sf0.001 fixtures with NULLs striped through
lineitem (quantity, extendedprice, returnflag, shipdate) and orders
(orderpriority, totalprice, orderdate); every q-family query then runs
through ``tools/local_sweep``'s comparator against its oracle over the
SAME files.

The contract it pinned on first run (CONTRACTS.md "Multi-column
DISTINCT over NULLs"): Spark's ``countDistinct(a, b)`` follows the SQL
standard and skips a tuple when ANY member is NULL, while DuckDB's row
constructor ``COUNT(DISTINCT (a, b))`` counts ``(NULL, x)`` as a
distinct non-NULL struct — q11's oracle carries an explicit FILTER.
Everything else (SUM/AVG NULL-skip, GROUP BY NULL buckets, CASE over
NULL, set ops, SCD2 run-collapse, window frames) agreed as written.

Usage:
    python tools/relnull_probe.py        # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_relnulls"


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation customer supplier part events documents embeddings"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    d = li.to_pydict()
    m = len(d["l_orderkey"])
    for i in range(0, m, 13):
        d["l_quantity"][i] = None
    for i in range(3, m, 17):
        d["l_extendedprice"][i] = None
    for i in range(5, m, 19):
        d["l_returnflag"][i] = None
    for i in range(7, m, 23):
        d["l_shipdate"][i] = None
    pq.write_table(
        pa.table(d, schema=li.schema), os.path.join(DST, "lineitem.parquet")
    )
    od = pq.read_table(os.path.join(SRC, "orders.parquet"))
    d = od.to_pydict()
    m = len(d["o_orderkey"])
    for i in range(0, m, 11):
        d["o_orderpriority"][i] = None
    for i in range(3, m, 13):
        d["o_totalprice"][i] = None
    for i in range(5, m, 17):
        d["o_orderdate"][i] = None
    pq.write_table(
        pa.table(d, schema=od.schema), os.path.join(DST, "orders.parquet")
    )
    return DST


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    build_fixture()
    names = sorted(n for n in suites.FULL_QUERIES if n.startswith("q"))
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + names
    )


if __name__ == "__main__":
    raise SystemExit(main())
