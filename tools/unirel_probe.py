"""Unicode-adversarial differential sweep for the RELATIONAL/event
string columns (tools/unicode_probe.py covers documents.text): hostile
strings — Turkish İ, Greek final-sigma context, RTL Arabic, emoji,
fullwidth forms, ligatures — striped through orders.o_orderpriority,
events.event_type, and events.props, then the q-family plus the
event-keyed extension suites run against their oracles over the SAME
files.

What its first run found (CONTRACTS.md / x21): the hostile striping
creates ~30-row groups, and x21's bounded-error sketch contract was
ASYMPTOTIC — Spark's HLL missed the 3·rsd band on a 32-distinct group
and percentile_approx's discrete data point sat >2% from the exact
interpolated percentile on tiny groups.  Fixed by regime-aware bounds
(absolute +4 HLL slack; the quantile band applies above SKETCH_MIN_N
rows).  String handling itself — grouping, LIKE, upper/replace,
concat_ws, JSON extraction, pivots — agreed byte-for-byte.

Usage:
    python tools/unirel_probe.py        # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_unirel"

HOSTILE = [
    "1-İSTANBUL",          # Turkish dotted capital I (SpecialCasing)
    "2-ΣΟΦΙΑ ΣΑΛΑΣ",       # word-final sigma context
    "3-مرحبا",             # RTL
    "4-🚀🔥",              # astral-plane emoji
    "5-ｆｕｌｌｗｉｄｔｈ",  # fullwidth forms
    "ﬁligree-ﬂow",         # ligatures
]

EXTRA = [
    "x09_time_windows",
    "x15_skew_suite",
    "x16_temporal_joins",
    "x21_sketch_suite",
    "x53_cms_heavy_hitters",
    "x57_mergeable_rollup",
    # r9 verdict #4: the streaming SCD2 build reads event_type as its
    # tracked attribute — hostile-unicode attribute values must
    # round-trip the version table and its stream≡batch≡oracle chain
    # (relnull_probe is NOT applicable: it stripes lineitem/orders
    # only, which st13 never reads — events NULLs are null_probe's)
    "st13_streaming_scd2",
]


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation customer supplier part lineitem documents embeddings"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    od = pq.read_table(os.path.join(SRC, "orders.parquet"))
    d = od.to_pydict()
    m = len(d["o_orderkey"])
    for i in range(0, m, 7):
        d["o_orderpriority"][i] = HOSTILE[i % len(HOSTILE)]
    pq.write_table(
        pa.table(d, schema=od.schema), os.path.join(DST, "orders.parquet")
    )
    e = pq.read_table(os.path.join(SRC, "events.parquet"))
    d = e.to_pydict()
    m = len(d["event_id"])
    for i in range(0, m, 9):
        d["event_type"][i] = HOSTILE[i % len(HOSTILE)]
    for i in range(2, m, 11):
        d["props"][i] = '{"k": 5, "tag": "日本語🀄"}'
    pq.write_table(
        pa.table(d, schema=e.schema), os.path.join(DST, "events.parquet")
    )
    return DST


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    build_fixture()
    names = sorted(
        n for n in suites.FULL_QUERIES if n.startswith("q")
    ) + EXTRA
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + names
    )


if __name__ == "__main__":
    raise SystemExit(main())
