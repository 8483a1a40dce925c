"""NULL-injected differential sweep: oracle parity when nullable columns
actually hold NULLs.

The driver fixtures carry no NULLs, so Spark↔DuckDB NULL-semantics
divergences stay invisible until real data hits them.  This tool derives
a NULL-injected copy of the sf0.001 fixtures (every 7th document text,
every 11th lang, every 13th source; same pattern over events
props/value/event_type and embeddings label, plus one NULL embedding
vector) and runs the x-family queries through ``tools/local_sweep``'s
comparator against their oracles over the SAME files.

The NULL contract it pins (round-4; found 12 divergent operators):

- **dedup/signature family** (MinHash, SimHash, and the LSH/cluster
  layers above): NULL-text docs are EXCLUDED — no content, nothing to
  fingerprint.  Without the exclusion every NULL doc hashes to the same
  empty signature and LSH welds them into one giant bogus cluster.
- **text-analysis family** (stats, repetition filters, quality/budget
  selection): NULL text ≡ empty text (coalesce at the operator entry,
  both engines) — every doc keeps its metrics row.
- the quality-score oracle SQL needed explicit empty-text guards to
  match Spark's (punct_ratio / stop_ratio are 0.0 on empty docs; the
  previous NULLIF formulation nulled the whole score).

Usage:
    python tools/null_probe.py            # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_nulls"


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    d = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pydict()
    n = len(d["doc_id"])
    for i in range(0, n, 7):
        d["text"][i] = None
    for i in range(3, n, 11):
        d["lang"][i] = None
    for i in range(5, n, 13):
        d["source"][i] = None
    pq.write_table(pa.table(d), os.path.join(DST, "documents.parquet"))
    e = pq.read_table(os.path.join(SRC, "events.parquet")).to_pydict()
    m = len(e["event_id"])
    for i in range(0, m, 7):
        e["props"][i] = None
    for i in range(3, m, 11):
        e["value"][i] = None
    for i in range(5, m, 13):
        e["event_type"][i] = None
    # round-5: NULL event keys — x53's item derivation must exclude
    # them (CONTRACTS.md), and the window/join family must agree with
    # the oracle on NULL-key grouping
    for i in range(7, m, 17):
        e["user_id"][i] = None
    # round-5: NULL event TIMES — found 4 divergent operators on first
    # run (Spark F.window drops them vs SQL NULL bucket; Spark windows
    # sort NULLS FIRST vs DuckDB NULLS LAST in sessionize/as-of; DuckDB
    # ASOF matches a NULL probe time to the LATEST state).  Contract:
    # no event time → no window membership / NULL as-of payload.
    for i in range(11, m, 19):
        e["ts"][i] = None
    pq.write_table(pa.table(e), os.path.join(DST, "events.parquet"))
    v = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pydict()
    k = len(v["vec_id"])
    for i in range(0, k, 9):
        v["label"][i] = None
    v["embedding"][k // 2] = None
    pq.write_table(pa.table(v), os.path.join(DST, "embeddings.parquet"))
    return DST


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    build_fixture()
    # x-family plus the standalone streaming SCD2 entry (r8 verdict
    # next-round #1: its NULL-user carry-over must merge null-safely —
    # the eqNullSafe affected-user match is exactly what this stresses;
    # the other st queries ride the x09/x05 suites already in the list)
    names = sorted(n for n in suites.FULL_QUERIES if n.startswith("x")) + [
        "st13_streaming_scd2"
    ]
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + names
    )


if __name__ == "__main__":
    raise SystemExit(main())
