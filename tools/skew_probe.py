"""Adversarial-skew differential sweep (r9 verdict #7): one entity owns
HALF the table.  The existing skew suite (x15/x24) probes salted JOINS;
this fixture points the same cross-engine check at the streaming and
selection paths that partition by an entity key:

- ``events.user_id``: every 2nd row becomes user 7 — st13's bucket math
  must put 50% of all versions in one hash bucket and still satisfy
  stream ≡ batch ≡ oracle (the per-batch cost claim is O(batch +
  affected buckets), and the hot bucket IS an affected bucket in every
  batch); q25 and the event-window family re-collapse the same runs.
- ``documents.source``: every 2nd doc becomes source "web" — x46's
  two-phase salted quota must keep its phase-2 window constant-sized
  while the hot source dominates phase 1, and x52's per-source
  percent_rank ranks a partition holding half the corpus.
- ``documents.text``: the same 8-token boilerplate header is prepended
  to every 2nd doc — ONE w-token window key now owns half the corpus,
  the hottest partition the x40/x68 gram-key windows can see (real
  crawls look exactly like this: site chrome repeated across pages).

Derived copy of the sf0.001 fixtures; every listed query runs through
``tools/local_sweep``'s comparator against its oracle over the SAME
files.  Committed per round as ``SWEEP_r{N}_skew.txt``.

Usage:
    python tools/skew_probe.py        # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_skew"

QUERIES = [
    # the streaming/selection paths the r9 brief named
    "st13_streaming_scd2",
    "q25_scd2",
    "x46_source_quota",
    "x52_source_calibration",
    # event windows / sessions over the hot user
    "q06_latest_event_per_user",
    "x09_time_windows",
    "x11_sessionize",
    "x56_native_session_window",
    # continuity with the join-skew family
    "x15_skew_suite",
    # source-keyed aggregates over the hot source
    "x50_source_similarity",
    "x55_kmv_source_overlap",
    # gram-key windows over the hot boilerplate passage
    "x40_passage_dedup",
    "x68_duplicate_spans",
    "x69_span_cut_text",
]

# exactly PASSAGE_W (8) tokens: one full window key shared by half the
# corpus, plus w-1 straddling windows into each doc's real text
BOILERPLATE = "subscribe to our newsletter for the latest updates"


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    d = ev.to_pydict()
    n = len(d["event_id"])
    for i in range(0, n, 2):
        d["user_id"][i] = 7  # one user = 50% of events
    pq.write_table(
        pa.table(d, schema=ev.schema), os.path.join(DST, "events.parquet")
    )
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    d = docs.to_pydict()
    n = len(d["doc_id"])
    for i in range(0, n, 2):
        d["source"][i] = "web"  # one source = 50% of documents
        if d["text"][i] is not None:
            d["text"][i] = BOILERPLATE + " " + d["text"][i]
    pq.write_table(
        pa.table(d, schema=docs.schema), os.path.join(DST, "documents.parquet")
    )
    return DST


def main() -> int:
    build_fixture()
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + QUERIES
    )


if __name__ == "__main__":
    raise SystemExit(main())
