"""Non-finite-numerics differential sweep: oracle parity when embeddings
contain NaN/Inf components or zero vectors, and event values are
NaN/±Inf.

What it found (round 4):
- the cosine family (x06/x07/x12/x14) crashed with ANSI DIVIDE_BY_ZERO
  on a zero-norm vector;
- k-means collected a NaN centroid and emitted it as the literal token
  ``nanD`` — unparseable SQL, analysis error;
- int8 quantization's oracle crashed casting NaN to BIGINT (and under
  ANSI, ONE NaN embedding in 100 TB kills the whole Spark job at the
  same cast);
- the range-join's value-micros cast crashed on NaN event values.

The contract now pinned on both engines
(``functions.vectors.usable_vec`` / ``usable_vec_sql``):
- cosine-family operators consume only finite, nonzero vectors;
- k-means/quantization consume only finite vectors (zero is fine);
- non-finite event values contribute NULL to integer-micros sums
  (skipped by SUM, both engines).

Usage:
    python tools/nonfinite_probe.py       # prints one status line/query
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf_nan"


def build_fixture() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem documents".split():
        shutil.copy(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(DST, f"{t}.parquet")
        )
    v = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pydict()
    v["embedding"][3] = [float("nan")] + list(v["embedding"][3][1:])
    v["embedding"][17] = [float("inf")] + list(v["embedding"][17][1:])
    v["embedding"][29] = [0.0] * len(v["embedding"][29])
    # round-5: finite-but-huge components — pass the non-finite gate,
    # then overflow dot products to Inf/NaN downstream; both engines
    # share IEEE754 semantics, so results stay bit-identical (probed
    # green across the whole cosine/kmeans/quantize family, no guard
    # needed — unlike the event-value micros casts, nothing here casts
    # to an integer type)
    v["embedding"][7] = [1e300] + list(v["embedding"][7][1:])
    v["embedding"][13] = [-1e300] * len(v["embedding"][13])
    pq.write_table(pa.table(v), os.path.join(DST, "embeddings.parquet"))
    e = pq.read_table(os.path.join(SRC, "events.parquet")).to_pydict()
    e["value"][5] = float("nan")
    e["value"][11] = float("inf")
    e["value"][23] = float("-inf")
    # round-5: finite-but-huge — overflows the integer-micros BIGINT
    # cast; under ANSI a plain cast ABORTS the job (CAST_OVERFLOW), so
    # the micros sites use try_cast → NULL, mirrored by the oracles'
    # TRY_CAST (one corrupted row must not kill a 100 TB aggregation)
    e["value"][31] = 1e300
    e["value"][37] = -1e300
    pq.write_table(pa.table(e), os.path.join(DST, "events.parquet"))
    return DST


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    build_fixture()
    names = sorted(n for n in suites.FULL_QUERIES if n.startswith("x"))
    return subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "local_sweep.py"), DST]
        + names
    )


if __name__ == "__main__":
    raise SystemExit(main())
