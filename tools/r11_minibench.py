"""Best-of-3 noop timings for a named subset of headline queries —
the re-measure loop of the r11 optimization round (same protocol as
bench.py: warm-up, GC barrier, build call timed, noop sink).

Usage: python tools/r11_minibench.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
        suites,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="r11-minibench")
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
        "noop"
    ).mode("overwrite").save()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = suites.FULL_QUERIES[name]
        best = None
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:36s} {best:7.3f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
