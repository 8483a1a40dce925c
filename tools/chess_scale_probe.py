"""Chess-path scaling probe: the two §2 shapes SCALE.md's x-family
decades do not cover — the regex-heavy bronze→silver projection (c01:
12 PGN tag extractions + strptime casts + move-array transforms per
row) and the gold star build / longest-prefix classification (c02/c04:
5-way broadcast validation join, latest-wins merge, prefix-explode +
max_by join) — timed at 1×/10×/100× the 45-game demo month.

The scaled months come from the same generator as the fixture
(``sources.demo.make_game`` — every game unique: distinct URLs, uuids,
per-index PGNs), so this is a bigger month of the SAME distribution,
not replicas.  Staging is probe-local (/tmp/spark_graft_chess_scale),
never the shared STAGE_DIR, so it cannot clobber a concurrent driver
contract run.

Expected shapes (asserted by reading the ratios, recorded in SCALE.md):
c01 is scan-local (regex + array transforms inside one codegen'd
projection — parallelism = input splits, zero shuffle); c02 is one
window shuffle (latest-wins) + broadcast joins; c04 is a broadcast
prefix-explode whose cost is rows × book-depth.

Usage::

    python tools/chess_scale_probe.py [N ...]   # default: 10 100
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_GAMES = 45  # the fixture month (FIXTURES.md §A)
WORK = "/tmp/spark_graft_chess_scale"


def stage(spark, n_games: int) -> dict[str, str]:
    """Write the month JSON, silver parquet, and fact parquet for one
    volume (idempotent), so each timed stage starts from materialized
    input — matching how the driver's c02/c04 read staged bytes."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.gold import build_gold
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.pipelines import (
        chess_silver_plan,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.schemas import (
        OPENINGS_CSV_SCHEMA,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo

    d = os.path.join(WORK, f"g{n_games}")
    paths = {
        "json": os.path.join(d, "games.json"),
        "silver": os.path.join(d, "silver"),
        "fact": os.path.join(d, "fact"),
    }
    # multiLine JSON is not splittable: one month FILE = one task.  At
    # backfill scale parallelism comes from the month-file count (the
    # API ships one archive per user-month), so big volumes are ALSO
    # staged as a many-file glob — the realistic layout — and c01 is
    # timed against both.
    if n_games > 1000:
        paths["json_many"] = os.path.join(d, "months")
    marker = os.path.join(d, "_staged")
    if os.path.exists(marker) and all(
        os.path.exists(p) for p in paths.values()
    ):
        return paths
    os.makedirs(d, exist_ok=True)
    demo.write_month_json(paths["json"], month=1, n=n_games)
    if "json_many" in paths:
        os.makedirs(paths["json_many"], exist_ok=True)
        chunk = 900
        for c in range(0, n_games, chunk):
            games = [
                demo.make_game(i, 1) for i in range(c, min(c + chunk, n_games))
            ]
            with open(
                os.path.join(paths["json_many"], f"part-{c:07d}.json"), "w"
            ) as fh:
                json.dump(games, fh)
    chess_silver_plan(spark, paths["json"]).write.mode("overwrite").parquet(
        paths["silver"]
    )
    lookup = spark.createDataFrame(demo.OPENINGS_LOOKUP, OPENINGS_CSV_SCHEMA)
    silver = spark.read.parquet(paths["silver"])
    build_gold(
        spark, silver, demo.USERNAME, "2024-02-01 00:00:00",
        openings_lookup=lookup,
    )["fact_games"].write.mode("overwrite").parquet(paths["fact"])
    with open(marker, "w") as fh:
        fh.write("ok")
    return paths


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.analytics import (
        classify_openings,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.gold import build_gold
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.pipelines import (
        chess_silver_plan,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.schemas import (
        OPENINGS_CSV_SCHEMA,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import get_spark
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo

    scales = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark(app_name="chess-scale-probe")
    lookup = spark.createDataFrame(demo.OPENINGS_LOOKUP, OPENINGS_CSV_SCHEMA)

    def probes(paths):
        silver = lambda: chess_silver_plan(spark, paths["json"])  # noqa: E731
        gold = lambda: build_gold(  # noqa: E731
            spark,
            spark.read.parquet(paths["silver"]),
            demo.USERNAME,
            "2024-02-01 00:00:00",
            openings_lookup=lookup,
        )["fact_games"]
        classify = lambda: classify_openings(  # noqa: E731
            spark.read.parquet(paths["fact"]), lookup
        )
        out = {
            "c01_silver_regex_scan": silver,
            "c02_gold_star_build": gold,
            "c04_prefix_classify": classify,
        }
        if "json_many" in paths:
            out["c01_silver_many_months"] = lambda: chess_silver_plan(
                spark, os.path.join(paths["json_many"], "*.json")
            )
        return out

    # warm engine paths once (same rationale as bench.py)
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    volumes = [1] + scales
    staged = {n: stage(spark, BASE_GAMES * n) for n in volumes}
    results: dict[str, dict] = {}
    for n in volumes:
        for name, thunk in probes(staged[n]).items():
            best = None
            for _ in range(3):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                thunk().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows = thunk().count()
            results.setdefault(name, {})[f"x{n}"] = {
                "sec": round(best, 3),
                "rows": rows,
            }
            print(
                f"{name:24s} x{n:<4d} {best:7.3f}s rows={rows}", flush=True
            )
    for name, row in results.items():
        # many-months variant only exists at big volumes; its base is
        # the single-file scan's x1 (same plan, same 45-game month)
        base = (row.get("x1") or results["c01_silver_regex_scan"]["x1"])["sec"]
        for n in scales:
            if f"x{n}" in row:
                row[f"ratio_x{n}"] = round(row[f"x{n}"]["sec"] / max(base, 1e-9), 2)
    print(json.dumps({"base_games": BASE_GAMES, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
