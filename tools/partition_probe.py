"""Partition-invariance probe for the deterministic operator family.

The md5-gated samplers/splitters (x18/x25/x34/x36/x37/x47), the stable
row-id enumerator (x28), the concat-and-chunk packer (x26), and the
token-budget selector (x33) all claim cross-engine *and* cross-layout
reproducibility: their output must be a pure function of the data, never
of how the scan happened to split it into tasks.  That claim is exactly
what task retries, speculative execution, and a different cluster's
`maxPartitionBytes` exercise at 100 TB — and no oracle sweep covers it,
because the DuckDB comparison always reads one fixed file layout.

This probe pins the claim: the sf0.01 tables are materialized at three
physically different layouts (1, 7, and 64 parquet files — a shuffle per
rewrite, so row->file assignment and intra-file order genuinely differ),
each target query runs once per layout, and the sorted canonical row
sets must be identical across all three.  Any operator whose result
leaks partition identity (a `monotonically_increasing_id`, an
`input_file_name`, a non-deterministic `rand()`/`first()` without
ordering) fails loudly here.

Usage:
    python tools/partition_probe.py [sf_dir] [query ...]
    # default sf_dir=/root/testdata/sf0.01, default = the deterministic set

The full-run output is committed per round as SWEEP_r{N}_partitions.txt.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# The operators whose contract is layout-invariance.  (Everything else in
# the registry is *value*-deterministic too, but these are the ones whose
# docstrings promise it as a feature a training pipeline depends on.)
DETERMINISTIC_QUERIES = [
    "x18_hash_split",
    "x25_stratified_sample",
    "x26_pack_sequences",
    "x28_stable_row_ids",
    "x33_token_budget_select",
    "x34_epoch_shuffle",
    "x36_mixture_sample",
    "x37_leakage_safe_split",
    "x47_weighted_sample",
    "x58_bm25_topk",
    "x59_pq_encode",
]

LAYOUTS = (1, 7, 64)
WORK = "/tmp/spark_graft_partprobe"


def build_layouts(spark, sf_dir: str) -> dict[int, str]:
    """Write every table at each file-count layout (idempotent per run)."""
    dirs = {}
    for n in LAYOUTS:
        out = os.path.join(WORK, f"p{n}")
        dirs[n] = out
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.makedirs(out)
        for t in TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(src):
                continue
            dst = os.path.join(out, f"{t}.parquet")
            # round-robin shuffle: rows land in different files AND in a
            # different order within each file at every layout
            spark.read.parquet(src).repartition(n).write.parquet(dst)
    return dirs


def main() -> int:
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import get_spark
    from oracle_compare import _canon

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wanted = sys.argv[2:] or DETERMINISTIC_QUERIES

    spark = get_spark()
    print(f"# partition-invariance probe  sf_dir={sf_dir}  layouts={LAYOUTS}")
    dirs = build_layouts(spark, sf_dir)

    failures = 0
    for name in wanted:
        fn = suites.FULL_QUERIES[name]
        t0 = time.time()
        try:
            results = {}
            for n, d in dirs.items():
                df = fn(spark, d)
                cols = list(df.columns)
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                results[n] = (
                    sorted(cols),
                    sorted(
                        tuple(_canon(r[i]) for i in order) for r in df.collect()
                    ),
                )
            base_cols, base_rows = results[LAYOUTS[0]]
            ok = all(
                results[n] == (base_cols, base_rows) for n in LAYOUTS[1:]
            )
            status = "PASS" if ok else "FAIL"
            detail = f" rows={len(base_rows)}"
            if not ok:
                failures += 1
                for n in LAYOUTS[1:]:
                    c, r = results[n]
                    if c != base_cols:
                        detail += f" p{n}: cols differ"
                    elif len(r) != len(base_rows):
                        detail += f" p{n}: {len(r)} rows vs {len(base_rows)}"
                    else:
                        for i, (a, b) in enumerate(zip(base_rows, r)):
                            if a != b:
                                detail += (
                                    f"\n  p{n} first diff row {i}:"
                                    f"\n   p1 ={a}\n   p{n}={b}"
                                )
                                break
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures += 1
            status, detail = "ERROR", f" {type(exc).__name__}: {exc}"
        print(f"{status} {name} ({time.time() - t0:.2f}s){detail}")

    total = len(wanted)
    print(f"# {total - failures}/{total} layout-invariant")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
