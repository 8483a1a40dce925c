"""A/B probe: x68/x69's window formulation vs the partial-agg/join
formulation of the duplicated-gram flag (both now live in
plans/quality.py as `_dup_flag_window` / `_dup_flag_aggjoin` behind
`duplicate_spans(..., formulation=...)` — the r10 ADVICE factored the
probe's 70-line copy into the shared helpers, so the two can no longer
drift).

Corpora:

- ``replica`` (default): the near-dup replica corpus from
  tools/scale_probe.py — the duplication-heavy extreme where every
  gram occurs ~N× and the occurrence-sized window exchange has no
  map-side reduction.  This is where SCALE.md measured the window
  formulation's superlinear last decade (244×/401× per 1000×).
- ``hotgram``: ONE gram carries ~50% of all occurrences while
  duplication is LOW elsewhere (r10 verdict #4's anti-overfit case:
  the partial agg saves little on the unique tail, and the hot gram is
  a single giant window partition / join key).
- ``unique``: all-unique corpus with only pairwise duplicated grams
  (each duplicated gram occurs exactly twice) — the WORST case for the
  aggjoin formulation (the agg collapses nothing; dup-key set is
  occurrence-scale) and the best for the window one.

The probe first asserts the two formulations agree row-for-row
(order-insensitive) for BOTH x68 and x69, then times each best-of-2.

Usage::

    python tools/x68_ab_probe.py [N] [out_dir] [corpus]
    # default N=100, corpus=replica
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_hotgram(spark, n: int, out_dir: str) -> None:
    """documents.parquet where ~50% of all gram occurrences are ONE
    boilerplate gram (every doc shares an identical w-token header) and
    the body is per-doc unique text with NO cross-doc duplication —
    the aggjoin formulation's partial agg collapses only the header
    key, and that key is a single hot join/window partition."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f"_built_hotgram_x{n}")
    if os.path.exists(marker):
        return
    n_docs = 5000 * max(1, n // 100)
    # header: 15 shared tokens → 8 grams of w=8 all shared; body: 16
    # unique tokens per doc → ~16 unique grams + 8 mixed ones.  Shared
    # occurrences ≈ unique ones → the hot key is ~50% of the exchange.
    header = " ".join(f"h{i}" for i in range(15))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(header + " "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}x"), F.col("id").cast("string"))
                    for j in range(16)
                ],
            ),
        ).alias("text"),
        F.lit("probe").alias("source"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("created_at"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    open(marker, "w").close()


def build_unique(spark, n: int, out_dir: str) -> None:
    """documents.parquet where every doc is unique text except ONE
    w-window shared with exactly one partner doc — duplicated grams
    each occur exactly twice, so the dup-key set is occurrence-scale
    (no broadcast, no agg collapse): the aggjoin worst case."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f"_built_unique_x{n}")
    if os.path.exists(marker):
        return
    n_docs = 5000 * max(1, n // 100)
    pair = (F.col("id") / 2).cast("long")  # docs 2k and 2k+1 share
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"v{j}x"), F.col("id").cast("string"))
                    for j in range(16)
                ],
            ),
            F.lit(" "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"s{j}x"), pair.cast("string"))
                    for j in range(8)
                ],
            ),
        ).alias("text"),
        F.lit("probe").alias("source"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("created_at"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    open(marker, "w").close()


def main() -> int:
    import json

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
        span_cut_text,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )
    import scale_probe

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/spark_graft_x68ab_{n}"
    )
    corpus = sys.argv[3] if len(sys.argv) > 3 else "replica"
    spark = get_spark(app_name=f"x68-ab-probe-{corpus}")
    if corpus == "replica":
        scale_probe.build_docs_scaled(spark, n, out_dir)
    elif corpus == "hotgram":
        build_hotgram(spark, n, out_dir)
    elif corpus == "unique":
        build_unique(spark, n, out_dir)
    else:
        raise SystemExit(f"unknown corpus {corpus!r}")
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))

    # equality first (order-insensitive): the two formulations must
    # agree — for the coverage stats AND the cut text.  Skippable via
    # SPARK_GRAFT_AB_SKIP_EQ=1 for the 1000× decade (4 extra full
    # computations + two exceptAll passes at 5M docs), where equality
    # is already pinned by the 100× run on the same corpus family.
    eq_ops = (
        ()
        if os.environ.get("SPARK_GRAFT_AB_SKIP_EQ") == "1"
        else (("x68", duplicate_spans), ("x69", span_cut_text))
    )
    for opname, fn in eq_ops:
        a = fn(docs, formulation="window")
        for alt in ("aggjoin", "saltagg"):
            b = fn(docs, formulation=alt)
            mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
            assert mismatch == 0, (
                f"{opname} {alt} disagrees on {mismatch}"
            )
        print(f"{opname} equality OK (aggjoin, saltagg)", flush=True)

    results: dict[str, object] = {"n": n, "corpus": corpus}
    for opname, fn in (("x68", duplicate_spans), ("x69", span_cut_text)):
        for form in ("window", "aggjoin", "saltagg"):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(docs, formulation=form).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            results[f"{opname}_{form}"] = round(best, 3)
            print(f"{opname} {form:8s} best-of-2 {best:8.3f}s", flush=True)
        for alt in ("aggjoin", "saltagg"):
            results[f"{opname}_speedup_{alt}"] = round(
                results[f"{opname}_window"] / results[f"{opname}_{alt}"], 2
            )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    raise SystemExit(main())
