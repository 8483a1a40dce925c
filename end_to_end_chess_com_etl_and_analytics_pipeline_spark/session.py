"""SparkSession factory.

One place for every engine-level knob so tests, bench, the driver entry
point, and production all run the same configuration.  The reference runs
embedded DuckDB per Airflow task (python_scripts.py:106) — single node,
in-memory, no spill story.  Here the equivalent decisions are Spark confs:
AQE for runtime re-planning (skew joins, partition coalescing), Arrow for
any pandas interop, UTC session timezone so timestamp semantics match the
DuckDB oracle bit-for-bit, and shuffle partitions sized to the local core
count (re-size to ~2-3× total cores on a real cluster).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# serializes local_df's arrow-conf flip (sessions created without the
# conf) and cached_column's check-then-build — both are called from
# the artifact-write thread pools
_ARROW_FLIP_LOCK = threading.Lock()
_EXPR_CACHE_LOCK = threading.Lock()


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows → DataFrame through the Arrow path.

    ``spark.createDataFrame(list, schema)`` keeps the data as PICKLED
    PYTHON OBJECTS: every later action on the plan (a broadcast, a tiny
    parquet write, a noop) spins up a Python worker to deserialize the
    rows — measured at 1–6 s of fixed cost PER ACTION on this harness
    (thread dump: the write task blocked in
    ``BasePythonRunner$ReaderInputStream.read``).  Converting via a
    pandas DataFrame with Arrow enabled moves the data into the JVM
    ONCE at creation; the same 64-row codebook-map write drops from
    6.2 s to 0.15 s (guide §4: eliminate the JVM↔Python boundary; §6:
    Arrow for driver transfers).

    Values are bit-identical either way — Python floats round-trip
    through an object-dtype pandas column into Arrow float64 exactly,
    and the declared ``schema`` types the result on both paths.  Rows
    may be tuples or pyspark Rows (anything positionally indexable).
    """
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        st = schema
    else:
        from pyspark.sql.types import _parse_datatype_string

        st = _parse_datatype_string(schema)
    rows = list(rows)
    if not rows:
        # empty local relations never reach a hot path; keep the plain
        # builder (the pandas path would need dtype scaffolding for 0
        # rows for no benefit)
        return spark.createDataFrame([], st)
    import pandas as pd

    names = st.fieldNames()
    pdf = pd.DataFrame(
        {
            n: pd.Series([r[i] for r in rows], dtype="object")
            for i, n in enumerate(names)
        },
        columns=names,
    )
    arrow_conf = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(arrow_conf)
    if prev == "true":
        return spark.createDataFrame(pdf, schema=st)
    # without Arrow the pandas path degrades to the same pickled-row
    # plan; the conf is runtime-settable and is the documented
    # recommended setting (guide §9) — enable it for THIS creation
    # only and restore the caller's value after (r11 verdict #3: a
    # library function must not flip session state as a side effect;
    # values are identical either way, pinned by the vanilla contract
    # drive, which runs with Arrow off).  The lock serializes the
    # flip-create-restore against concurrent local_df calls (the
    # artifact-write thread pools): the conf is session-global, and a
    # concurrent restore mid-creation would silently demote a sibling
    # to the pickled-row plan.
    with _ARROW_FLIP_LOCK:
        spark.conf.set(arrow_conf, "true")
        try:
            return spark.createDataFrame(pdf, schema=st)
        finally:
            if prev is None:
                spark.conf.unset(arrow_conf)
            else:
                spark.conf.set(arrow_conf, prev)


_EXPR_CACHE = None  # weakref.WeakKeyDictionary[SparkSession, dict]
_EXPR_CACHE_MAX = 64  # per-session entries; see cached_column docstring


def cached_column(spark: SparkSession, key: tuple, builder):
    """Memoize a PURE Column-expression tree per SparkSession.

    Constructing a deep expression tree costs one py4j round trip per
    node (~1-3 ms each; the 16-seed MinHash tree measured 0.3-0.4 s to
    BUILD per call) and the constructors are pure functions of their
    key — same key, same tree.  Column objects are immutable and
    plan-independent (they reference columns by NAME), so one tree can
    be embedded in any number of plans; the pq encoder factories
    (r11 Finding 9) already rely on exactly this reuse across
    micro-batch plans.  This caches expression STRUCTURE only — never
    data, never results: every action still computes from its inputs.

    Keyed weakly by the SparkSession so a stopped/replaced session
    (whose JVM object handles would be stale) simply misses and
    rebuilds.  ``builder`` takes no arguments and may return a Column
    or a tuple of Columns.

    Bounded and thread-safe (r11 ADVICE): entries are value-keyed
    (PQ encoders key on full codebook values), so a session that
    retrains models forever would otherwise accumulate one large
    Python+py4j tree per distinct model; past ``_EXPR_CACHE_MAX``
    entries the oldest-inserted entry is evicted (insertion-order FIFO
    — the working set per session is a handful of frozen-model trees,
    so recency bookkeeping would be ceremony).  The lock guards the
    lazy init and the check-then-build: builders are pure, but two
    racing builders would otherwise both pay the py4j construction and
    one inner dict could be lost.
    """
    global _EXPR_CACHE
    with _EXPR_CACHE_LOCK:
        if _EXPR_CACHE is None:
            import weakref

            _EXPR_CACHE = weakref.WeakKeyDictionary()
        per_session = _EXPR_CACHE.setdefault(spark, {})
        if key not in per_session:
            if len(per_session) >= _EXPR_CACHE_MAX:
                per_session.pop(next(iter(per_session)))
            per_session[key] = builder()
        return per_session[key]


def get_spark(
    app_name: str = "chess-analytics-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Designed for 100 TB scale: every setting here is either scale-neutral
    or a local stand-in for a cluster conf (driver.memory only matters in
    local mode; on a cluster the same code runs under spark-submit confs).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # match local parallelism; on a real cluster: 2-3x total cores
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # deterministic timestamp semantics (match DuckDB oracle / UTC lake)
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas_udf / toPandas interop (the only sanctioned
        # python<->jvm data path; never row-at-a-time)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # dims here are tiny (≤ a few thousand rows); raise the auto
        # broadcast bar so every dim join is a broadcast hash join
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
