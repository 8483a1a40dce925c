"""Empty-input robustness: every corpus operator must run (not crash)
when its fixture tables are schema-correct but hold ZERO rows.

At 100 TB this is not a corner case — per-source slices, date
partitions, or freshly-bootstrapped lakes are routinely empty, and an
operator that crashes on an empty scan takes the whole DAG down.  The
chess-medallion / staging / streaming queries are excluded: they ingest
through their own paths (bronze JSON, STAGE_DIR) with dedicated tests.

Found-by-probe regression: x22 k-means built its centroid literal from
``collect()`` of the (empty) corpus — an ``array()`` literal types as
ARRAY<VOID> and crashes the 'cv' field extraction at analysis
(operators/clustering.py::assign_nearest now guards the empty
codebook).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites
from tests.conftest import SF_DIR

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# corpus operators: everything x-prefixed (documents/embeddings/events)
_EMPTY_SAFE = sorted(
    n for n in suites.FULL_QUERIES if n.startswith("x")
)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in _TABLES:
        schema = pq.read_schema(os.path.join(SF_DIR, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


# fixed-shape outputs: rows exist per SCHEMA element, not per data row
_FIXED_SHAPE_MAX = {
    "x23_profile": 4,  # one row per profiled column, even over 0 rows
    # the table-ops suite inherits x23's fixed per-column profile rows
    "x23_table_ops_suite": 4,
    # the hygiene funnel reports one row per STAGE (rows_in=rows_out=0)
    # even over an empty corpus — an empty funnel table would hide
    # which gates ran; the suite inherits the funnel's 3 fixed rows
    "x43_corpus_funnel": 3,
    # funnel's 3 stage rows + x49's one global-fit row (n_top_tokens=0)
    "x08_text_quality_suite": 4,
}


@pytest.mark.parametrize("name", _EMPTY_SAFE)
def test_operator_survives_empty_tables(spark, empty_dir, name):
    df = suites.FULL_QUERIES[name](spark, empty_dir)
    n = df.count()
    # global-aggregate shapes legitimately emit one (zero/NULL) row and
    # per-column profiles one row per column; everything else must be
    # empty — no operator invents data
    assert n <= _FIXED_SHAPE_MAX.get(name, 1), (
        f"{name} produced {n} rows from empty inputs"
    )
