"""PySpark-native analytics engine with the query & data-processing
capabilities of RhythmBear/End-to-End-Chess.com-ETL-and-Analytics-Pipeline.

The reference (read-only at /root/reference) is an Airflow + embedded-DuckDB
medallion ETL over Chess.com API data.  This package re-expresses every
operator the reference exercises (SURVEY.md §2) as idiomatic Spark
DataFrame / Spark SQL plans — declarative, Catalyst-optimised, designed for
a 1000-executor / 100 TB deployment even though tests run on local[32]:

- ``session``    SparkSession factory (AQE, Arrow, UTC, broadcast tuning)
- ``schemas``    explicit StructTypes per layer (schema-on-write everywhere)
- ``sources``    parquet/json/csv/jdbc readers + the Chess.com API source
- ``functions``  native-expression replacements for every reference UDF
- ``operators``  merge (latest-wins upsert, insert-if-absent), prefix-match
                 join, dedup (exact/minhash/simhash/jaccard), similarity
                 search, windowed aggregation
- ``plans``      bronze→silver→gold medallion builders + analytics views +
                 the driver query/oracle contract
- ``streaming``  Structured Streaming incremental variant
- ``multimodal`` binary media column plumbing (decode stubbed, plumbing real)
"""

__version__ = "0.1.0"
