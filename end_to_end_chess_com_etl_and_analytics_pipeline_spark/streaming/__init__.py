from .pipeline import (  # noqa: F401
    read_gold_fact,
    run_incremental_gold,
    run_stream_to_memory,
    stream_bronze_to_silver,
    streaming_dedup,
    streaming_stateful_sessions,
    streaming_tumbling_counts,
)
