from .pipeline import (  # noqa: F401
    run_incremental_gold,
    run_stream_to_memory,
    stream_bronze_to_silver,
    streaming_tumbling_counts,
)
