from .tables import (  # noqa: F401
    dim_results_seed,
    load_table,
    read_csv,
    read_jdbc,
    read_json,
    write_jdbc,
    write_parquet,
)
