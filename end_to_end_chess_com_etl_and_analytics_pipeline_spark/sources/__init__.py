from .tables import (  # noqa: F401
    create_warehouse,
    dim_results_seed,
    load_table,
    read_csv,
    read_jdbc,
    read_json,
    register_views,
    write_jdbc,
    write_parquet,
)
