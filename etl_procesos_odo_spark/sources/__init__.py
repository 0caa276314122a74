from .readers import (
    find_column,
    read_csv,
    read_parquet,
    require_columns,
    select_existing,
)

__all__ = [
    "find_column",
    "read_csv",
    "read_parquet",
    "require_columns",
    "select_existing",
]
