from .registry import (
    TESTDATA_TABLES,
    default_sf_dir,
    load_table,
    load_tables,
    read_partitioned,
)

__all__ = [
    "TESTDATA_TABLES",
    "default_sf_dir",
    "load_table",
    "load_tables",
    "read_partitioned",
]
