from .parquet import read_table, read_tables, register_views
from .csv import load_wafer_csv, load_data
from .sinks import write_csv_single, write_parquet

__all__ = [
    "read_table",
    "read_tables",
    "register_views",
    "load_wafer_csv",
    "load_data",
    "write_csv_single",
    "write_parquet",
]
