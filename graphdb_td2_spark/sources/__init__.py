from .parquet import load_tables, read_table, safe_read_table, table_path
from .sinks import write_partitioned, write_sorted_buckets

__all__ = [
    "load_tables",
    "read_table",
    "safe_read_table",
    "table_path",
    "write_partitioned",
    "write_sorted_buckets",
]
