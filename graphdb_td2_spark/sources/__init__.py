from .extract import extract_graph_tables, load_corpus_to_jdbc, wait_for_jdbc
from .parquet import load_tables, read_table, safe_read_table, table_path
from .sinks import write_partitioned, write_sorted_buckets

__all__ = [
    "extract_graph_tables",
    "load_corpus_to_jdbc",
    "load_tables",
    "read_table",
    "safe_read_table",
    "table_path",
    "wait_for_jdbc",
    "write_partitioned",
    "write_sorted_buckets",
]
