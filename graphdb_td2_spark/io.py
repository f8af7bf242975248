"""Compatibility shim — the source layer lives in ``sources/`` (readers)
and grew a sink side (``sources.sinks``); existing imports keep working."""

from .sources.parquet import (  # noqa: F401
    load_tables,
    read_table,
    safe_read_table,
    table_path,
)
