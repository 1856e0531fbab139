from .tables import (
    TABLES,
    chunked_stream,
    load_table,
    load_table_fanned,
    load_tables,
    read_stream,
    staged_chunks,
    register_views,
    with_event_time,
)

__all__ = [
    "TABLES",
    "chunked_stream",
    "load_table",
    "load_table_fanned",
    "load_tables",
    "read_stream",
    "staged_chunks",
    "register_views",
    "with_event_time",
]
