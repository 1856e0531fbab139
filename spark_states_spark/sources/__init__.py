from .tables import (
    TABLES,
    load_table,
    load_tables,
    read_stream,
    register_views,
    with_event_time,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_stream",
    "register_views",
    "with_event_time",
]
