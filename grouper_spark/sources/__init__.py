from .catalog import TABLES, load_tables, register_views, table
from .sinks import read_any, write_bucketed, write_partitioned

__all__ = [
    "TABLES",
    "table",
    "load_tables",
    "register_views",
    "read_any",
    "write_partitioned",
    "write_bucketed",
]
