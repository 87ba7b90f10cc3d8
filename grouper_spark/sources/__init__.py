from .catalog import TABLES, load_tables, register_views, table

__all__ = ["TABLES", "table", "load_tables", "register_views"]
