from .catalog import TABLES, load_table, register_base_views

__all__ = ["TABLES", "load_table", "register_base_views"]
