from .readers import TABLES, load_table, load_tables, points_from_indexed_csv, register_views

__all__ = ["TABLES", "load_table", "load_tables", "points_from_indexed_csv", "register_views"]
