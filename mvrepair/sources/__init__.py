"""Data sources for the engine."""

from mvrepair.sources.parquet import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
