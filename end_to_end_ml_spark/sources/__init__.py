from .io import TESTDATA_TABLES, load_table, load_tables, register_views, write_parquet

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "register_views", "write_parquet"]
