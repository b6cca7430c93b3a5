from .io import load_table, load_tables, write_parquet, TESTDATA_TABLES

__all__ = ["load_table", "load_tables", "write_parquet", "TESTDATA_TABLES"]
