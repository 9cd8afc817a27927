from .loader import TESTDATA_TABLES, load_tables, table

__all__ = ["TESTDATA_TABLES", "load_tables", "table"]
