from grisp_spark.sources.testdata import TABLES, load_table, load_tables, derive_conversations

__all__ = ["TABLES", "load_table", "load_tables", "derive_conversations"]
