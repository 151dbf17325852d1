from kairos_spark.sources.tables import open_store, read_table, write_long_table

__all__ = ["open_store", "read_table", "write_long_table"]
