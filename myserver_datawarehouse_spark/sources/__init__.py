from myserver_datawarehouse_spark.sources.tables import TESTDATA_TABLES, load_table

__all__ = ["TESTDATA_TABLES", "load_table"]
