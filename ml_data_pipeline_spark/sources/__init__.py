from ml_data_pipeline_spark.sources.tables import load_table, TABLES

__all__ = ["load_table", "TABLES"]
