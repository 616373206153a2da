from ml_data_pipeline_spark.functions import tokens

__all__ = ["tokens"]
