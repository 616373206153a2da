from ml_data_pipeline_spark.lake.table import LakeTable, Snapshot
from ml_data_pipeline_spark.lake.schema_evolution import (
    SchemaMismatch,
    compatible_with,
    merge_schemas,
    merge_types,
)

__all__ = [
    "LakeTable",
    "Snapshot",
    "SchemaMismatch",
    "compatible_with",
    "merge_schemas",
    "merge_types",
]
