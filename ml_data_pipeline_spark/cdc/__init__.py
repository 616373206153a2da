from ml_data_pipeline_spark.cdc.events import CHANGE_SCHEMA, DOC_SCHEMA, generate_change_stream
from ml_data_pipeline_spark.cdc.apply import apply_batch, create_docs_table
from ml_data_pipeline_spark.cdc.stream import run_replay
from ml_data_pipeline_spark.cdc.oracle import expected_state, assert_state_equal

__all__ = [
    "CHANGE_SCHEMA",
    "DOC_SCHEMA",
    "generate_change_stream",
    "apply_batch",
    "create_docs_table",
    "run_replay",
    "expected_state",
    "assert_state_equal",
]
