from ml_data_pipeline_spark.streaming.windows import (
    windowed_event_counts_stream,
    run_windowed_counts,
)

__all__ = ["windowed_event_counts_stream", "run_windowed_counts"]
