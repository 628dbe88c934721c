from parrsb_spark.streaming.events import (
    windowed_agg_batch,
    windowed_agg_stream,
    sessionize_batch,
)

__all__ = ["windowed_agg_batch", "windowed_agg_stream", "sessionize_batch"]
