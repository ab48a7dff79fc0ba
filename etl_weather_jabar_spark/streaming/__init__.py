from .joins import enrich_stream_static, interval_join_streams
from .micro_batch import stream_silver, stream_windowed_agg

__all__ = [
    "enrich_stream_static",
    "interval_join_streams",
    "stream_silver",
    "stream_windowed_agg",
]
