from .micro_batch import stream_silver, stream_windowed_agg

__all__ = ["stream_silver", "stream_windowed_agg"]
