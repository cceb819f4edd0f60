from .observations import read_observations_stream, streaming_ewma, streaming_resample

__all__ = ["read_observations_stream", "streaming_ewma", "streaming_resample"]
