from .observations import (
    read_documents_stream,
    read_observations_stream,
    streaming_dedup_exact,
    streaming_ewma,
    streaming_incremental_dedup,
    streaming_outliers,
    streaming_resample,
    streaming_token_stats,
)

__all__ = [
    "read_documents_stream",
    "read_observations_stream",
    "streaming_dedup_exact",
    "streaming_ewma",
    "streaming_incremental_dedup",
    "streaming_outliers",
    "streaming_resample",
    "streaming_token_stats",
]
