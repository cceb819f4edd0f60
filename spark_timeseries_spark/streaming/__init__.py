from .observations import (
    near_dedup_gate,
    read_documents_stream,
    read_observations_stream,
    streaming_dedup_exact,
    streaming_ewma,
    streaming_cusum,
    streaming_incremental_dedup,
    streaming_near_dedup,
    streaming_outliers,
    streaming_psi,
    streaming_resample,
    streaming_token_stats,
)

__all__ = [
    "near_dedup_gate",
    "read_documents_stream",
    "read_observations_stream",
    "streaming_dedup_exact",
    "streaming_ewma",
    "streaming_cusum",
    "streaming_incremental_dedup",
    "streaming_near_dedup",
    "streaming_outliers",
    "streaming_psi",
    "streaming_resample",
    "streaming_token_stats",
]
