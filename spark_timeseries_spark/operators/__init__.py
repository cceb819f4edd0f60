from . import (
    align,
    cusum,
    decompose,
    fill,
    filters,
    lag,
    layout,
    outliers,
    resample,
    rolling,
    sessionize,
)

__all__ = [
    "align",
    "cusum",
    "decompose",
    "fill",
    "filters",
    "lag",
    "layout",
    "outliers",
    "resample",
    "rolling",
    "sessionize",
]
