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
    spectral,
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
    "spectral",
]
