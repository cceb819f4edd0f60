from . import (
    align,
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
