from . import align, fill, filters, lag, layout, resample, rolling, sessionize

__all__ = [
    "align",
    "fill",
    "filters",
    "lag",
    "layout",
    "resample",
    "rolling",
    "sessionize",
]
