from . import align, fill, filters, lag, layout, resample, rolling

__all__ = ["align", "fill", "filters", "lag", "layout", "resample", "rolling"]
