"""EasyPlot parity: ``ezplot`` / ``acf_plot`` / ``pacf_plot``
(``EasyPlot.scala:24-120``).

The reference renders with breeze-viz; we render with matplotlib when it is
installed and otherwise raise a clear ImportError — but ALL of the numbers
behind each figure are computed by plain functions here (``local_autocorr``,
``corr_plot_data``) or by the distributed surfaces in
:mod:`spark_timeseries_spark.stats.correlogram`, so the data path is fully
testable without a plotting backend.

Layout parity with ``EasyPlot.drawCorrPlot`` (``EasyPlot.scala:106-120``):
correlations as vertical lines anchored at y=0 over lags 1..n, plus two red
horizontal white-noise confidence lines at ±conf_bound spanning x ∈ [0, n].
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from .correlogram import conf_bound


def _require_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)  # headless-safe default
        import matplotlib.pyplot as plt  # noqa: F401

        return plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "matplotlib is required for the plot helpers (ezplot/acf_plot/"
            "pacf_plot); it is not installed in this environment. The "
            "underlying numbers are available without it via "
            "stats.correlogram.acf/pacf and stats.easyplot.corr_plot_data."
        ) from e


def local_autocorr(data: Sequence[float], max_lag: int) -> np.ndarray:
    """Sample autocorrelation of a local series — exact port of the
    reference semantics (``UnivariateTimeSeries.scala:70-96``): per lag k,
    the Pearson correlation of ``y[k:]`` vs ``y[:-k]`` with per-slice means
    (NOT the common fixed-denominator ACF estimator)."""
    y = np.asarray(data, dtype=float)
    n = y.size
    if max_lag >= n:
        raise ValueError(
            f"max_lag ({max_lag}) must be < series length ({n}); lag-k "
            "autocorrelation needs at least k+1 observations"
        )
    out = np.empty(max_lag, dtype=float)
    for k in range(1, max_lag + 1):
        a = y[k:] - y[k:].mean()
        b = y[: n - k] - y[: n - k].mean()
        out[k - 1] = (a * b).sum() / (
            math.sqrt((a * a).sum()) * math.sqrt((b * b).sum())
        )
    return out


def corr_plot_data(
    corrs: Sequence[float], conf_val: float
) -> dict[str, object]:
    """The exact line geometry ``EasyPlot.drawCorrPlot`` draws
    (``EasyPlot.scala:106-120``), as plain arrays: one vertical segment
    (x=lag, y from 0 to corr) per lag, and two horizontal confidence
    segments at ±conf_val across x ∈ [0, n]."""
    corrs = np.asarray(corrs, dtype=float)
    n = corrs.size
    return {
        "vertical_lines": [
            ([float(i + 1), float(i + 1)], [0.0, float(c)])
            for i, c in enumerate(corrs)
        ],
        "conf_lines": [
            ([0.0, float(n)], [cv, cv]) for cv in (conf_val, -conf_val)
        ],
    }


def _draw_corr(plt, corrs, conf_val, title, ylabel):
    fig, ax = plt.subplots()
    geom = corr_plot_data(corrs, conf_val)
    for xs, ys in geom["vertical_lines"]:
        ax.plot(xs, ys)
    for xs, ys in geom["conf_lines"]:
        ax.plot(xs, ys, "-", color="red")
    ax.set_title(title)
    ax.set_xlabel("Lag")
    ax.set_ylabel(ylabel)
    return fig


def ezplot(data, style: str = "-"):
    """``EasyPlot.ezplot`` (``EasyPlot.scala:25-55``): plot one series (1-D
    sequence) or several (sequence of sequences) against 0-based position.
    Returns the matplotlib Figure."""
    plt = _require_matplotlib()
    arr = np.asarray(data, dtype=float)
    fig, ax = plt.subplots()
    if arr.ndim == 1:
        arr = arr[None, :]
    for row in arr:
        ax.plot(np.arange(row.size, dtype=float), row, style)
    return fig


def acf_plot(data: Sequence[float], max_lag: int, conf: float = 0.95):
    """``EasyPlot.acfPlot`` (``EasyPlot.scala:62-76``)."""
    plt = _require_matplotlib()
    corrs = local_autocorr(data, max_lag)
    return _draw_corr(
        plt,
        corrs,
        conf_bound(conf, len(data)),
        "Autocorrelation function",
        "Autocorrelation",
    )


def pacf_plot(data: Sequence[float], max_lag: int, conf: float = 0.95):
    """``EasyPlot.pacfPlot`` (``EasyPlot.scala:83-97``): the AR(max_lag)
    coefficient vector as partial autocorrelations."""
    plt = _require_matplotlib()
    from ..models.univariate import fit_ar

    coefs = fit_ar(np.asarray(data, dtype=float), max_lag).coefficients
    return _draw_corr(
        plt,
        coefs,
        conf_bound(conf, len(data)),
        "Partial autocorrelation function",
        "Partial Autocorrelation",
    )
