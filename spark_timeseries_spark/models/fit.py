"""Distributed model estimation — the reference's "UDAF surface".

The reference applies models via ``mapSeries(v => Model.fitModel(v)...)``
(SURVEY §2.9): one single-threaded estimator per series, parallel across
series. Here that is a grouped-map pandas UDF: ``df.groupBy(key)
.applyInPandas(...)`` — one Arrow batch per series, numpy estimator inside,
results as plain DataFrames:

- :func:`fit_models`   → (key, model, params ARRAY<double>, aux...)
- :func:`forecast`     → (key, step, forecast)
- :func:`residuals`    → (key, loc, ts, value) with model effects removed
- :func:`test_series`  → (key, stat, p_value) for a named statistical test

Scale notes: the plan is one exchange on the key (reused if the input is
already hash-partitioned by key); each series must fit in executor memory —
the same envelope the reference assumes
(``src/site/markdown/index.md:35-40``). Models never touch the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import arima as arima_mod
from . import arx as arx_mod
from . import univariate as uni


def _series_from(pdf: pd.DataFrame, order_col: str, value_col: str) -> np.ndarray:
    pdf = pdf.sort_values(order_col)
    return pdf[value_col].to_numpy(dtype=float, na_value=np.nan)


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key with an EXPLICIT partition count before a
    grouped-map stage. Without this, AQE coalesces the small shuffled input
    to one partition and the (CPU-bound, Python-side) per-series estimators
    run serially — the classic small-input/expensive-UDF mismatch. AQE's
    byte-based coalescing cannot see Python CPU cost, but it preserves
    user-specified repartition counts, so this explicit repartition is
    enough — no session-wide coalescing override (which would force
    full-width task counts on every tiny JVM shuffle in the plan).

    The count must DIFFER from the upstream partitioning: when the input is
    already hash-partitioned by key with the same count (e.g. a window-fill
    chain over `partitionBy(key)` with `spark.sql.shuffle.partitions`
    partitions), the optimizer prunes the repartition as redundant, the
    grouped map rides the upstream ENSURE_REQUIREMENTS exchange, and AQE
    coalesces that to ONE partition — measured 7× slowdown (serialized
    fits). An odd `2·parallelism + 1` count never matches cores or the
    usual shuffle-partition settings and load-balances CPU-skewed series."""
    n = 2 * df.sparkSession.sparkContext.defaultParallelism + 1
    return df.repartition(n, key_col)


def _clean(y: np.ndarray) -> np.ndarray:
    return y[~np.isnan(y)]


def _fit_one(model: str, y: np.ndarray, kwargs: dict):
    if model == "ar":
        m = uni.fit_ar(y, kwargs.get("max_lag", 1), kwargs.get("no_intercept", False))
        return np.concatenate([[m.c], m.coefficients])
    if model == "ewma":
        return np.array([uni.fit_ewma(y).smoothing])
    if model == "garch":
        m = uni.fit_garch(y)
        return np.array([m.omega, m.alpha, m.beta])
    if model == "argarch":
        m = uni.fit_ar_garch(y)
        return np.array([m.c, m.phi, m.garch.omega, m.garch.alpha, m.garch.beta])
    if model == "holtwinters":
        m = uni.fit_holt_winters(
            y, kwargs.get("period", 12), kwargs.get("model_type", "additive")
        )
        return np.array([m.alpha, m.beta, m.gamma, m.sse_])
    if model == "arima":
        m = arima_mod.fit_arima(
            y,
            kwargs.get("p", 1),
            kwargs.get("d", 0),
            kwargs.get("q", 0),
            kwargs.get("include_intercept", True),
        )
        return m.coefficients
    if model == "arima_auto":
        m = arima_mod.auto_fit(
            y, kwargs.get("max_p", 5), kwargs.get("max_d", 2), kwargs.get("max_q", 5)
        )
        return np.concatenate([[m.p, m.d, m.q], m.coefficients])
    raise ValueError(f"unknown model {model}")


def _model_obj(model: str, params: np.ndarray, kwargs: dict):
    if model == "ar":
        return uni.ARModel(float(params[0]), params[1:])
    if model == "ewma":
        return uni.EWMAModel(float(params[0]))
    if model == "garch":
        return uni.GARCHModel(*map(float, params))
    if model == "argarch":
        return uni.ARGARCHModel(
            float(params[0]), float(params[1]), uni.GARCHModel(*map(float, params[2:]))
        )
    if model == "holtwinters":
        return uni.HoltWintersModel(
            kwargs.get("period", 12),
            float(params[0]),
            float(params[1]),
            float(params[2]),
            kwargs.get("model_type", "additive"),
        )
    if model == "arima":
        return arima_mod.ARIMAModel(
            kwargs.get("p", 1),
            kwargs.get("d", 0),
            kwargs.get("q", 0),
            params,
            kwargs.get("include_intercept", True),
        )
    raise ValueError(f"unknown model {model}")


def fit_models(
    df: DataFrame,
    model: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Per-series estimation → (key, model, params)."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        try:
            params = _fit_one(model, y, kwargs)
        except Exception:
            params = np.array([])
        return pd.DataFrame(
            {"key": [key], "model": [model], "params": [params.tolist()]}
        )

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _fit, schema="key string, model string, params array<double>"
    )


def forecast(
    df: DataFrame,
    model: str,
    horizon: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Fit per series and forecast ``horizon`` steps → (key, step, forecast)."""

    def _fc(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        try:
            params = _fit_one(model, y, kwargs)
            m = _model_obj(model, params, kwargs)
            if model == "ewma":
                s = m.add_effects(y)
                fc = np.full(horizon, s[-1])
            elif model == "garch":
                fc = np.full(horizon, np.nan)  # mean forecast of pure GARCH is 0
            else:
                fc = m.forecast(y, horizon)
        except Exception:
            fc = np.full(horizon, np.nan)
        return pd.DataFrame(
            {
                "key": key,
                "step": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": fc,
            }
        )

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _fc, schema="key string, step long, forecast double"
    )


def residuals(
    df: DataFrame,
    model: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Fit per series and remove time-dependent effects
    (``TimeSeriesModel.removeTimeDependentEffects``)."""
    out_schema = df.schema

    def _resid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        y = pdf[value_col].to_numpy(dtype=float, na_value=np.nan)
        mask = ~np.isnan(y)
        try:
            params = _fit_one(model, y[mask], kwargs)
            m = _model_obj(model, params, kwargs)
            res = np.full(len(y), np.nan)
            res[mask] = (
                m.remove_effects(y[mask])
                if hasattr(m, "remove_effects")
                else np.nan
            )
        except Exception:
            res = np.full(len(y), np.nan)
        pdf[value_col] = [None if np.isnan(v) else float(v) for v in res]
        return pdf

    return _spread(df, key_col).groupBy(key_col).applyInPandas(_resid, schema=out_schema)


def apply_model_effects(
    df: DataFrame,
    model: str,
    params,
    add: bool = True,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Distributed ``addTimeDependentEffects`` / ``removeTimeDependentEffects``
    (``models/TimeSeriesModel.scala:23-45``): apply a model's filter (or its
    inverse) to every series with ONE fixed parameter vector. Grouped-map
    pandas UDF; the value column is replaced in place, schema unchanged."""
    import numpy as np

    params = np.asarray(params, dtype=float)
    m = _model_obj(model, params, kwargs)

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float, na_value=np.nan)
        out = m.add_effects(y) if add else m.remove_effects(y)
        pdf[value_col] = [None if np.isnan(v) else float(v) for v in out]
        return pdf

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _apply, schema=df.schema
    )


def fit_xreg_models(
    df: DataFrame,
    model: str,
    xreg_cols: list[str],
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Per-series estimation with exogenous regressors →
    (key, model, params ARRAY<double>, aux ARRAY<double>).

    ``model`` ∈ arx (``AutoregressionX.scala:48-68``) | arimax
    (``ARIMAX.scala:59-87``) | regression_arima (Cochrane-Orcutt,
    ``RegressionARIMA.scala:83-160``). ``aux`` carries model-specific
    extras: arx → [y_max_lag, x_max_lag]; arimax → [p, d, q];
    regression_arima → [rho, dw, iterations]."""

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float, na_value=np.nan)
        X = pdf[list(xreg_cols)].to_numpy(dtype=float, na_value=np.nan)
        mask = ~np.isnan(y) & ~np.isnan(X).any(axis=1)
        y, X = y[mask], X[mask]
        params, aux = np.array([]), np.array([])
        try:
            if model == "arx":
                yl = kwargs.get("y_max_lag", 1)
                xl = kwargs.get("x_max_lag", 1)
                m = arx_mod.fit_arx(
                    y, X, yl, xl,
                    kwargs.get("include_original_x", True),
                    kwargs.get("no_intercept", False),
                )
                params = np.concatenate([[m.c], m.coefficients])
                aux = np.array([yl, xl], dtype=float)
            elif model == "arimax":
                p = kwargs.get("p", 1)
                d = kwargs.get("d", 0)
                q = kwargs.get("q", 0)
                m = arx_mod.fit_arimax(
                    y, X, p, d, q,
                    kwargs.get("xreg_max_lag", 0),
                    kwargs.get("include_original_xreg", True),
                    kwargs.get("include_intercept", True),
                )
                params = np.asarray(m.coefficients, dtype=float)
                aux = np.array([p, d, q], dtype=float)
            elif model == "regression_arima":
                m = arx_mod.fit_regression_arima_cochrane_orcutt(
                    y, X, kwargs.get("max_iter", 10)
                )
                params = np.asarray(m.beta, dtype=float)
                aux = np.array([m.rho, m.dw, m.iterations], dtype=float)
            else:
                raise ValueError(f"unknown xreg model {model}")
        except ValueError:
            raise
        except Exception:
            pass
        return pd.DataFrame(
            {
                "key": [key],
                "model": [model],
                "params": [params.tolist()],
                "aux": [aux.tolist()],
            }
        )

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _fit,
        schema="key string, model string, params array<double>, aux array<double>",
    )


def test_series(
    df: DataFrame,
    test: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Per-series statistical test → (key, stat, p_value). ``test`` ∈
    adf | kpss | dw | ljung_box | breusch_godfrey | breusch_pagan; p_value
    is NaN for tests that return critical values instead (kpss) or none
    (dw). The BG/BP auxiliary regressions use a linear time trend as the
    factor matrix (the per-series analog of the reference's caller-supplied
    ``factors``, ``TimeSeriesStatisticalTests.scala:276-329``)."""
    from ..stats import tests as st

    def _t(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        stat, p = float("nan"), float("nan")
        try:
            if test == "adf":
                stat, p = st.adf_test(
                    y, kwargs.get("max_lag", 1), kwargs.get("regression", "c")
                )
            elif test == "kpss":
                stat, _ = st.kpss_test(y, kwargs.get("method", "c"))
            elif test == "dw":
                stat = st.durbin_watson(y)
            elif test == "ljung_box":
                stat, p = st.ljung_box(y, kwargs.get("max_lag", 10))
            elif test == "breusch_godfrey":
                trend = np.arange(len(y), dtype=float)[:, None]
                stat, p = st.breusch_godfrey(y, trend, kwargs.get("max_lag", 1))
            elif test == "breusch_pagan":
                trend = np.arange(len(y), dtype=float)[:, None]
                stat, p = st.breusch_pagan(y, trend)
            else:
                raise ValueError(f"unknown test {test}")
        except ValueError:
            raise
        except Exception:
            pass
        return pd.DataFrame({"key": [key], "stat": [stat], "p_value": [p]})

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _t, schema="key string, stat double, p_value double"
    )
