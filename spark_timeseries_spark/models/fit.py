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
from pyspark.sql import functions as F

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
    from ..parallel import spread_kernel

    return spread_kernel(df, key_col)


def _clean(y: np.ndarray) -> np.ndarray:
    return y[~np.isnan(y)]


_KNOWN_MODELS = (
    "ar", "ewma", "ewma_grid", "garch", "egarch", "argarch", "holtwinters",
    "arima", "arima_auto",
)
_KNOWN_XREG_MODELS = ("arx", "arimax", "regression_arima")
#: models with a mean-forecast path — the volatility family's mean
#: forecast is identically 0 only for plain GARCH (handled explicitly);
#: egarch/argarch and the grid/auto selector aliases have no forecast
#: implementation, and accepting them made every per-series task fail
#: inside the NaN-swallowing except (silent all-NaN output)
_FORECASTABLE = ("ar", "ewma", "garch", "holtwinters", "arima")
#: models whose fitted object implements remove_effects
_RESIDUAL_MODELS = ("ar", "ewma", "garch", "egarch", "argarch", "arima")
_KNOWN_TESTS = (
    "adf", "kpss", "dw", "ljung_box", "breusch_godfrey", "breusch_pagan",
    "arch_lm",
)


#: accepted spellings → canonical registry names
_MODEL_ALIASES = {"holt_winters": "holtwinters", "ljungbox": "ljung_box"}


def _require(name: str, known: tuple) -> str:
    """Name validation happens BEFORE the grouped-map UDF is shipped: a typo
    fails fast on the driver instead of inside every task, and the per-series
    except-all below can then safely degrade real estimator failures (short /
    degenerate series) to empty params rather than failing the stage.
    Returns the canonical name (aliases like ``holt_winters`` normalize)."""
    name = _MODEL_ALIASES.get(name, name)
    if name not in known:
        raise ValueError(f"unknown model/test {name!r}; expected one of {known}")
    return name


def _fit_one(model: str, y: np.ndarray, kwargs: dict):
    if model == "ar":
        m = uni.fit_ar(y, kwargs.get("max_lag", 1), kwargs.get("no_intercept", False))
        return np.concatenate([[m.c], m.coefficients])
    if model == "ewma":
        return np.array([uni.fit_ewma(y).smoothing])
    if model == "ewma_grid":
        alpha, sse = uni.fit_ewma_grid(y, kwargs.get("steps", 100))
        return np.array([alpha, sse])
    if model == "garch":
        m = uni.fit_garch(y)
        return np.array([m.omega, m.alpha, m.beta])
    if model == "egarch":
        m = uni.fit_egarch(y)
        return np.array([m.omega, m.alpha, m.gamma, m.beta])
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
    if model == "egarch":
        return uni.EGARCHModel(*map(float, params))
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
    model = _require(model, _KNOWN_MODELS)

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
    """Fit per series and forecast ``horizon`` steps → (key, step, forecast).

    Pass ``params=[...]`` to skip the fit and forecast with a known parameter
    vector (the distributed analog of forecasting from a pre-fit model)."""
    model = _require(model, _FORECASTABLE)
    fixed_params = kwargs.pop("params", None)

    def _fc(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        try:
            params = (
                np.asarray(fixed_params, dtype=float)
                if fixed_params is not None
                else _fit_one(model, y, kwargs)
            )
            m = _model_obj(model, params, kwargs)
            if model == "ewma":
                s = m.add_effects(y)
                fc = np.full(horizon, s[-1])
            elif model == "garch":
                # the mean forecast of a pure GARCH process IS 0 — the
                # interesting quantity, the conditional variance path, is
                # exposed by :func:`variance_forecast`
                fc = np.zeros(horizon)
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
    model = _require(model, _RESIDUAL_MODELS)
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
    regression_arima → [rho, dw, iterations, dw0]."""
    model = _require(model, _KNOWN_XREG_MODELS)

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
                aux = np.array([m.rho, m.dw, m.iterations, m.dw0], dtype=float)
        except Exception:
            # same per-series degradation as fit_models: one degenerate
            # series (too short for the lag order, singular design) yields
            # empty params instead of failing the whole Spark stage
            params, aux = np.array([]), np.array([])
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


def variance_forecast(
    df: DataFrame,
    horizon: int,
    model: str = "garch",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Per-series conditional-variance forecast → (key, step, variance).
    ``model`` ∈ garch | argarch: fits the model, then iterates the variance
    recursion h steps ahead (``GARCH.scala:198-259`` is the recursion shape;
    the reference never exposes a variance path — this is the quantity a
    GARCH user actually wants, so we surface it)."""
    if model not in ("garch", "argarch"):
        raise ValueError("variance_forecast supports garch | argarch")

    def _vf(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        try:
            if model == "garch":
                g = uni.fit_garch(y)
                vf = g.variance_forecast(y, horizon)
            else:
                m = uni.fit_ar_garch(y)
                resid = uni.ARModel(m.c, np.array([m.phi])).remove_effects(y)
                resid[0] = 0.0
                vf = m.garch.variance_forecast(resid, horizon)
        except Exception:
            vf = np.full(horizon, np.nan)
        return pd.DataFrame(
            {
                "key": key,
                "step": np.arange(1, horizon + 1, dtype=np.int64),
                "variance": vf,
            }
        )

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _vf, schema="key string, step long, variance double"
    )


def _certificate_one(model: str, y: np.ndarray, kwargs: dict) -> tuple[float, float]:
    """(objective at fitted params, objective at the optimizer's start) for
    one series — the deterministic inequality behind :func:`fit_improvement`.
    Lower is better for every objective (SSE or negative log-likelihood)."""
    if model == "ewma":
        return uni.fit_ewma(y).sse(y), uni.EWMAModel(0.94).sse(y)
    if model == "garch":
        var = float(np.var(y)) or 1.0
        start = uni.GARCHModel(var * 0.1, 0.1, 0.8)
        return -uni.fit_garch(y).log_likelihood(y), -start.log_likelihood(y)
    if model == "egarch":
        start = uni.egarch_start(y)
        return -uni.fit_egarch(y).log_likelihood(y), -start.log_likelihood(y)
    if model == "argarch":
        ar = uni.fit_ar(y, 1)
        resid = ar.remove_effects(y)
        resid[0] = 0.0
        var = float(np.var(resid)) or 1.0
        start = uni.GARCHModel(var * 0.1, 0.1, 0.8)
        fitted = uni.fit_garch(resid)
        return -fitted.log_likelihood(resid), -start.log_likelihood(resid)
    if model == "holtwinters":
        period = kwargs.get("period", 12)
        mt = kwargs.get("model_type", "additive")
        m = uni.fit_holt_winters(y, period, mt)
        base = uni.HoltWintersModel(period, 0.3, 0.1, 0.1, mt)
        return m.sse_, base.sse(y)
    if model == "arima":
        p, d, q = kwargs.get("p", 1), kwargs.get("d", 0), kwargs.get("q", 0)
        ic = kwargs.get("include_intercept", True)
        dy = arima_mod.difference(y, d)
        x0 = arima_mod.hannan_rissanen(dy, p, q, ic)
        start = arima_mod.ARIMAModel(p, d, q, x0, ic)
        fitted = arima_mod.fit_arima(y, p, d, q, include_intercept=ic)
        return -fitted.log_likelihood_css(y), -start.log_likelihood_css(y)
    if model == "arima_auto":
        fitted = arima_mod.auto_fit(y)
        naive = arima_mod.fit_arima(y, 0, fitted.d, 0, include_intercept=fitted.d == 0)
        return fitted.approx_aic(y), naive.approx_aic(y)
    raise ValueError(f"no certificate for model {model}")


def fit_improvement(
    df: DataFrame,
    model: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Deterministic optimizer certificate → (key, n, ok).

    ``ok`` asserts the fitted objective is no worse than the objective at the
    optimizer's own deterministic starting point (HR init for ARIMA, the
    fixed CG/simplex starts otherwise) — the strongest *hashable* statement
    about an iterative fit: the optimum itself is optimizer-path-dependent,
    but "the optimizer never returns something worse than its start" is an
    exact boolean the DuckDB oracle can assert per key. A per-series fit
    failure (degenerate input) yields ok = false, so the certificate also
    gates silent degradation."""
    model = _require(model, _KNOWN_MODELS)
    if model in ("ar", "ewma_grid"):
        raise ValueError(f"{model} is exactly reproducible; hash its params instead")

    def _c(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        try:
            fitted, start = _certificate_one(model, y, kwargs)
            ok = bool(fitted <= start * (1 + 1e-9) + 1e-9)
        except Exception:
            ok = False
        return pd.DataFrame({"key": [key], "n": [len(y)], "ok": [ok]})

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _c, schema="key string, n long, ok boolean"
    )


def fit_xreg_improvement(
    df: DataFrame,
    model: str,
    xreg_cols: list[str],
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """Optimizer certificate for exogenous-regressor models → (key, n, ok);
    same contract as :func:`fit_improvement`, comparing the CSS at the fitted
    parameters to the CSS at the deterministic start
    (:func:`~spark_timeseries_spark.models.arx.arimax_start`)."""
    if model != "arimax":
        raise ValueError("fit_xreg_improvement supports arimax")
    p = kwargs.get("p", 1)
    d = kwargs.get("d", 0)
    q = kwargs.get("q", 0)
    xl = kwargs.get("xreg_max_lag", 0)
    io = kwargs.get("include_original_xreg", True)
    ii = kwargs.get("include_intercept", True)

    def _c(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].to_numpy(dtype=float, na_value=np.nan)
        X = pdf[list(xreg_cols)].to_numpy(dtype=float, na_value=np.nan)
        mask = ~np.isnan(y) & ~np.isnan(X).any(axis=1)
        y, X = y[mask], X[mask]
        try:
            x0 = arx_mod.arimax_start(y, X, p, d, q, xl, io, ii)
            start = arx_mod.ARIMAXModel(p, d, q, xl, io, ii, x0)
            fitted = arx_mod.fit_arimax(y, X, p, d, q, xl, io, ii)
            ok = bool(
                fitted.css(y, X) <= start.css(y, X) * (1 + 1e-9) + 1e-9
            )
        except Exception:
            ok = False
        return pd.DataFrame({"key": [key], "n": [len(y)], "ok": [ok]})

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _c, schema="key string, n long, ok boolean"
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
    adf | kpss | dw | ljung_box | breusch_godfrey | breusch_pagan |
    arch_lm; p_value is NaN for tests that return critical values instead
    (kpss) or none (dw). The BG/BP auxiliary regressions use a linear time
    trend as the factor matrix (the per-series analog of the reference's
    caller-supplied ``factors``, ``TimeSeriesStatisticalTests.scala:276-329``);
    ``arch_lm`` (beyond-reference, Engle 1982) treats the series values as
    the residuals under test — pre-whiten first if they carry structure."""
    test = _require(test, _KNOWN_TESTS)

    def _t(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        stat, p = _run_series_test(test, y, kwargs)
        return pd.DataFrame({"key": [key], "stat": [stat], "p_value": [p]})

    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _t, schema="key string, stat double, p_value double"
    )


def _run_series_test(test: str, y: np.ndarray, kwargs: dict):
    """Shared single-test dispatch for :func:`test_series` and
    :func:`test_series_suite` — one code path so the suite's per-test
    statistics are bit-identical to the standalone rows'."""
    from ..stats import tests as st

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
        elif test == "arch_lm":
            stat, p = st.arch_lm(y, kwargs.get("max_lag", 1))
    except Exception:
        pass  # degenerate series → NaN stat, like fit_models
    return stat, p


def test_series_suite(
    df: DataFrame,
    specs: list,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Run SEVERAL per-series tests in ONE grouped-map pass →
    (key, <name>_stat, <name>_p per spec). ``specs`` is a list of
    ``(name, test, kwargs)`` with ``test`` from the same registry as
    :func:`test_series`.

    Pure plan optimization (r14): a suite row composed of N
    :func:`test_series` calls pays N scans + N spread exchanges + N
    Python stages + N−1 key joins; each series is already IN CORE once
    per test, so computing every statistic while it is there collapses
    the plan to ONE scan + ONE exchange + ONE Python stage with zero
    change to any statistic (the dispatch is shared —
    :func:`_run_series_test`)."""
    # normalize aliases up front (e.g. 'ljungbox' -> 'ljung_box'): the
    # kernel dispatches on the CANONICAL name, so a validated-but-raw
    # alias would silently match no branch and yield NaN stat/p
    specs = [
        (name, _require(test, _KNOWN_TESTS), kw) for name, test, kw in specs
    ]

    def _t(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        y = _clean(_series_from(pdf, order_col, value_col))
        row: dict = {"key": [key]}
        for name, test, kw in specs:
            stat, p = _run_series_test(test, y, kw)
            row[f"{name}_stat"] = [stat]
            row[f"{name}_p"] = [p]
        return pd.DataFrame(row)

    fields = ", ".join(
        f"`{name}_stat` double, `{name}_p` double" for name, _, _ in specs
    )
    return _spread(df, key_col).groupBy(key_col).applyInPandas(
        _t, schema=f"key string, {fields}"
    )


def granger_test(
    df: DataFrame,
    target_key: str,
    cause_key: str,
    max_lag: int = 1,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Pairwise Granger non-causality: does series ``cause_key`` help
    forecast series ``target_key`` beyond its own history? →
    one row (target, cause, n, f_stat, p_value); see
    :func:`stats.tests.granger_causality` for the statistic (F of
    restricted-vs-unrestricted lag regression; large-sample χ²(p)
    p-value). Beyond-reference.

    Plan: the two named series align on ``order_col`` via one inner
    equi-join (rows where either side is missing drop out — fill first
    for gap-free designs); the pair then flows as ONE group through a
    grouped-map kernel, so the OLS runs on an executor, not the driver —
    the same single-series-in-memory envelope as ``crosscorr``."""
    a = df.where(F.col(key_col) == target_key).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_y")
    )
    b = df.where(F.col(key_col) == cause_key).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_x")
    )
    j = a.join(b, "_o").where(
        F.col("_y").isNotNull() & F.col("_x").isNotNull()
    )

    def _g(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..stats import tests as st

        pdf = pdf.sort_values("_o")
        f, p = float("nan"), float("nan")
        try:
            f, p = st.granger_causality(
                pdf["_y"].to_numpy(), pdf["_x"].to_numpy(), max_lag
            )
        except Exception:
            pass  # short/degenerate overlap → NaN, like test_series
        return pd.DataFrame(
            {
                "target": [target_key],
                "cause": [cause_key],
                "n": [len(pdf)],
                "f_stat": [f],
                "p_value": [p],
            }
        )

    return j.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
        _g, schema="target string, cause string, n long, f_stat double, p_value double"
    )


def cointegration_test(
    df: DataFrame,
    key_a: str,
    key_b: str,
    max_lag: int = 0,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Engle-Granger two-step cointegration between two named series →
    one row (lhs, rhs, n, alpha, beta, adf_stat, cointegrated_5pct);
    see :func:`stats.tests.engle_granger` for the statistic and
    :data:`stats.tests.EG_CRITICAL_2V` for the residual-based critical
    values. Beyond-reference.

    Plan: same shape as :func:`granger_test` — one inner equi-join on
    ``order_col`` conforms the pair (fill first for gap-free designs),
    then the pair flows as ONE group through a grouped-map kernel so the
    two-step OLS runs on an executor inside the engine's standard
    single-series-in-memory envelope."""
    from ..stats.tests import EG_CRITICAL_2V, engle_granger

    a = df.where(F.col(key_col) == key_a).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_y")
    )
    b = df.where(F.col(key_col) == key_b).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_x")
    )
    j = a.join(b, "_o").where(
        F.col("_y").isNotNull() & F.col("_x").isNotNull()
    )
    crit5 = EG_CRITICAL_2V["5%"]

    def _eg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_o")
        alpha, beta, stat = float("nan"), float("nan"), float("nan")
        try:
            alpha, beta, stat = engle_granger(
                pdf["_y"].to_numpy(), pdf["_x"].to_numpy(), max_lag
            )
        except Exception:
            pass  # short/degenerate overlap → NaN, like test_series
        return pd.DataFrame(
            {
                "lhs": [key_a],
                "rhs": [key_b],
                "n": [len(pdf)],
                "alpha": [alpha],
                "beta": [beta],
                "adf_stat": [stat],
                "cointegrated_5pct": [bool(stat < crit5)]
                if stat == stat
                else [None],
            }
        )

    return j.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
        _eg,
        schema="lhs string, rhs string, n long, alpha double, beta double,"
        " adf_stat double, cointegrated_5pct boolean",
    )
