from .arima import ARIMAModel, auto_fit, fit_arima
from .arx import (
    ARIMAXModel,
    ARXModel,
    RegressionARIMAModel,
    arimax_start,
    fit_arimax,
    fit_arx,
    fit_regression_arima_cochrane_orcutt,
)
from .fit import (
    apply_model_effects,
    fit_improvement,
    fit_models,
    fit_xreg_improvement,
    fit_xreg_models,
    forecast,
    cointegration_test,
    granger_test,
    residuals,
    test_series,
    test_series_suite,
    variance_forecast,
)
from .baselines import croston, baseline_forecast
from .var import fit_var, forecast_var, impulse_response
from .univariate import (
    ARGARCHModel,
    ARModel,
    EGARCHModel,
    EWMAModel,
    GARCHModel,
    HoltWintersModel,
    egarch_start,
    fit_ar,
    fit_ar_garch,
    fit_egarch,
    fit_ewma,
    fit_ewma_grid,
    fit_garch,
    fit_holt_winters,
)

__all__ = [
    "ARIMAModel", "auto_fit", "fit_arima",
    "ARIMAXModel", "ARXModel", "RegressionARIMAModel",
    "arimax_start", "fit_arimax", "fit_arx",
    "fit_regression_arima_cochrane_orcutt",
    "apply_model_effects", "fit_improvement", "fit_models", "fit_xreg_models",
    "fit_xreg_improvement",
    "forecast", "granger_test", "cointegration_test", "residuals", "test_series", "test_series_suite", "variance_forecast",
    "baseline_forecast", "croston", "fit_var", "forecast_var", "impulse_response",
    "ARGARCHModel", "ARModel", "EGARCHModel", "EWMAModel", "GARCHModel",
    "HoltWintersModel", "egarch_start",
    "fit_ar", "fit_ar_garch", "fit_egarch", "fit_ewma", "fit_ewma_grid",
    "fit_garch", "fit_holt_winters",
]
