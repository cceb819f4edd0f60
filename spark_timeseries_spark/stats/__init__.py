from .correlogram import acf, conf_bound, pacf
from .evaluation import forecast_accuracy
from .nonparametric import runs_test, variance_ratio
from .easyplot import acf_plot, corr_plot_data, ezplot, local_autocorr, pacf_plot
from .tests import (
    adf_test,
    arch_lm,
    autocorr_pearson,
    breusch_godfrey,
    breusch_pagan,
    durbin_watson,
    granger_causality,
    kpss_test,
    ljung_box,
    mackinnon_p,
)

__all__ = [
    "acf",
    "acf_plot",
    "conf_bound",
    "corr_plot_data",
    "ezplot",
    "local_autocorr",
    "pacf",
    "pacf_plot",
    "adf_test",
    "arch_lm",
    "autocorr_pearson",
    "forecast_accuracy",
    "granger_causality",
    "breusch_godfrey",
    "breusch_pagan",
    "durbin_watson",
    "kpss_test",
    "ljung_box",
    "mackinnon_p",
    "runs_test",
    "variance_ratio",
]
