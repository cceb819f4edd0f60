from .correlogram import acf, conf_bound, pacf
from .tests import (
    adf_test,
    autocorr_pearson,
    breusch_godfrey,
    breusch_pagan,
    durbin_watson,
    kpss_test,
    ljung_box,
    mackinnon_p,
)

__all__ = [
    "acf",
    "conf_bound",
    "pacf",
    "adf_test",
    "autocorr_pearson",
    "breusch_godfrey",
    "breusch_pagan",
    "durbin_watson",
    "kpss_test",
    "ljung_box",
    "mackinnon_p",
]
