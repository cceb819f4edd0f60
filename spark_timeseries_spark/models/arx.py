"""Models with exogenous regressors: ARX, ARIMAX, Regression-ARIMA.

Reference semantics:

- ARX (``models/AutoregressionX.scala:48-130``): OLS of y on its own lags
  1..yMaxLag and on x lagged 0..xMaxLag (lag 0 included iff
  ``includeOriginalX``); predictors trimmed to rows where every lag exists.
- ARIMAX (``models/ARIMAX.scala:59-87``): ARIMA(p,d,q) error dynamics plus
  the lagged exogenous matrix; we estimate by CSS over the combined
  parameter vector from an ARX + Hannan-Rissanen start.
- RegressionARIMA / Cochrane-Orcutt (``models/RegressionARIMA.scala:35-160``):
  OLS, then iterate (ρ from residual AR(1), quasi-difference, re-fit) until
  ρ moves < 0.001 or maxIter, with the Durbin-Watson stopping short-circuit
  (``:171-176``: DW in (1, 3) → no serial correlation, stop at OLS).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ._numeric import nelder_mead, ols
from .arima import ARIMAModel, difference
from .univariate import lag_matrix


def assemble_arx_predictors(
    y: np.ndarray,
    x: np.ndarray,
    y_max_lag: int,
    x_max_lag: int,
    include_original_x: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Trimmed design matrix [y-lags | x lags] and matching target
    (``AutoregressionX.scala:71-92``)."""
    y = np.asarray(y, dtype=float)
    x = np.atleast_2d(np.asarray(x, dtype=float))
    if x.shape[0] != len(y):
        x = x.T
    m = max(y_max_lag, x_max_lag)
    n = len(y)
    cols = []
    for i in range(1, y_max_lag + 1):
        cols.append(y[m - i : n - i][:, None])
    for j in range(x.shape[1]):
        lags = range(0, x_max_lag + 1) if include_original_x else range(1, x_max_lag + 1)
        for k in lags:
            cols.append(x[m - k : n - k, j][:, None])
    X = np.column_stack(cols)
    return X, y[m:]


@dataclass
class ARXModel:
    c: float
    coefficients: np.ndarray
    y_max_lag: int
    x_max_lag: int
    include_original_x: bool = True

    def predict(self, y: np.ndarray, x: np.ndarray) -> np.ndarray:
        X, _ = assemble_arx_predictors(
            y, x, self.y_max_lag, self.x_max_lag, self.include_original_x
        )
        return self.c + X @ self.coefficients


def fit_arx(
    y: np.ndarray,
    x: np.ndarray,
    y_max_lag: int,
    x_max_lag: int,
    include_original_x: bool = True,
    no_intercept: bool = False,
) -> ARXModel:
    X, target = assemble_arx_predictors(y, x, y_max_lag, x_max_lag, include_original_x)
    coef = ols(X, target, intercept=not no_intercept)
    if no_intercept:
        return ARXModel(0.0, coef, y_max_lag, x_max_lag, include_original_x)
    return ARXModel(float(coef[0]), coef[1:], y_max_lag, x_max_lag, include_original_x)


@dataclass
class ARIMAXModel:
    p: int
    d: int
    q: int
    xreg_max_lag: int
    include_original_xreg: bool
    include_intercept: bool
    coefficients: np.ndarray  # [c?, ar..., ma..., beta...]

    def _split(self):
        i = 1 if self.include_intercept else 0
        c = float(self.coefficients[0]) if self.include_intercept else 0.0
        ar = self.coefficients[i : i + self.p]
        ma = self.coefficients[i + self.p : i + self.p + self.q]
        beta = self.coefficients[i + self.p + self.q :]
        return c, ar, ma, beta

    def _xmat(self, xreg: np.ndarray) -> np.ndarray:
        """Lagged exogenous design, zero-padded at the head so the row count
        matches the (differenced) series."""
        x = np.atleast_2d(np.asarray(xreg, dtype=float))
        if x.shape[1] > x.shape[0]:
            x = x.T
        x = difference(x, 0) if self.d == 0 else np.diff(x, n=self.d, axis=0)
        n = x.shape[0]
        cols = []
        lags = (
            range(0, self.xreg_max_lag + 1)
            if self.include_original_xreg
            else range(1, self.xreg_max_lag + 1)
        )
        for j in range(x.shape[1]):
            for k in lags:
                col = np.concatenate([np.zeros(k), x[: n - k, j]])
                cols.append(col[:, None])
        return np.column_stack(cols) if cols else np.zeros((n, 0))

    def residuals(self, y: np.ndarray, xreg: np.ndarray) -> np.ndarray:
        dy = difference(np.asarray(y, dtype=float), self.d)
        X = self._xmat(xreg)
        c, ar, ma, beta = self._split()
        adj = dy - X @ beta
        n = len(adj)
        e = np.zeros(n)
        for t in range(n):
            pred = c
            for i in range(1, self.p + 1):
                if t - i >= 0:
                    pred += ar[i - 1] * adj[t - i]
            for j in range(1, self.q + 1):
                if t - j >= 0:
                    pred += ma[j - 1] * e[t - j]
            e[t] = adj[t] - pred
        return e

    def css(self, y: np.ndarray, xreg: np.ndarray) -> float:
        e = self.residuals(y, xreg)
        err = e[self.p :]
        return float(err @ err)

    def fitted(self, y: np.ndarray, xreg: np.ndarray) -> np.ndarray:
        """One-step-ahead fitted values on the original scale (d=0 only)."""
        e = self.residuals(y, xreg)
        dy = difference(np.asarray(y, dtype=float), self.d)
        return dy - e


def arimax_start(
    y: np.ndarray,
    xreg: np.ndarray,
    p: int,
    d: int,
    q: int,
    xreg_max_lag: int = 0,
    include_original_xreg: bool = True,
    include_intercept: bool = True,
) -> np.ndarray:
    """Deterministic optimizer start for :func:`fit_arimax`: OLS for
    [c, beta], AR terms from an AR fit of the OLS residuals, zero MA terms
    (``ARIMAX.scala:59-87``). Exposed so fit-improvement certificates can
    evaluate the objective at exactly the optimizer's starting point."""
    y = np.asarray(y, dtype=float)
    proto = ARIMAXModel(
        p, d, q, xreg_max_lag, include_original_xreg, include_intercept,
        np.zeros(0),
    )
    X = proto._xmat(xreg)
    dy = difference(y, d)
    beta0 = ols(X, dy, intercept=include_intercept)
    if include_intercept:
        c0, b0 = float(beta0[0]), beta0[1:]
    else:
        c0, b0 = 0.0, beta0
    resid0 = dy - (c0 + X @ b0)
    ar0 = np.zeros(p)
    if p > 0 and len(resid0) > p + 1:
        arc = ols(lag_matrix(resid0, p), resid0[p:], intercept=False)
        ar0 = np.asarray(arc, dtype=float)
    return np.concatenate(
        [[c0] if include_intercept else [], ar0, np.zeros(q), b0]
    )


def fit_arimax(
    y: np.ndarray,
    xreg: np.ndarray,
    p: int,
    d: int,
    q: int,
    xreg_max_lag: int = 0,
    include_original_xreg: bool = True,
    include_intercept: bool = True,
) -> ARIMAXModel:
    """CSS fit; start = ARX coefficients + zero MA terms
    (``ARIMAX.scala:59-87``)."""
    y = np.asarray(y, dtype=float)
    x0 = arimax_start(
        y, xreg, p, d, q, xreg_max_lag, include_original_xreg, include_intercept
    )

    def obj(params):
        m = ARIMAXModel(
            p, d, q, xreg_max_lag, include_original_xreg, include_intercept, params
        )
        return m.css(y, xreg)

    # same budget rationale as fit_arima: 1e-8 relative simplex spread is
    # well inside the reference's own assertion tolerances
    best = nelder_mead(obj, x0, step=0.05, max_iter=1500, tol=1e-8)
    return ARIMAXModel(
        p, d, q, xreg_max_lag, include_original_xreg, include_intercept, best
    )


@dataclass
class RegressionARIMAModel:
    beta: np.ndarray  # [intercept, coefs...]
    rho: float
    dw: float
    iterations: int
    dw0: float = float("nan")  # DW of the initial OLS (the branch statistic)

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, dtype=float))
        if x.shape[1] == len(self.beta) - 1:
            pass
        elif x.shape[0] == len(self.beta) - 1:
            x = x.T
        return self.beta[0] + x @ self.beta[1:]


def fit_regression_arima_cochrane_orcutt(
    y: np.ndarray, regressors: np.ndarray, max_iter: int = 10
) -> RegressionARIMAModel:
    """Cochrane-Orcutt iterated quasi-differencing
    (``RegressionARIMA.scala:83-160``)."""
    from ..stats.tests import durbin_watson

    y = np.asarray(y, dtype=float)
    X = np.atleast_2d(np.asarray(regressors, dtype=float))
    if X.shape[0] != len(y):
        X = X.T
    beta = ols(X, y, intercept=True)
    resid = y - (beta[0] + X @ beta[1:])
    dw0 = durbin_watson(resid)
    if 1.0 < dw0 < 3.0:
        return RegressionARIMAModel(beta, 0.0, dw0, 0, dw0)
    rho = 0.0
    it = 0
    for it in range(1, max_iter + 1):
        rho_new = float(ols(resid[:-1], resid[1:], intercept=False)[0])
        y_star = y[1:] - rho_new * y[:-1]
        X_star = X[1:] - rho_new * X[:-1]
        b = ols(X_star, y_star, intercept=True)
        # transform intercept back: b0* = b0(1-rho)
        beta = np.concatenate([[b[0] / (1.0 - rho_new)], b[1:]])
        resid = y - (beta[0] + X @ beta[1:])
        if abs(rho_new - rho) < 0.001:
            rho = rho_new
            break
        rho = rho_new
    dw = durbin_watson(resid[1:] - rho * resid[:-1])
    return RegressionARIMAModel(beta, rho, dw, it, dw0)
