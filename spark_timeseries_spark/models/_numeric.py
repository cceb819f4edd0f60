"""Pure-numpy numeric kernels: optimizers and special functions.

scipy/statsmodels are not available in the runtime, so the model estimators
(reference: commons-math ``NonLinearConjugateGradientOptimizer`` and
``BOBYQAOptimizer``) are backed by these implementations:

- :func:`minimize_cg` — Fletcher-Reeves / Polak-Ribière nonlinear conjugate
  gradient with Armijo backtracking (the reference fits EWMA/GARCH/ARIMA via
  FR-CG with analytic gradients, e.g. ``models/EWMA.scala:45-69``).
- :func:`nelder_mead` — derivative-free simplex for the BOBYQA use-sites
  (Holt-Winters ``models/HoltWinters.scala:104-119``, ARIMA BOBYQA path),
  with box-constraint support via clipping.
- :func:`chi2_sf` / :func:`norm_cdf` — p-value tails for the statistical
  tests (χ² via regularized incomplete gamma, series + continued fraction).

All functions are deterministic and driver/executor-safe (no global state).
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# special functions
# ---------------------------------------------------------------------------

def norm_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _gamma_series(a: float, x: float) -> float:
    """Lower regularized incomplete gamma P(a,x) by series expansion."""
    ap = a
    total = 1.0 / a
    delta = total
    for _ in range(500):
        ap += 1.0
        delta *= x / ap
        total += delta
        if abs(delta) < abs(total) * 1e-15:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a: float, x: float) -> float:
    """Upper regularized incomplete gamma Q(a,x) by continued fraction."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("invalid gammainc args")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(x: float, df: float) -> float:
    """Survival function of the χ² distribution."""
    if x <= 0:
        return 1.0
    return gammainc_upper(df / 2.0, x / 2.0)


def _beta_cf(a: float, b: float, x: float) -> float:
    """Modified-Lentz continued fraction for the incomplete beta
    (Lentz 1976; the standard even/odd-term recurrence)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, 500):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b), by the continued fraction
    on whichever side converges fast (split at x = (a+1)/(a+b+2))."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _beta_cf(a, b, x) / a
    return 1.0 - front * _beta_cf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Survival function of Student's t: P(T > t), via
    I_{ν/(ν+t²)}(ν/2, ½)."""
    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    p = 0.5 * betainc_reg(df / 2.0, 0.5, df / (df + t * t))
    return p if t >= 0 else 1.0 - p


def norm_ppf(p: float) -> float:
    """Standard-normal quantile: Acklam's rational approximation
    (~1e-9) plus one Halley refinement against erf → machine precision."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    dd = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2.0 * math.log(p))
        x = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
              * q + c[5])
             / ((((dd[0] * q + dd[1]) * q + dd[2]) * q + dd[3]) * q + 1.0))
    elif p <= phigh:
        q = p - 0.5
        r = q * q
        x = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
              * r + a[5]) * q
             / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
                * r + 1.0))
    else:
        q = math.sqrt(-2.0 * math.log1p(-p))
        x = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
               * q + c[5])
              / ((((dd[0] * q + dd[1]) * q + dd[2]) * q + dd[3]) * q + 1.0))
    # one Halley step: e = Phi(x) - p, u = e / phi(x)
    e = 0.5 * math.erfc(-x / math.sqrt(2.0)) - p
    u = e * math.sqrt(2.0 * math.pi) * math.exp(x * x / 2.0)
    return x - u / (1.0 + x * u / 2.0)


def _t_logpdf(t: float, df: float) -> float:
    return (
        math.lgamma((df + 1.0) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
        - (df + 1.0) / 2.0 * math.log1p(t * t / df)
    )


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile: Newton on the exact CDF (``t_sf``) from a
    normal-quantile start, bisection-safeguarded. Converges to machine
    precision in a handful of steps for any df ≥ 1."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, df)
    sf_target = 1.0 - p
    # bracket [lo, hi] with t_sf(hi) <= sf_target <= t_sf(lo)
    lo, hi = 0.0, max(2.0, abs(norm_ppf(p)) * 2.0)
    while t_sf(hi, df) > sf_target:
        lo, hi = hi, hi * 4.0
        if hi > 1e12:  # pragma: no cover — p astronomically close to 1
            break
    x = min(max(norm_ppf(p), lo), hi)
    for _ in range(60):
        fx = t_sf(x, df) - sf_target
        step = fx / math.exp(_t_logpdf(x, df))  # sf' = -pdf
        x_new = x + step
        if not lo < x_new < hi:  # safeguard: bisect
            if fx > 0.0:
                lo = x
            else:
                hi = x
            x_new = 0.5 * (lo + hi)
        if abs(x_new - x) <= 1e-14 * max(1.0, abs(x)):
            return x_new
        x = x_new
    return x


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------

def _armijo(f, x, fx, g, d, alpha0=1.0, c1=1e-4, shrink=0.5, max_steps=40):
    """Backtracking line search along direction d; returns (alpha, x_new, f_new)."""
    slope = float(np.dot(g, d))
    alpha = alpha0
    for _ in range(max_steps):
        x_new = x + alpha * d
        f_new = f(x_new)
        if np.isfinite(f_new) and f_new <= fx + c1 * alpha * slope:
            return alpha, x_new, f_new
        alpha *= shrink
    return 0.0, x, fx


def minimize_cg(
    f,
    grad,
    x0,
    max_iter: int = 500,
    tol: float = 1e-9,
    variant: str = "fletcher-reeves",
):
    """Nonlinear conjugate gradient minimization with analytic gradient.

    Returns the argmin array. Restarts the direction every len(x0)·4 steps or
    when the computed direction is not a descent direction."""
    x = np.asarray(x0, dtype=float).copy()
    fx = f(x)
    g = np.asarray(grad(x), dtype=float)
    d = -g
    n = len(x)
    since_restart = 0
    for _ in range(max_iter):
        if np.linalg.norm(g) < tol:
            break
        if np.dot(g, d) >= 0 or since_restart > 4 * max(n, 2):
            d = -g
            since_restart = 0
        alpha, x_new, f_new = _armijo(f, x, fx, g, d)
        if alpha == 0.0 or abs(fx - f_new) <= tol * (abs(fx) + tol):
            x, fx = x_new, f_new
            break
        g_new = np.asarray(grad(x_new), dtype=float)
        if variant == "polak-ribiere":
            beta = max(0.0, float(np.dot(g_new, g_new - g) / np.dot(g, g)))
        else:
            beta = float(np.dot(g_new, g_new) / np.dot(g, g))
        d = -g_new + beta * d
        x, fx, g = x_new, f_new, g_new
        since_restart += 1
    return x


def nelder_mead(
    f,
    x0,
    bounds=None,
    max_iter: int = 2000,
    tol: float = 1e-10,
    step: float = 0.1,
):
    """Derivative-free simplex minimization (bounded via clipping)."""
    x0 = np.asarray(x0, dtype=float)
    n = len(x0)
    lo = np.full(n, -np.inf)
    hi = np.full(n, np.inf)
    if bounds is not None:
        lo = np.array([b[0] if b[0] is not None else -np.inf for b in bounds])
        hi = np.array([b[1] if b[1] is not None else np.inf for b in bounds])

    if bounds is None:
        # identity fast path: np.clip against ±inf costs ~10µs per call and
        # sits inside every objective eval
        def clip(x):
            return x

    else:
        def clip(x):
            return np.clip(x, lo, hi)

    def fc(x):
        v = f(clip(x))
        return v if np.isfinite(v) else 1e300

    simplex = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] += step if p[i] + step <= hi[i] else -step
        simplex.append(p)
    simplex = np.array([clip(p) for p in simplex])
    fvals = np.array([fc(p) for p in simplex])

    for _ in range(max_iter):
        order = np.argsort(fvals)
        simplex, fvals = simplex[order], fvals[order]
        if abs(fvals[-1] - fvals[0]) <= tol * (abs(fvals[0]) + tol):
            break
        centroid = simplex[:-1].mean(axis=0)
        worst = simplex[-1]
        xr = clip(centroid + (centroid - worst))
        fr = fc(xr)
        if fr < fvals[0]:
            xe = clip(centroid + 2.0 * (centroid - worst))
            fe = fc(xe)
            simplex[-1], fvals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        else:
            xc = clip(centroid + 0.5 * (worst - centroid))
            fcv = fc(xc)
            if fcv < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fcv
            else:
                best = simplex[0]
                for i in range(1, n + 1):
                    simplex[i] = clip(best + 0.5 * (simplex[i] - best))
                    fvals[i] = fc(simplex[i])
    return simplex[np.argmin(fvals)]


def ols(X: np.ndarray, y: np.ndarray, intercept: bool = True) -> np.ndarray:
    """Least-squares fit; returns [c, b1..bk] (c first when intercept)."""
    X = np.asarray(X, dtype=float)
    if X.ndim == 1:
        X = X[:, None]
    if intercept:
        X = np.column_stack([np.ones(len(X)), X])
    coef, *_ = np.linalg.lstsq(X, np.asarray(y, dtype=float), rcond=None)
    return coef
