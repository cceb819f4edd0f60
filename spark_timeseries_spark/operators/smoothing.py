"""Polynomial and kernel smoothers over irregular series.

Beyond-reference (the reference smooths only via moving averages and
EWMA): two classic local smoothers —

- :func:`savgol_smooth` — Savitzky-Golay least-squares polynomial
  filtering (Savitzky & Golay 1964): the convolution weights of the
  central point of a degree-p fit over 2m+1 equally-spaced samples.
  Coefficients are derived EXACTLY (rational arithmetic over the
  integer Vandermonde normal equations — ``fractions.Fraction``
  Gaussian elimination), so the same double literals drive the Spark
  plan and the SQL oracle: no linear-algebra library, no
  engine-dependent solve.
- :func:`kernel_smooth` — Nadaraya-Watson regression with a Gaussian
  kernel over TIME (not row count): ŷ(t) = Σwᵢyᵢ/Σwᵢ with
  wᵢ = exp(−((tᵢ−t)/h)²/2), truncated at ±3h. The weight depends on
  the CURRENT row's timestamp, which no plain window aggregate can
  see — the plan collects the ±3h neighborhood with a RANGE-frame
  ``collect_list`` and folds it with ``F.aggregate`` (a Catalyst
  higher-order function: all JVM, no Python). Memory is bounded by
  the bandwidth, not the series.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["savgol_coeffs", "savgol_smooth", "kernel_smooth"]


def savgol_coeffs(window: int, polyorder: int, deriv: int = 0) -> list:
    """Savitzky-Golay convolution coefficients for the CENTER point,
    exact-rational derivation: solve (AᵀA)c = Aᵀe_deriv·deriv! where A
    is the Vandermonde of offsets −m..m, entirely in ``Fraction``
    arithmetic (the normal-equation entries are integer power sums).
    Returns 2m+1 floats ordered offset −m..m. For ``deriv`` > 0 the
    weights estimate the deriv-th derivative (per unit step)."""
    if window < 3 or window % 2 == 0:
        raise ValueError(f"window must be odd and >= 3, got {window}")
    if not 0 <= polyorder < window:
        raise ValueError(
            f"polyorder must be in [0, window), got {polyorder}"
        )
    if not 0 <= deriv <= polyorder:
        raise ValueError(f"deriv must be in [0, polyorder], got {deriv}")
    m = window // 2
    offsets = list(range(-m, m + 1))
    p1 = polyorder + 1
    # normal matrix N[i][j] = sum_k k^(i+j); rhs = deriv! * e_deriv
    n_mat = [
        [Fraction(sum(k ** (i + j) for k in offsets)) for j in range(p1)]
        for i in range(p1)
    ]
    fact = 1
    for i in range(2, deriv + 1):
        fact *= i
    rhs = [Fraction(fact if i == deriv else 0) for i in range(p1)]
    # Gaussian elimination with partial (rational) pivoting — exact
    for col in range(p1):
        piv = max(range(col, p1), key=lambda r: abs(n_mat[r][col]))
        if n_mat[piv][col] == 0:  # pragma: no cover — N is PD
            raise ArithmeticError("singular normal matrix")
        n_mat[col], n_mat[piv] = n_mat[piv], n_mat[col]
        rhs[col], rhs[piv] = rhs[piv], rhs[col]
        for r in range(p1):
            if r != col and n_mat[r][col] != 0:
                f = n_mat[r][col] / n_mat[col][col]
                n_mat[r] = [
                    a - f * b for a, b in zip(n_mat[r], n_mat[col])
                ]
                rhs[r] = rhs[r] - f * rhs[col]
    beta = [rhs[i] / n_mat[i][i] for i in range(p1)]
    # c_k = sum_i beta_i k^i  (the weight the center estimate puts on
    # the sample at offset k)
    return [
        float(sum(beta[i] * Fraction(k) ** i for i in range(p1)))
        for k in offsets
    ]


def savgol_smooth(
    df: DataFrame,
    window: int = 7,
    polyorder: int = 2,
    deriv: int = 0,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Savitzky-Golay smoothing per series → input non-null rows +
    ``savgol`` (the centered degree-``polyorder`` local-fit value, or
    its ``deriv``-th derivative per unit step). INTERIOR-ONLY: rows
    within m = window//2 of either series end emit NULL (no pad modes
    — the reflect/constant edge conventions invent data; callers who
    need edges can fall back to the raw value with ``coalesce``).
    Assumes the unit-step spacing the coefficient derivation is built
    on — resample/fill first on irregular series (use
    :func:`kernel_smooth` for native irregular spacing).

    Plan: one weighted sum of 2m+1 lag/leads on ONE (key, order) sort
    — a single exchange, all JVM; NULL propagation through the sum
    implements the interior gate for free."""
    coeffs = savgol_coeffs(window, polyorder, deriv)
    m = window // 2
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    ws = Window.partitionBy(key_col).orderBy(order_col)
    terms = [
        F.lit(c) * F.lag(v, -k).over(ws)
        for k, c in zip(range(-m, m + 1), coeffs)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return pts.withColumn("savgol", out)


def kernel_smooth(
    df: DataFrame,
    bandwidth_seconds: float = 3600.0,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gaussian Nadaraya-Watson smoother over event TIME → input
    non-null rows + ``n_local`` (neighborhood size) and ``smoothed``:
    ŷ(tᵢ) = Σⱼ wⱼyⱼ / Σⱼ wⱼ over the ±3·bandwidth neighborhood with
    wⱼ = exp(−((tⱼ−tᵢ)/h)²/2) (truncation at 3h discards <1.2% of the
    kernel mass and bounds the frame). The self-weight is 1, so the
    denominator never vanishes. Irregular-spacing native: no grid, no
    fill — the estimator the unit-step smoothers
    (:func:`savgol_smooth`, rolling means) approximate after
    resampling.

    Plan: one RANGE-frame ``collect_list(struct(t, y))`` + an
    ``F.aggregate`` fold (Catalyst higher-order function — JVM, no
    Python) on ONE (key, time) sort; per-row memory is the ±3h
    neighborhood (bandwidth-bounded, documented)."""
    if bandwidth_seconds <= 0:
        raise ValueError(
            f"bandwidth_seconds must be > 0, got {bandwidth_seconds}"
        )
    h = float(bandwidth_seconds)
    reach_us = int(round(3.0 * h * 1e6))  # range frames take integers
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    d = pts.withColumn(
        "_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    wr = (
        Window.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-reach_us, reach_us)
    )
    d = d.withColumn(
        "_nb", F.collect_list(F.struct(F.col("_us"), v)).over(wr)
    )
    t0 = F.col("_us")

    def wexpr(x):
        u = (x["_us"] - t0).cast("double") / F.lit(1e6) / F.lit(h)
        return F.exp(-u * u / 2.0)

    num = F.aggregate(
        F.col("_nb"),
        F.lit(0.0),
        lambda acc, x: acc + wexpr(x) * x[value_col],
    )
    den = F.aggregate(
        F.col("_nb"), F.lit(0.0), lambda acc, x: acc + wexpr(x)
    )
    return (
        d.withColumn("n_local", F.size("_nb"))
        .withColumn("smoothed", num / den)
        .drop("_nb", "_us")
    )
