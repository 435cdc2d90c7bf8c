"""Pure-numpy STL — seasonal-trend decomposition by loess.

The reference's shipped castor detector ``single_metric_anomaly_STL``
(``python/ts-udf/server/udf/sudden_increase_STL3.py:90``) calls
``statsmodels.tsa.seasonal.STL(series, period=3, robust=True)``.
statsmodels is not available in this environment, so this module
implements the ALGORITHM the statsmodels class wraps — Cleveland,
Cleveland, McRae & Terpenning 1990, "STL: A Seasonal-Trend decomposition
procedure based on Loess" (Journal of Official Statistics 6(1)) — from
the paper:

- inner loop: detrend → cycle-subseries loess (span ``n_s``, each
  subseries extended one period both sides) → low-pass (3 moving
  averages + loess span ``n_l``) → seasonal = subseries − low-pass →
  deseasonalize → trend loess (span ``n_t``);
- outer loop: bisquare robustness weights from the remainder
  (h = 6·median|R|), re-entering the inner loop with the weights applied
  to the subseries and trend smoothers;
- defaults from the paper's §4: n_i = 1, n_o = 15 when robust
  (n_i = 2, n_o = 0 otherwise), n_l = smallest odd ≥ n_p,
  n_t = smallest odd ≥ 1.5·n_p / (1 − 1.5/n_s).

Parity is ALGORITHM-level, not bit-level: statsmodels binds the original
Fortran with its own interpolation short-cuts (``jump`` parameters), so
trajectories differ in low-order digits; the detector built on top
(operators/recursive.py ``stl_anomaly``) thresholds on component
mean/std, which is stable under those differences.

Scale: STL runs per series inside the castor ``applyInPandas`` bridge —
work is proportional to series length × spans, embarrassingly parallel
across series, nothing here touches the driver.
"""

from __future__ import annotations

import numpy as np


def _next_odd(x: float) -> int:
    n = int(np.ceil(x))
    return n if n % 2 == 1 else n + 1


def _tricube(u: np.ndarray) -> np.ndarray:
    w = 1.0 - np.clip(u, 0.0, 1.0) ** 3
    return w**3


def _loess_at(
    y: np.ndarray, x0: float, q: int, degree: int, rw: np.ndarray | None
) -> float:
    """Loess estimate of the regularly-spaced series ``y`` at position
    ``x0`` (may be outside [0, n−1] — the paper's subseries extension)."""
    n = len(y)
    q_eff = min(q, n)
    # the q nearest points form a contiguous run on a regular grid
    lo = int(round(x0)) - (q_eff - 1) // 2
    lo = max(0, min(lo, n - q_eff))
    # shift the run while a closer point exists just outside it
    while lo > 0 and abs(lo - 1 - x0) < abs(lo + q_eff - 1 - x0):
        lo -= 1
    while lo + q_eff < n and abs(lo + q_eff - x0) < abs(lo - x0):
        lo += 1
    idx = np.arange(lo, lo + q_eff, dtype=float)
    d = np.abs(idx - x0)
    lam = d.max()
    if q > n:
        lam += (q - n) / 2.0
    if lam <= 0:
        lam = 1.0
    w = _tricube(d / lam)
    if rw is not None:
        w = w * rw[lo : lo + q_eff]
    sw = w.sum()
    if sw <= 0:
        # all neighbourhood weight robust-zeroed: fall back to tricube only
        w = _tricube(d / lam)
        sw = w.sum()
    yy = y[lo : lo + q_eff]
    if degree == 0 or q_eff == 1:
        return float((w * yy).sum() / sw)
    # weighted degree-1 fit evaluated at x0
    xm = (w * idx).sum() / sw
    ym = (w * yy).sum() / sw
    xc = idx - xm
    den = (w * xc * xc).sum()
    if den <= 1e-12 * (idx**2 * w).sum():
        return float(ym)
    b = (w * xc * yy).sum() / den
    return float(ym + b * (x0 - xm))


def _loess(
    y: np.ndarray,
    q: int,
    degree: int = 1,
    rw: np.ndarray | None = None,
    extend: int = 0,
) -> np.ndarray:
    """Smooth the whole series (jump = 1: every position evaluated);
    ``extend`` adds that many positions beyond each end (the subseries
    step smooths onto −1 and n — STL paper step 2).

    Interior positions are VECTORIZED: on a regular grid with odd span
    the q-nearest window is the centered window, so one
    sliding_window_view + row-wise weighted regression covers every
    position with a full symmetric window (a per-position Python loop
    made 100k-point series take minutes). Boundary and extension
    positions — at most q−1+extend per side — fall back to the exact
    single-point evaluator."""
    n = len(y)
    q_eff = min(q, n)
    h = (q_eff - 1) // 2
    xs_lo = np.arange(-extend, min(h, n + extend), dtype=float)
    xs_hi = np.arange(max(n - 1 - h + 1, h), n + extend, dtype=float)
    out = np.empty(n + 2 * extend)
    # interior: positions h .. n-1-h (empty when the series is shorter
    # than the span)
    if q_eff % 2 == 1 and n - 1 - h >= h and q_eff >= 2:
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(y, q_eff)            # (m, q) m=n-q+1
        offs = np.arange(q_eff, dtype=float) - h        # distances to center
        lam = float(h) if h > 0 else 1.0
        if q > n:
            lam += (q - n) / 2.0
        tri = _tricube(np.abs(offs) / lam)
        if rw is not None:
            w = tri[None, :] * sliding_window_view(rw, q_eff)
            sw = w.sum(axis=1)
            dead = sw <= 0
            if dead.any():                              # all-robust-zeroed
                w[dead] = tri
                sw[dead] = tri.sum()
        else:
            w = np.broadcast_to(tri, wins.shape)
            sw = np.full(wins.shape[0], tri.sum())
        if degree == 0 or q_eff == 1:
            est = (w * wins).sum(axis=1) / sw
        else:
            xm = (w * offs).sum(axis=1) / sw
            ym = (w * wins).sum(axis=1) / sw
            xc = offs[None, :] - xm[:, None]
            den = (w * xc * xc).sum(axis=1)
            b = np.divide(
                (w * xc * wins).sum(axis=1), den,
                out=np.zeros_like(den), where=den > 1e-12,
            )
            est = ym + b * (0.0 - xm)                   # evaluate at center
        out[extend + h : extend + n - h] = est
    else:
        xs_lo = np.arange(-extend, n + extend, dtype=float)
        xs_hi = np.empty(0)
    for x0 in xs_lo:
        out[int(x0) + extend] = _loess_at(y, x0, q, degree, rw)
    for x0 in xs_hi:
        out[int(x0) + extend] = _loess_at(y, x0, q, degree, rw)
    return out


def _ma(y: np.ndarray, w: int) -> np.ndarray:
    """Simple moving average, output length len(y) − w + 1."""
    c = np.cumsum(np.concatenate(([0.0], y)))
    return (c[w:] - c[:-w]) / w


def stl_decompose(
    y: np.ndarray,
    period: int,
    seasonal: int = 7,
    robust: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STL → (trend, seasonal, resid), paper defaults (docstring above)."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    n_p = int(period)
    n_s = seasonal if seasonal % 2 == 1 else seasonal + 1
    n_l = _next_odd(n_p)
    n_t = _next_odd(1.5 * n_p / (1.0 - 1.5 / n_s))
    n_i = 1 if robust else 2
    n_o = 15 if robust else 0

    rw = np.ones(n)
    trend = np.zeros(n)
    seasonal_c = np.zeros(n)
    for outer in range(n_o + 1):
        for _ in range(n_i):
            detrended = y - trend
            # cycle-subseries smoothing, each extended one period per side
            c = np.empty(n + 2 * n_p)
            for j in range(n_p):
                sub = detrended[j::n_p]
                sm = _loess(sub, n_s, degree=1, rw=rw[j::n_p], extend=1)
                # sm[k] is the subseries value at cycle position k−1;
                # original index of cycle position k is j + k·n_p, and C
                # is offset by one full period
                c[j::n_p] = sm[: (n + 2 * n_p - j + n_p - 1) // n_p]
            low = _ma(_ma(_ma(c, n_p), n_p), 3)
            low = _loess(low, n_l, degree=1, rw=None)
            seasonal_c = c[n_p : n_p + n] - low
            trend = _loess(y - seasonal_c, n_t, degree=1, rw=rw)
        if outer < n_o:
            r = y - trend - seasonal_c
            h = 6.0 * np.median(np.abs(r))
            if h <= 0:
                rw = np.ones(n)
            else:
                u = np.clip(np.abs(r) / h, 0.0, 1.0)
                rw = (1.0 - u**2) ** 2
    return trend, seasonal_c, y - trend - seasonal_c
