"""Pure-NumPy spectral kernels.

SciPy is not available in this environment, so the engine carries its own
implementations:

- ``lombscargle_normalized`` follows the classic Townsend/Press tau-offset
  Lomb-Scargle periodogram with scipy.signal.lombscargle's
  ``normalize=True`` semantics (P *= 2 / (y @ y); y is NOT mean-centered),
  which is what the reference calls at hrv_features.py:131-133.
  DOCUMENTED DIVERGENCE: at grid points where the sampling is exactly
  degenerate (e.g. f = 0.5 for integer beat numbers: sin(w(t-tau)) == 0
  for every t in exact arithmetic), the sin/cos term is a 0/0 whose
  floating-point value is pure rounding noise in any implementation
  (scipy included). The engine pins those terms to 0 via DEGENERATE_TOL,
  making the periodogram well-defined; the only reference bin affected is
  f = 0.5, whose scipy value is itself arbitrary.
- ``LombScargleDesign`` precomputes, per series length, everything that
  depends only on the x-axis. The reference evaluates the periodogram over
  *beat indices 1..N* (hrv_features.py:122), so all windows with the same
  beat count share the same design matrices — the per-window cost drops
  from O(n_freq * n * trig) to two (n_freq x n) mat-vecs. This is the
  engine's main kernel optimization over the reference.
- ``welch_psd`` + ``cubic_interp`` reproduce the reference's fallback path
  (hrv_features.py:174-195): cubic interpolation onto a uniform grid, then
  a Hann-windowed Welch PSD (scipy.signal.welch defaults: nperseg capped,
  50% overlap, constant detrend, density scaling, one-sided).
"""

from __future__ import annotations

import numpy as np

# sum-of-squares below n * DEGENERATE_TOL -> the corresponding quadrature
# term is a degenerate 0/0; pin it to zero (see module docstring).
DEGENERATE_TOL = 1e-24

# ---------------------------------------------------------------------------
# Lomb-Scargle
# ---------------------------------------------------------------------------


def lombscargle_normalized(x: np.ndarray, y: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """Normalized Lomb-Scargle periodogram (scipy-compatible semantics).

    P(w) = 0.5 * [ (sum y cos w(t-tau))^2 / sum cos^2 w(t-tau)
                 + (sum y sin w(t-tau))^2 / sum sin^2 w(t-tau) ] * 2/(y.y)
    with tau(w) = atan2(sum sin 2wt, sum cos 2wt) / (2w).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    omega = np.asarray(omega, dtype=np.float64)

    wt = omega[:, None] * x[None, :]            # (F, N)
    s2 = np.sin(2.0 * wt).sum(axis=1)
    c2 = np.cos(2.0 * wt).sum(axis=1)
    tau = np.arctan2(s2, c2) / (2.0 * omega)

    arg = wt - (omega * tau)[:, None]
    cosv = np.cos(arg)
    sinv = np.sin(arg)

    yc = cosv @ y
    ys = sinv @ y
    cc = np.einsum("ij,ij->i", cosv, cosv)
    ss = np.einsum("ij,ij->i", sinv, sinv)

    tol = x.size * DEGENERATE_TOL
    cterm = np.where(cc > tol, yc * yc / np.where(cc > tol, cc, 1.0), 0.0)
    sterm = np.where(ss > tol, ys * ys / np.where(ss > tol, ss, 1.0), 0.0)
    pgram = 0.5 * (cterm + sterm)
    return pgram * (2.0 / (y @ y))


class LombScargleDesign:
    """x-axis-only precomputation for a fixed (omega, n) pair.

    ``power(y)`` then costs two mat-vecs. Valid because the reference's
    x-axis is always ``1..n`` (beat numbers, hrv_features.py:122).
    """

    __slots__ = ("cosv", "sinv", "cc", "ss", "c_ok", "s_ok")

    def __init__(self, omega: np.ndarray, n: int):
        x = np.arange(1, n + 1, dtype=np.float64)
        wt = omega[:, None] * x[None, :]
        s2 = np.sin(2.0 * wt).sum(axis=1)
        c2 = np.cos(2.0 * wt).sum(axis=1)
        tau = np.arctan2(s2, c2) / (2.0 * omega)
        arg = wt - (omega * tau)[:, None]
        self.cosv = np.cos(arg)
        self.sinv = np.sin(arg)
        cc = np.einsum("ij,ij->i", self.cosv, self.cosv)
        ss = np.einsum("ij,ij->i", self.sinv, self.sinv)
        tol = n * DEGENERATE_TOL
        self.c_ok = cc > tol
        self.s_ok = ss > tol
        self.cc = np.where(self.c_ok, cc, 1.0)
        self.ss = np.where(self.s_ok, ss, 1.0)

    def power(self, y: np.ndarray) -> np.ndarray:
        yc = self.cosv @ y
        ys = self.sinv @ y
        cterm = np.where(self.c_ok, yc * yc / self.cc, 0.0)
        sterm = np.where(self.s_ok, ys * ys / self.ss, 0.0)
        pgram = 0.5 * (cterm + sterm)
        return pgram * (2.0 / (y @ y))


class LSDesignCache:
    """Per-worker cache of LombScargleDesign keyed by series length."""

    def __init__(self, omega: np.ndarray, max_entries: int = 256):
        self.omega = np.asarray(omega, dtype=np.float64)
        self.max_entries = max_entries
        self._cache: dict[int, LombScargleDesign] = {}

    def get(self, n: int) -> LombScargleDesign:
        d = self._cache.get(n)
        if d is None:
            if len(self._cache) >= self.max_entries:
                self._cache.clear()
            d = LombScargleDesign(self.omega, n)
            self._cache[n] = d
        return d


# ---------------------------------------------------------------------------
# Band integration (trapezoid) as a dot product
# ---------------------------------------------------------------------------


def trapz_band_weights(freqs: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Weight vector w s.t. w @ psd == np.trapz(psd[mask], freqs[mask]).

    Band mask is inclusive on both ends (reference hrv_features.py:202).
    Returns an all-zero vector when fewer than 2 grid points fall in the
    band (reference returns 0.0 power, :210-211).
    """
    mask = (freqs >= lo) & (freqs <= hi)
    w = np.zeros_like(freqs)
    idx = np.flatnonzero(mask)
    if idx.size < 2:
        return w
    f = freqs[idx]
    df = np.diff(f)
    w_local = np.zeros(idx.size)
    w_local[:-1] += df / 2.0
    w_local[1:] += df / 2.0
    w[idx] = w_local
    return w


# ---------------------------------------------------------------------------
# Welch fallback (pure NumPy)
# ---------------------------------------------------------------------------


def cubic_interp(x: np.ndarray, y: np.ndarray, xq: np.ndarray) -> np.ndarray:
    """Natural cubic-spline interpolation with linear extrapolation.

    Stand-in for scipy.interpolate.interp1d(kind='cubic',
    fill_value='extrapolate') used at hrv_features.py:187-189.  (scipy
    extrapolates the cubic polynomial; here extrapolation is clamped to the
    end-segment cubic as well, which matches inside the data range and is
    only exercised for the half-sample overhang of the uniform grid.)
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n < 2:
        return np.full_like(np.asarray(xq, dtype=np.float64), y[0] if n else 0.0)
    if n < 4:
        return np.interp(xq, x, y)
    h = np.diff(x)
    # natural spline: solve tridiagonal system for second derivatives m
    a = np.zeros(n)
    b = np.ones(n)
    c = np.zeros(n)
    d = np.zeros(n)
    a[1:-1] = h[:-1]
    b[1:-1] = 2.0 * (h[:-1] + h[1:])
    c[1:-1] = h[1:]
    d[1:-1] = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
    # Thomas algorithm
    for i in range(1, n):
        wfac = a[i] / b[i - 1]
        b[i] -= wfac * c[i - 1]
        d[i] -= wfac * d[i - 1]
    m = np.zeros(n)
    m[-1] = d[-1] / b[-1]
    for i in range(n - 2, -1, -1):
        m[i] = (d[i] - c[i] * m[i + 1]) / b[i]

    xq = np.asarray(xq, dtype=np.float64)
    seg = np.clip(np.searchsorted(x, xq) - 1, 0, n - 2)
    dx = xq - x[seg]
    hs = h[seg]
    t = dx / hs
    return (
        (1 - t) * y[seg]
        + t * y[seg + 1]
        + dx * (xq - x[seg + 1]) / 6.0 * ((1 + t) * m[seg + 1] + (2 - t) * m[seg])
    )


def welch_psd(sig: np.ndarray, fs: float, nperseg: int) -> tuple[np.ndarray, np.ndarray]:
    """One-sided Welch PSD, scipy.signal.welch defaults.

    Hann window, 50% overlap, constant detrend (per-segment mean removal),
    density scaling. Returns (freqs, psd).
    """
    sig = np.asarray(sig, dtype=np.float64)
    n = sig.size
    nperseg = int(min(max(nperseg, 1), n))
    step = max(nperseg - nperseg // 2, 1)
    win = np.hanning(nperseg) if nperseg > 1 else np.ones(1)
    # scipy uses the periodic-equivalent 'hann'; np.hanning is symmetric —
    # scipy's get_window('hann', n) is sym=False. Build periodic hann:
    if nperseg > 1:
        k = np.arange(nperseg)
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / nperseg)
    scale = 1.0 / (fs * (win * win).sum())
    starts = range(0, n - nperseg + 1, step)
    nfreq = nperseg // 2 + 1
    acc = np.zeros(nfreq)
    count = 0
    for s in starts:
        seg = sig[s : s + nperseg]
        seg = seg - seg.mean()
        spec = np.fft.rfft(seg * win)
        p = (spec.real**2 + spec.imag**2) * scale
        if nperseg % 2 == 0:
            p[1:-1] *= 2.0
        else:
            p[1:] *= 2.0
        acc += p
        count += 1
    if count == 0:
        return np.fft.rfftfreq(nperseg, 1.0 / fs), np.zeros(nfreq)
    return np.fft.rfftfreq(nperseg, 1.0 / fs), acc / count
