"""Pure-NumPy ECG front-end: bandpass -> R-peak detection -> tachogram.

Re-expresses /root/reference/ecg_processing.py without SciPy (absent in
this environment):

- ``butter_bandpass``: order-N Butterworth band design (analog prototype
  poles -> band transform -> bilinear), scipy.signal.butter semantics
  with Wn normalized to Nyquist (ecg_processing.py:65-70).
- ``filtfilt``: zero-phase forward-backward IIR with odd-extension
  padding and steady-state initial conditions (scipy defaults,
  ecg_processing.py:73).
- ``find_peaks_basic``: scipy.signal.find_peaks subset used at
  ecg_processing.py:134-136 — strict local maxima with plateau
  midpoints, height threshold, greedy-by-height distance pruning.
- ``detect_r_peaks`` / ``compute_rr_intervals`` / ``filter_artifacts``:
  the reference's 'basic' chain (the method its auto-selection falls
  back to when neurokit2/biosppy are unavailable — exactly this
  environment), RR time = second peak (ecg_processing.py:191-197),
  artifact methods threshold|median|iqr each OR'd with the
  physiological bounds (ecg_processing.py:219-240).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Butterworth design
# ---------------------------------------------------------------------------


def butter_bandpass(order: int, low: float, high: float) -> tuple[np.ndarray, np.ndarray]:
    """(b, a) for a Butterworth bandpass; low/high normalized to Nyquist."""
    fs2 = 2.0
    wl = 2.0 * fs2 * np.tan(np.pi * low / fs2)
    wh = 2.0 * fs2 * np.tan(np.pi * high / fs2)
    bw = wh - wl
    w0 = np.sqrt(wl * wh)

    # analog lowpass prototype poles (unit circle, left half-plane)
    k = np.arange(order)
    theta = np.pi * (2 * k + 1) / (2 * order) + np.pi / 2
    p_lp = np.exp(1j * theta)

    # lowpass -> bandpass: each pole p yields roots of s^2 - p*bw*s + w0^2
    p = p_lp * bw / 2.0
    p_bp = np.concatenate([p + np.sqrt(p * p - w0 * w0), p - np.sqrt(p * p - w0 * w0)])
    z_bp = np.zeros(order)  # n zeros at s=0 (plus n at infinity)
    k_bp = bw**order

    # bilinear transform (fs2)
    fs_2x = 2.0 * fs2
    z_d = (fs_2x + z_bp) / (fs_2x - z_bp)
    p_d = (fs_2x + p_bp) / (fs_2x - p_bp)
    # zeros at infinity map to z = -1
    z_d = np.concatenate([z_d, -np.ones(order)])
    k_d = k_bp * np.real(np.prod(fs_2x - z_bp) / np.prod(fs_2x - p_bp))

    b = np.real(k_d * np.poly(z_d))
    a = np.real(np.poly(p_d))
    return b, a


# ---------------------------------------------------------------------------
# IIR filtering
# ---------------------------------------------------------------------------


def lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None):
    """Direct-form II transposed IIR filter (scipy.signal.lfilter).

    Sequential by nature; the per-sample loop touches only the
    (order)-length state vector so it stays tolerable for recordings.
    """
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = max(len(a), len(b))
    bb = np.zeros(n)
    aa = np.zeros(n)
    bb[: len(b)] = b
    aa[: len(a)] = a
    z = np.zeros(n - 1) if zi is None else zi.astype(np.float64).copy()
    y = np.empty_like(x, dtype=np.float64)
    b0 = bb[0]
    b_rest = bb[1:]
    a_rest = aa[1:]
    for i in range(len(x)):
        xi = x[i]
        yi = b0 * xi + z[0]
        y[i] = yi
        z[:-1] = z[1:] + b_rest[:-1] * xi - a_rest[:-1] * yi
        z[-1] = b_rest[-1] * xi - a_rest[-1] * yi
    return y, z


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions (scipy.signal.lfilter_zi)."""
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = max(len(a), len(b))
    bb = np.zeros(n)
    aa = np.zeros(n)
    bb[: len(b)] = b
    aa[: len(a)] = a
    # companion-form solve: (I - A) zi = B, scipy's construction
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -aa[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = bb[1:] - aa[1:] * bb[0]
    zi = np.linalg.solve(np.eye(n - 1) - A, B)
    return zi


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase filtering, scipy defaults (odd padding, padlen =
    3 * max(len(a), len(b)))."""
    x = np.asarray(x, dtype=np.float64)
    padlen = 3 * max(len(a), len(b))
    if x.size <= padlen:
        raise ValueError(f"input too short for filtfilt: {x.size} <= {padlen}")
    # odd extension
    left = 2 * x[0] - x[padlen:0:-1]
    right = 2 * x[-1] - x[-2 : -padlen - 2 : -1]
    ext = np.concatenate([left, x, right])
    zi = lfilter_zi(b, a)
    y, _ = lfilter(b, a, ext, zi * ext[0])
    y = y[::-1]
    y, _ = lfilter(b, a, y, zi * y[0])
    y = y[::-1]
    return y[padlen : padlen + x.size]


# ---------------------------------------------------------------------------
# peak detection
# ---------------------------------------------------------------------------


def find_peaks_basic(x: np.ndarray, height: float, distance: int) -> np.ndarray:
    """scipy.signal.find_peaks subset: strict local maxima (plateau ->
    midpoint), height filter, distance pruning by descending height."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    peaks = []
    i = 1
    while i < n - 1:
        if x[i - 1] < x[i]:
            ahead = i + 1
            while ahead < n - 1 and x[ahead] == x[i]:
                ahead += 1
            if x[ahead] < x[i]:
                peaks.append((i + ahead - 1) // 2)
                i = ahead
                continue
        i += 1
    peaks = np.array([p for p in peaks if x[p] >= height], dtype=np.int64)
    if peaks.size == 0 or distance <= 1:
        return peaks
    # greedy: highest peaks win; neighbors within `distance` are removed
    order = np.argsort(-x[peaks], kind="stable")
    keep = np.ones(peaks.size, dtype=bool)
    pos = peaks
    for idx in order:
        if not keep[idx]:
            continue
        j = idx - 1
        while j >= 0 and pos[idx] - pos[j] < distance:
            keep[j] = False
            j -= 1
        j = idx + 1
        while j < peaks.size and pos[j] - pos[idx] < distance:
            keep[j] = False
            j += 1
    return pos[keep]


# ---------------------------------------------------------------------------
# the reference 'basic' chain
# ---------------------------------------------------------------------------


def detect_r_peaks(
    ecg: np.ndarray,
    sampling_rate: int = 256,
    lowcut: float = 0.5,
    highcut: float = 40.0,
) -> np.ndarray:
    """Bandpass + normalized find_peaks (ecg_processing.py:117-175,
    'basic' method: height = 0.5 * std(normalized) = 0.5, distance =
    0.3 s)."""
    nyq = sampling_rate / 2.0
    b, a = butter_bandpass(4, lowcut / nyq, highcut / nyq)
    filt = filtfilt(b, a, np.asarray(ecg, dtype=np.float64))
    norm = (filt - filt.mean()) / filt.std()
    return find_peaks_basic(norm, height=norm.std() * 0.5, distance=int(0.3 * sampling_rate))


def compute_rr_intervals(r_peaks: np.ndarray, sampling_rate: int = 256):
    """(rr_sec, rr_times): interval timestamp = second peak."""
    if len(r_peaks) < 2:
        return np.array([]), np.array([])
    t = np.asarray(r_peaks, dtype=np.float64) / sampling_rate
    return np.diff(t), t[1:]


def filter_artifacts(
    rr: np.ndarray,
    rr_t: np.ndarray,
    method: str = "threshold",
    min_rr: float = 0.2,
    max_rr: float = 2.0,
):
    """threshold|median|iqr artifact mask, OR'd with physiological bounds."""
    if rr.size == 0:
        return rr, rr_t, np.array([], dtype=bool)
    if method == "threshold":
        mask = (rr < min_rr) | (rr > max_rr)
    elif method == "median":
        med = np.median(rr)
        mad = np.median(np.abs(rr - med))
        mask = np.abs(rr - med) > 3 * mad
    elif method == "iqr":
        q25, q75 = np.percentile(rr, [25, 75])
        iqr = q75 - q25
        mask = (rr < q25 - 1.5 * iqr) | (rr > q75 + 1.5 * iqr)
    else:
        raise ValueError(method)
    mask = mask | (rr < min_rr) | (rr > max_rr)
    return rr[~mask], rr_t[~mask], mask


def ecg_to_tokens(ecg: np.ndarray, sampling_rate: int = 256, artifact_method: str = "threshold") -> np.ndarray:
    """Full front-end: signal -> clean RR -> int-ms tokens (input_hint)."""
    peaks = detect_r_peaks(ecg, sampling_rate)
    rr, rr_t = compute_rr_intervals(peaks, sampling_rate)
    rr, rr_t, _ = filter_artifacts(rr, rr_t, artifact_method)
    return np.rint(rr * 1000.0).astype(np.int32)


def interpolate_artifacts(
    rr: np.ndarray, rr_t: np.ndarray, artifact_mask: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Linear interpolation of artifact RRs at their original timestamps
    (ecg_processing.py:249-280; linear + edge extrapolation)."""
    if rr.size == 0 or np.all(artifact_mask):
        return np.array([]), np.array([])
    clean = ~artifact_mask
    c_rr, c_t = rr[clean], rr_t[clean]
    if c_rr.size < 2:
        return c_rr, c_t
    out = np.interp(rr_t, c_t, c_rr)
    # linear extrapolation beyond the clean range (np.interp clamps)
    lo_slope = (c_rr[1] - c_rr[0]) / (c_t[1] - c_t[0])
    hi_slope = (c_rr[-1] - c_rr[-2]) / (c_t[-1] - c_t[-2])
    before = rr_t < c_t[0]
    after = rr_t > c_t[-1]
    out[before] = c_rr[0] + lo_slope * (rr_t[before] - c_t[0])
    out[after] = c_rr[-1] + hi_slope * (rr_t[after] - c_t[-1])
    return out, rr_t
