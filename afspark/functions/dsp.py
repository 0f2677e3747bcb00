"""Minimal DSP primitives matching the conventions the reference relies on.

The reference delegates to DSP.jl / FFTW.jl / SignalAnalysis.jl:

* ``spectrogram(x, n, noverlap; fs, window=hanning)`` — one-sided density
  periodograms per full segment, hop ``n - noverlap``
  (used at /root/reference/src/AcousticFeatures.jl:292,488,713,821).
* ``welch_pgram(x, n, noverlap; fs)`` — rectangular window Welch PSD
  (/root/reference/src/AcousticFeatures.jl:677).
* ``analytic`` / Hilbert envelope (/root/reference/src/utils.jl:54-56).

These are re-implemented on numpy from the public definitions (one-sided
PSD with 1/(fs*sum(w^2)) scaling, interior-bin doubling); no Julia code is
copied.  All functions are pure and operate on 1-D float64 arrays so the
same code runs inside Arrow-batched Spark kernels and in local tests.
"""

from __future__ import annotations

import numpy as np

EPS = float(np.finfo(np.float64).eps)  # == Julia eps(Float64)


def hann_window(n: int) -> np.ndarray:
    """Symmetric Hann window, 0.5*(1 - cos(2*pi*k/(n-1))) — np.hanning."""
    return np.hanning(n)


def _segment_starts(nx: int, n: int, step: int) -> np.ndarray:
    """Start indices (0-based) of full-length segments; ragged tail dropped."""
    if nx < n:
        return np.empty(0, dtype=np.int64)
    return np.arange(0, nx - n + 1, step, dtype=np.int64)


def _onesided_scale(n: int) -> np.ndarray:
    """Doubling factors for one-sided spectra of real input of length n."""
    nf = n // 2 + 1
    scale = np.full(nf, 2.0)
    scale[0] = 1.0
    if n % 2 == 0:
        scale[-1] = 1.0  # Nyquist bin not doubled for even n
    return scale


def spectrogram_power(
    x: np.ndarray,
    n: int,
    noverlap: int,
    fs: float,
    window: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-sided power spectrogram (density scaling).

    Returns ``(power, freqs, times)`` with ``power`` of shape
    ``(n//2+1, nseg)`` — freq x time, matching the reference's orientation.
    Density scaling: |rfft(w*seg)|^2 / (fs * sum(w^2)), interior bins x2.
    Segment times are centered: (start + n/2) / fs.
    """
    x = np.asarray(x, dtype=np.float64)
    step = n - noverlap
    if step <= 0:
        raise ValueError("noverlap must be < n")
    starts = _segment_starts(len(x), n, step)
    if window is None:
        w = np.ones(n)
    else:
        w = np.asarray(window, dtype=np.float64)
    # gather all segments as a (nseg, n) matrix — vectorized rfft
    segs = np.lib.stride_tricks.sliding_window_view(x, n)[starts] * w
    spec = np.fft.rfft(segs, axis=1)
    power = (spec.real**2 + spec.imag**2) / (fs * np.sum(w * w))
    power *= _onesided_scale(n)
    freqs = np.fft.rfftfreq(n, d=1.0 / fs)
    times = (starts + n / 2.0) / fs
    return power.T.copy(), freqs, times


def welch_power(
    x: np.ndarray, n: int, noverlap: int, fs: float
) -> tuple[np.ndarray, np.ndarray]:
    """Welch PSD with rectangular window (reference PSD default).

    Returns ``(power, freqs)``; power has length n//2+1.
    """
    p, freqs, _ = spectrogram_power(x, n, noverlap, fs, window=None)
    return p.mean(axis=1), freqs


def hilbert_analytic(x: np.ndarray) -> np.ndarray:
    """Analytic signal via FFT (standard Hilbert-transform construction)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    xf = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = 1.0
        h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    return np.fft.ifft(xf * h)


def envelope(x: np.ndarray) -> np.ndarray:
    """Hilbert envelope |analytic(x)| (utils.jl:54-56 semantics).

    Scaling note (checked round 2): the reference's envelope wraps
    SignalAnalysis.jl's ``analytic``, whose documented contract is
    ENERGY-PRESERVING — "the conversion preserves energy", i.e.
    rms(analytic(x)) == rms(x) — which means the standard Hilbert
    analytic signal divided by sqrt(2) (its inverse ``real()``
    multiplies by sqrt(2); the round trip is exact).  Matched here: a
    unit-amplitude tone has envelope 1/sqrt(2).  Every reference feature
    consuming the envelope is scale-invariant (ImpulseStats' auto height
    is median+k*MAD of the envelope itself; normalize_envelope divides
    by the envelope sum), so the convention only shows in direct
    envelope() calls and explicit-height ImpulseStats.  Pinned by
    tests/test_kernels.py::test_envelope_energy_preserving_convention.
    """
    return np.abs(hilbert_analytic(x)) / np.sqrt(2.0)


def pow2db(x: np.ndarray | float) -> np.ndarray | float:
    return 10.0 * np.log10(x)


def db2pow(db: float) -> float:
    return 10.0 ** (db / 10.0)


def db2amp(db: float) -> float:
    return 10.0 ** (db / 20.0)
