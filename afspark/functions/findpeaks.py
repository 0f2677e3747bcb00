"""Peak finding with `height` / `distance` selection.

The reference uses FindPeaks1D.jl (itself modeled on scipy.signal.find_peaks)
at /root/reference/src/AcousticFeatures.jl:298,302,414.  This is an
independent numpy implementation of the published algorithm:

1. local maxima with plateau handling (plateau midpoint reported),
2. keep peaks with value >= height,
3. greedy suppression by descending peak height within `distance`
   (strictly-less-than comparison; distance <= 0 is a no-op, matching the
   reference's trunc(Int, tdist*fs) == 0 case at runtests.jl:208-213).
"""

from __future__ import annotations

import numpy as np


def local_maxima(x: np.ndarray) -> np.ndarray:
    """0-based indices of local maxima; plateaus report their midpoint."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    peaks: list[int] = []
    i = 1
    imax = n - 1
    while i < imax:
        if x[i - 1] < x[i]:
            i_ahead = i + 1
            while i_ahead < imax and x[i_ahead] == x[i]:
                i_ahead += 1
            if x[i_ahead] < x[i]:
                peaks.append((i + i_ahead - 1) // 2)
                i = i_ahead
        i += 1
    return np.asarray(peaks, dtype=np.int64)


def select_by_distance(
    peaks: np.ndarray, priority: np.ndarray, distance: int
) -> np.ndarray:
    """Boolean keep-mask: suppress peaks within `distance` of a higher peak."""
    n = len(peaks)
    keep = np.ones(n, dtype=bool)
    order = np.argsort(priority, kind="stable")
    for idx in order[::-1]:
        if not keep[idx]:
            continue
        k = idx - 1
        while k >= 0 and peaks[idx] - peaks[k] < distance:
            keep[k] = False
            k -= 1
        k = idx + 1
        while k < n and peaks[k] - peaks[idx] < distance:
            keep[k] = False
            k += 1
    return keep


def find_peaks(
    x: np.ndarray,
    height: float | None = None,
    distance: int | None = None,
) -> np.ndarray:
    """0-based peak indices after height then distance selection."""
    x = np.asarray(x, dtype=np.float64)
    peaks = local_maxima(x)
    if height is not None and len(peaks):
        peaks = peaks[x[peaks] >= height]
    if distance is not None and distance > 0 and len(peaks):
        keep = select_by_distance(peaks, x[peaks], int(distance))
        peaks = peaks[keep]
    return peaks
