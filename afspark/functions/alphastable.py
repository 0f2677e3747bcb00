"""Alpha-stable quantile estimation (McCulloch) + CMS sampling.

The reference calls AlphaStableDistributions.jl's ``fit(AlphaStable, x)`` /
``fit(SymmetricAlphaStable, x)`` (McCulloch 1986 quantile method) at
/root/reference/src/AcousticFeatures.jl:452 and src/utils.jl:34.  This is an
independent implementation from the published method:

  J. H. McCulloch, "Simple consistent estimators of stable distribution
  parameters", Commun. Stat. Simul. Comput. 15 (1986).

``fit_symmetric_alpha_stable`` uses the beta=0 column (the reference's
SymmetricAlphaStableStats path, fit(SymmetricAlphaStable, x));
``fit_alpha_stable_full`` implements the full 2-D tables — alpha AND beta
from (nu_alpha, nu_beta), scale and location from the (alpha, beta) grid —
matching the reference's Myriad path (fit(AlphaStable, x), utils.jl:34)
on skewed data.  The table values are McCulloch's published Tables I-V
(the same constants appear in scipy.stats.levy_stable._fitstart and
AlphaStableDistributions.jl).  Sampling uses the Chambers–Mallows–Stuck
algorithm, including the skewed (beta != 0) form for test fixtures.
"""

from __future__ import annotations

import numpy as np

# McCulloch Table: nu_alpha = (q95-q05)/(q75-q25) -> alpha, at beta = 0.
_NU_ALPHA = np.array(
    [2.439, 2.5, 2.6, 2.7, 2.8, 3.0, 3.2, 3.5, 4.0, 5.0, 6.0, 8.0, 10.0, 15.0, 25.0]
)
_ALPHA_AT_NU = np.array(
    [2.000, 1.916, 1.808, 1.729, 1.664, 1.563, 1.484, 1.391, 1.279, 1.128,
     1.029, 0.896, 0.818, 0.698, 0.593]
)
# McCulloch Table: alpha -> nu_c = (q75-q25)/c, at beta = 0.
_ALPHA_GRID = np.array(
    [2.0, 1.9, 1.8, 1.7, 1.6, 1.5, 1.4, 1.3, 1.2, 1.1, 1.0, 0.9, 0.8, 0.7, 0.6, 0.5]
)
_NU_C = np.array(
    [1.908, 1.914, 1.921, 1.927, 1.933, 1.939, 1.946, 1.955, 1.965, 1.980,
     2.000, 2.040, 2.098, 2.189, 2.337, 2.588]
)


def fit_symmetric_alpha_stable(x: np.ndarray) -> tuple[float, float]:
    """McCulloch quantile estimates (alpha, scale) assuming beta = 0."""
    x = np.asarray(x, dtype=np.float64).ravel()
    q05, q25, q75, q95 = np.percentile(x, [5.0, 25.0, 75.0, 95.0])
    iqr = q75 - q25
    if iqr <= 0:
        return 2.0, 0.0
    nu_alpha = (q95 - q05) / iqr
    nu_alpha = float(np.clip(nu_alpha, _NU_ALPHA[0], _NU_ALPHA[-1]))
    alpha = float(np.interp(nu_alpha, _NU_ALPHA, _ALPHA_AT_NU))
    alpha = float(np.clip(alpha, 0.5, 2.0))
    # _ALPHA_GRID is descending; np.interp needs ascending x.
    nu_c = float(np.interp(alpha, _ALPHA_GRID[::-1], _NU_C[::-1]))
    scale = iqr / nu_c
    return alpha, scale


# ---------------------------------------------------------------------------
# full McCulloch (alpha, beta) tables — Tables I-V of McCulloch 1986
# ---------------------------------------------------------------------------

_NU_BETA = np.array([0.0, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0])

# Table I: alpha = psi_1(nu_alpha, |nu_beta|).  Rows: _NU_ALPHA (15),
# cols: _NU_BETA (7).  Column 0 equals _ALPHA_AT_NU above.
_PSI1 = np.array([
    [2.000, 2.000, 2.000, 2.000, 2.000, 2.000, 2.000],
    [1.916, 1.924, 1.924, 1.924, 1.924, 1.924, 1.924],
    [1.808, 1.813, 1.829, 1.829, 1.829, 1.829, 1.829],
    [1.729, 1.730, 1.737, 1.745, 1.745, 1.745, 1.745],
    [1.664, 1.663, 1.663, 1.668, 1.676, 1.676, 1.676],
    [1.563, 1.560, 1.553, 1.548, 1.547, 1.547, 1.547],
    [1.484, 1.480, 1.471, 1.460, 1.448, 1.438, 1.438],
    [1.391, 1.386, 1.378, 1.364, 1.337, 1.318, 1.318],
    [1.279, 1.273, 1.266, 1.250, 1.210, 1.184, 1.150],
    [1.128, 1.121, 1.114, 1.101, 1.067, 1.027, 0.973],
    [1.029, 1.021, 1.014, 1.004, 0.974, 0.935, 0.874],
    [0.896, 0.892, 0.887, 0.883, 0.855, 0.823, 0.769],
    [0.818, 0.812, 0.806, 0.801, 0.780, 0.756, 0.691],
    [0.698, 0.695, 0.692, 0.689, 0.676, 0.656, 0.597],
    [0.593, 0.590, 0.588, 0.586, 0.579, 0.563, 0.513],
])

# Table II: beta = sign(nu_beta) * psi_2(nu_alpha, |nu_beta|).  The 1.0
# entries are McCulloch's out-of-range fillers (estimate clipped to |1|).
_PSI2 = np.array([
    [0.0, 2.160, 1.000, 1.000, 1.000, 1.000, 1.000],
    [0.0, 1.592, 3.390, 1.000, 1.000, 1.000, 1.000],
    [0.0, 0.759, 1.800, 1.000, 1.000, 1.000, 1.000],
    [0.0, 0.482, 1.048, 1.694, 1.000, 1.000, 1.000],
    [0.0, 0.360, 0.760, 1.232, 2.229, 1.000, 1.000],
    [0.0, 0.253, 0.518, 0.823, 1.575, 1.000, 1.000],
    [0.0, 0.203, 0.410, 0.632, 1.244, 1.906, 1.000],
    [0.0, 0.165, 0.332, 0.499, 0.943, 1.560, 1.000],
    [0.0, 0.136, 0.271, 0.404, 0.689, 1.230, 2.195],
    [0.0, 0.109, 0.216, 0.323, 0.539, 0.827, 1.917],
    [0.0, 0.096, 0.190, 0.284, 0.472, 0.693, 1.759],
    [0.0, 0.082, 0.163, 0.243, 0.412, 0.601, 1.596],
    [0.0, 0.074, 0.147, 0.220, 0.377, 0.546, 1.482],
    [0.0, 0.064, 0.128, 0.191, 0.330, 0.478, 1.362],
    [0.0, 0.056, 0.112, 0.167, 0.285, 0.428, 1.274],
])

_BETA_GRID = np.array([0.0, 0.25, 0.5, 0.75, 1.0])

# Table III: (q75-q25)/c = psi_3(alpha, |beta|).  Rows: _ALPHA_GRID
# (descending 2.0..0.5), cols: _BETA_GRID.  Column 0 equals _NU_C above.
_PSI3 = np.array([
    [1.908, 1.908, 1.908, 1.908, 1.908],
    [1.914, 1.915, 1.916, 1.918, 1.921],
    [1.921, 1.922, 1.927, 1.936, 1.947],
    [1.927, 1.930, 1.943, 1.961, 1.987],
    [1.933, 1.940, 1.962, 1.997, 2.043],
    [1.939, 1.952, 1.988, 2.045, 2.116],
    [1.946, 1.967, 2.022, 2.106, 2.211],
    [1.955, 1.984, 2.067, 2.188, 2.333],
    [1.965, 2.007, 2.125, 2.294, 2.491],
    [1.980, 2.040, 2.205, 2.435, 2.696],
    [2.000, 2.085, 2.311, 2.624, 2.973],
    [2.040, 2.149, 2.461, 2.886, 3.356],
    [2.098, 2.244, 2.676, 3.265, 3.912],
    [2.189, 2.392, 3.004, 3.844, 4.775],
    [2.337, 2.634, 3.542, 4.808, 6.247],
    [2.588, 3.073, 4.534, 6.636, 9.144],
])

# Table V: (zeta - q50)/c = psi_5(alpha, |beta|) * sign(beta).
_PSI5 = np.array([
    [0.0, 0.000, 0.000, 0.000, 0.000],
    [0.0, -0.017, -0.032, -0.049, -0.064],
    [0.0, -0.030, -0.061, -0.092, -0.123],
    [0.0, -0.043, -0.088, -0.132, -0.179],
    [0.0, -0.056, -0.111, -0.170, -0.232],
    [0.0, -0.066, -0.134, -0.206, -0.283],
    [0.0, -0.075, -0.154, -0.241, -0.335],
    [0.0, -0.084, -0.173, -0.276, -0.390],
    [0.0, -0.090, -0.192, -0.310, -0.447],
    [0.0, -0.095, -0.208, -0.346, -0.508],
    [0.0, -0.098, -0.223, -0.380, -0.576],
    [0.0, -0.099, -0.237, -0.424, -0.652],
    [0.0, -0.096, -0.250, -0.469, -0.742],
    [0.0, -0.089, -0.262, -0.520, -0.853],
    [0.0, -0.078, -0.272, -0.581, -0.997],
    [0.0, -0.061, -0.279, -0.659, -1.198],
])


def _bilinear(xgrid: np.ndarray, ygrid: np.ndarray, table: np.ndarray,
              x: float, y: float) -> float:
    """Bilinear interpolation on an ascending (xgrid, ygrid) table with
    clipping to the grid boundary (McCulloch's prescription)."""
    x = float(np.clip(x, xgrid[0], xgrid[-1]))
    y = float(np.clip(y, ygrid[0], ygrid[-1]))
    # interpolate every column at x, then along y
    col_vals = np.array([
        np.interp(x, xgrid, table[:, j]) for j in range(table.shape[1])
    ])
    return float(np.interp(y, ygrid, col_vals))


def fit_alpha_stable_full(x: np.ndarray) -> tuple[float, float, float, float]:
    """Full McCulloch quantile fit: (alpha, beta, scale, location).

    Matches the reference's ``fit(AlphaStable, x)`` path (utils.jl:34):
    alpha and beta interpolated from Tables I/II on (nu_alpha, |nu_beta|),
    scale from Table III on (alpha, |beta|), location = q50 + c*psi_5
    (Table V; S1-parameterization shift).
    """
    x = np.asarray(x, dtype=np.float64).ravel()
    q05, q25, q50, q75, q95 = np.percentile(x, [5.0, 25.0, 50.0, 75.0, 95.0])
    iqr = q75 - q25
    span = q95 - q05
    if iqr <= 0 or span <= 0:
        return 2.0, 0.0, 0.0, float(q50)
    nu_alpha = span / iqr
    nu_beta = (q95 + q05 - 2.0 * q50) / span
    s = 1.0 if nu_beta >= 0 else -1.0
    alpha = _bilinear(_NU_ALPHA, _NU_BETA, _PSI1, nu_alpha, abs(nu_beta))
    alpha = float(np.clip(alpha, 0.5, 2.0))
    beta = s * _bilinear(_NU_ALPHA, _NU_BETA, _PSI2, nu_alpha, abs(nu_beta))
    beta = float(np.clip(beta, -1.0, 1.0))
    if alpha == 2.0:
        beta = 0.0  # skew is unidentifiable at the Gaussian endpoint
    # _ALPHA_GRID is descending; _bilinear needs ascending xgrid
    ag = _ALPHA_GRID[::-1]
    c = iqr / _bilinear(ag, _BETA_GRID, _PSI3[::-1], alpha, abs(beta))
    zeta = float(q50 + c * s * _bilinear(ag, _BETA_GRID, _PSI5[::-1], alpha, abs(beta)))
    return alpha, beta, float(c), zeta


def fit_alpha_stable(x: np.ndarray) -> tuple[float, float]:
    """(alpha, scale) via the FULL McCulloch fit (beta estimated, not
    assumed 0) — the reference's Myriad path fits AlphaStable, not
    SymmetricAlphaStable (src/utils.jl:33-36), so skewed windows get the
    correct alpha/scale here too."""
    alpha, _beta, scale, _loc = fit_alpha_stable_full(x)
    return alpha, scale


def myriad_constant(alpha: float, scale: float) -> float:
    """(alpha/(2-alpha+eps))*scale^2 — src/utils.jl:26-28 semantics."""
    eps = float(np.finfo(np.float64).eps)
    return (alpha / (2.0 - alpha + eps)) * (scale**2)


def rand_symmetric_alpha_stable(
    rng: np.random.Generator, alpha: float, scale: float, size: int
) -> np.ndarray:
    """Chambers–Mallows–Stuck sampler for symmetric alpha-stable draws."""
    u = rng.uniform(-np.pi / 2, np.pi / 2, size)
    w = rng.exponential(1.0, size)
    if abs(alpha - 1.0) < 1e-12:
        return scale * np.tan(u)
    s = (
        np.sin(alpha * u)
        / np.cos(u) ** (1.0 / alpha)
        * (np.cos(u - alpha * u) / w) ** ((1.0 - alpha) / alpha)
    )
    return scale * s


def rand_alpha_stable(
    rng: np.random.Generator, alpha: float, beta: float, scale: float, size: int
) -> np.ndarray:
    """General CMS sampler, S1 parameterization (both branches; used for
    skewed test fixtures).  alpha == 1 uses the Chambers–Mallows–Stuck
    logarithmic form x = (2/pi)[(pi/2 + b*u)tan(u)
    - b*ln((pi/2*w*cos u)/(pi/2 + b*u))]."""
    if abs(alpha - 1.0) < 1e-9:
        u = rng.uniform(-np.pi / 2, np.pi / 2, size)
        w = rng.exponential(1.0, size)
        hp = np.pi / 2.0
        x = (1.0 / hp) * (
            (hp + beta * u) * np.tan(u)
            - beta * np.log((hp * w * np.cos(u)) / (hp + beta * u))
        )
        # S1 scaling at alpha == 1 is NOT pure multiplication: if X is
        # standard S1(1, beta), then sigma*X + (2/pi)*beta*sigma*ln(sigma)
        # ~ S1(1, beta, sigma) (Weron 1996, eq. for alpha = 1)
        return scale * x + (1.0 / hp) * beta * scale * np.log(scale)
    u = rng.uniform(-np.pi / 2, np.pi / 2, size)
    w = rng.exponential(1.0, size)
    t = beta * np.tan(np.pi * alpha / 2.0)
    b = np.arctan(t) / alpha
    s0 = (1.0 + t * t) ** (1.0 / (2.0 * alpha))
    x = (
        s0
        * np.sin(alpha * (u + b))
        / np.cos(u) ** (1.0 / alpha)
        * (np.cos(u - alpha * (u + b)) / w) ** ((1.0 - alpha) / alpha)
    )
    return scale * x
