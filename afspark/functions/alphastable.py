"""Symmetric alpha-stable quantile estimation + CMS sampling.

The reference calls AlphaStableDistributions.jl's ``fit(AlphaStable, x)`` /
``fit(SymmetricAlphaStable, x)`` (McCulloch 1986 quantile method) at
/root/reference/src/AcousticFeatures.jl:452 and src/utils.jl:34.  This is an
independent implementation from the published method:

  J. H. McCulloch, "Simple consistent estimators of stable distribution
  parameters", Commun. Stat. Simul. Comput. 15 (1986).

Only the symmetric (beta=0) column of McCulloch's tables is used; the
reference's own tests exercise symmetric draws only (runtests.jl:53-58,
221-229, atol 0.1).  Sampling uses the Chambers–Mallows–Stuck algorithm.
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


def fit_alpha_stable(x: np.ndarray) -> tuple[float, float]:
    """(alpha, scale) estimate; symmetric McCulloch (beta treated as 0).

    Sufficient for the reference's Myriad path (src/utils.jl:33-36), whose
    own tests draw symmetric data and assert atol=0.1.
    """
    return fit_symmetric_alpha_stable(x)


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
