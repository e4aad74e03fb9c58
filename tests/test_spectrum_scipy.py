"""Parity of the dependency-free grid+LSQ spectrum fit vs the reference's
scipy optimisers (``/root/reference/dedup/kmer_spectrum.py:108-128,182``).

scipy is not installed in the build container, so these tests skip locally;
the driver's oracle environment has scipy and runs them.  The check is on the
QUANTITIES the reference derives from the fit — the band bounds and the
mixture loss — with tolerances, since differential_evolution is stochastic
(seeded here) and the two optimisers need not find bit-identical params.
"""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")

from dedup_ray.stages.spectrum import (  # noqa: E402
    fit_bimodal,
    gauss,
    homozygous_bounds,
    min_between_peaks,
    preprocess,
)


def _mixture_loss(params, h):
    mu1, s1, a1, mu2, s2, a2 = params
    x = np.arange(len(h), dtype=np.float64)
    y = a1 * gauss(x, mu1, s1) + a2 * gauss(x, mu2, s2)
    return ((y - h) ** 2).sum()


def _scipy_fit(h):
    from scipy.optimize import differential_evolution

    support = np.flatnonzero(h > 0)
    lo, hi = support[0], support[-1]
    bounds = [
        (lo, hi), (0.5, hi), (0.0, float(h.max()) * 2),
        (lo, hi), (0.5, hi), (0.0, float(h.max()) * 2),
    ]

    def loss(p):
        mu1, s1, a1, mu2, s2, a2 = p
        if mu2 <= mu1:
            return 1e12
        return _mixture_loss(p, h)

    r = differential_evolution(loss, bounds, seed=42, tol=1e-10, maxiter=500)
    return r.x, r.fun


def _bimodal_hist(mu1, s1, a1, mu2, s2, a2, n=120, noise_seed=7):
    x = np.arange(n, dtype=np.float64)
    y = a1 * gauss(x, mu1, s1) + a2 * gauss(x, mu2, s2)
    rng = np.random.default_rng(noise_seed)
    return np.maximum(y + rng.normal(0, a1 * 0.01, n), 0.0)


@pytest.mark.parametrize(
    "mu1,s1,a1,mu2,s2,a2",
    [
        (18, 4, 0.05, 42, 7, 0.03),
        (12, 3, 0.08, 60, 10, 0.02),
        (25, 5, 0.04, 50, 6, 0.04),
    ],
)
def test_grid_fit_loss_close_to_scipy(mu1, s1, a1, mu2, s2, a2):
    h = preprocess(_bimodal_hist(mu1, s1, a1, mu2, s2, a2), 5, 119)
    ours = fit_bimodal(h)
    ours_loss = _mixture_loss(
        (ours["mu1"], ours["sigma1"], ours["a1"], ours["mu2"], ours["sigma2"], ours["a2"]), h
    )
    _, scipy_loss = _scipy_fit(h)
    # the grid fit may not beat the global optimiser, but must be in the same
    # basin: within 3x of the scipy residual (absolute floor for ~0 residuals)
    assert ours_loss <= max(scipy_loss * 3.0, 1e-8)


@pytest.mark.parametrize(
    "mu1,s1,a1,mu2,s2,a2",
    [
        (18, 4, 0.05, 42, 7, 0.03),
        (12, 3, 0.08, 60, 10, 0.02),
    ],
)
def test_band_bounds_close_to_scipy(mu1, s1, a1, mu2, s2, a2):
    h_raw = _bimodal_hist(mu1, s1, a1, mu2, s2, a2)
    lower, upper = homozygous_bounds(h_raw, 5, 119)

    h = preprocess(h_raw, 5, 119)
    p, _ = _scipy_fit(h)
    smu1, ss1, sa1, smu2, ss2, sa2 = p
    sfit = {
        "mu1": smu1, "sigma1": ss1, "a1": sa1,
        "mu2": smu2, "sigma2": ss2, "a2": sa2,
    }
    scipy_lower = int(round(min_between_peaks(sfit)))
    scipy_upper = int(round(2 * smu2 + 2 * ss2))
    # reference-derived quantities agree within a small absolute window
    assert abs(lower - scipy_lower) <= 3
    assert abs(upper - scipy_upper) <= max(6, int(0.15 * scipy_upper))
