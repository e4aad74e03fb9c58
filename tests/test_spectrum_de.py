"""Parity of the dependency-free grid+LSQ spectrum fit vs a global
differential-evolution optimiser — the scipy-free twin of
``test_spectrum_scipy.py`` so the parity claim executes in THIS container
(scipy is absent here; the scipy variant runs where scipy exists).

``differential_evolution_np`` is the same algorithm family
(Storn & Price rand/1/bin) the reference invokes through
``scipy.optimize.differential_evolution`` (kmer_spectrum.py:182).
"""

import numpy as np
import pytest

from dedup_ray.stages.spectrum import (
    differential_evolution_np,
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


def _de_fit(h):
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

    return differential_evolution_np(loss, bounds, seed=42)


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
def test_grid_fit_loss_close_to_de(mu1, s1, a1, mu2, s2, a2):
    h = preprocess(_bimodal_hist(mu1, s1, a1, mu2, s2, a2), 5, 119)
    ours = fit_bimodal(h)
    ours_loss = _mixture_loss(
        (ours["mu1"], ours["sigma1"], ours["a1"], ours["mu2"], ours["sigma2"], ours["a2"]), h
    )
    _, de_loss = _de_fit(h)
    # the grid fit may not beat the global optimiser, but must be in the same
    # basin: within 3x of the DE residual (absolute floor for ~0 residuals)
    assert ours_loss <= max(de_loss * 3.0, 1e-8)


@pytest.mark.parametrize(
    "mu1,s1,a1,mu2,s2,a2",
    [
        (18, 4, 0.05, 42, 7, 0.03),
        (12, 3, 0.08, 60, 10, 0.02),
    ],
)
def test_band_bounds_close_to_de(mu1, s1, a1, mu2, s2, a2):
    h_raw = _bimodal_hist(mu1, s1, a1, mu2, s2, a2)
    lower, upper = homozygous_bounds(h_raw, 5, 119)

    h = preprocess(h_raw, 5, 119)
    p, _ = _de_fit(h)
    dmu1, ds1, da1, dmu2, ds2, da2 = p
    dfit = {
        "mu1": dmu1, "sigma1": ds1, "a1": da1,
        "mu2": dmu2, "sigma2": ds2, "a2": da2,
    }
    de_lower = int(round(min_between_peaks(dfit)))
    de_upper = int(round(2 * dmu2 + 2 * ds2))
    # reference-derived quantities agree within a small absolute window
    assert abs(lower - de_lower) <= 3
    assert abs(upper - de_upper) <= max(6, int(0.15 * de_upper))


def test_plot_sink_gates_on_matplotlib(tmp_path):
    """The spectrum-fit plot sink (kmer_spectrum.py:197-216 analogue) must
    no-op cleanly when matplotlib is absent and never perturb the band."""
    from dedup_ray.stages.spectrum import (
        df_band_from_histogram,
        fit_bimodal,
        plot_spectrum_fit,
    )

    h_raw = _bimodal_hist(18, 4, 0.05, 42, 7, 0.03)
    rows = [{"df": i, "n_shingles": float(v)} for i, v in enumerate(h_raw) if v > 0]
    band_plain = df_band_from_histogram(rows, 5, 119)
    band_plot = df_band_from_histogram(rows, 5, 119, plot_dir=str(tmp_path))
    assert band_plain == band_plot

    h = preprocess(h_raw, 5, 119)
    path = plot_spectrum_fit(h, fit_bimodal(h), str(tmp_path))
    try:
        import matplotlib  # noqa: F401

        assert path is not None and path.endswith("df_spectrum_fit.png")
        import os

        assert os.path.getsize(path) > 0
    except ImportError:
        assert path is None
