"""T5 — DF-histogram spectrum fit (optional band-derivation path).

Reference: ``/root/reference/dedup/kmer_spectrum.py`` fits a bimodal
Gaussian to the k-mer depth histogram with scipy ``differential_evolution``
(``:146-227``), takes the minimum between the peaks as the homozygous lower
bound and ``round(2*mu1 + 2*sigma2)`` as the upper (``:218-227``), after
flooring depths < min_depth and truncating > max_depth (``:161-172``).

No scipy here: the same bimodal least-squares objective is minimised with a
coarse grid over (mu1, mu2) + moment-based sigmas + linear amplitudes (exact
for fixed mu/sigma), which is deterministic and dependency-free.  The fit is
driver-side on the tiny count-of-counts table (SURVEY.md §2.3 T5); the
config band [2,4] remains the default path.
"""

from __future__ import annotations

import numpy as np


def gauss(x: np.ndarray, mu: float, sigma: float) -> np.ndarray:
    return np.exp(-0.5 * ((x - mu) / max(sigma, 1e-9)) ** 2)


def preprocess(hist: np.ndarray, min_depth: int, max_depth: int) -> np.ndarray:
    """Floor depths < min_depth, truncate > max_depth, normalize
    (kmer_spectrum.py:161-172 semantics)."""
    h = np.asarray(hist, dtype=np.float64).copy()
    h[: min_depth] = 0.0
    h = h[: max_depth + 1]
    total = h.sum()
    return h / total if total > 0 else h


def fit_bimodal(hist: np.ndarray) -> dict:
    """Least-squares bimodal fit: returns mu1 < mu2, sigma1, sigma2, a1, a2.

    Two stages, both deterministic and dependency-free: a coarse (mu1, mu2)
    grid with moment sigmas + closed-form amplitudes to seed, then a seeded
    differential-evolution polish (:func:`differential_evolution_np`) — the
    same global-optimiser family the reference invokes through scipy
    (kmer_spectrum.py:182), so the fit lands in the same basin the reference
    would find (pinned by tests/test_spectrum_de.py, and by
    tests/test_spectrum_scipy.py where scipy exists)."""
    h = np.asarray(hist, dtype=np.float64)
    x = np.arange(len(h), dtype=np.float64)
    support = np.flatnonzero(h > 0)
    if len(support) == 0:
        return {"mu1": 0.0, "sigma1": 1.0, "a1": 0.0, "mu2": 0.0, "sigma2": 1.0, "a2": 0.0}
    lo, hi = support[0], support[-1]
    best = None
    for mu1 in range(lo, hi + 1):
        for mu2 in range(mu1 + 1, hi + 1):
            for s1 in (max(1.0, mu1 / 6), max(1.0, mu1 / 3)):
                for s2 in (max(1.0, mu2 / 6), max(1.0, mu2 / 3)):
                    g1 = gauss(x, mu1, s1)
                    g2 = gauss(x, mu2, s2)
                    # linear least squares for amplitudes (closed form)
                    A = np.stack([g1, g2], axis=1)
                    coef, *_ = np.linalg.lstsq(A, h, rcond=None)
                    a1, a2 = np.maximum(coef, 0.0)
                    resid = ((a1 * g1 + a2 * g2 - h) ** 2).sum()
                    if best is None or resid < best[0]:
                        best = (resid, mu1, s1, a1, mu2, s2, a2)
    grid_resid, mu1, s1, a1, mu2, s2, a2 = best

    def loss(p):
        m1, sg1, am1, m2, sg2, am2 = p
        if m2 <= m1:
            return 1e12
        y = am1 * gauss(x, m1, sg1) + am2 * gauss(x, m2, sg2)
        return float(((y - h) ** 2).sum())

    amax = float(h.max()) * 2
    bounds = [(lo, hi), (0.5, hi), (0.0, amax), (lo, hi), (0.5, hi), (0.0, amax)]
    seed_x = np.array([mu1, s1, min(a1, amax), mu2, s2, min(a2, amax)], dtype=np.float64)
    px, pfun = differential_evolution_np(loss, bounds, seed=42, init=seed_x)
    if pfun < grid_resid:
        mu1, s1, a1, mu2, s2, a2 = px
    return {"mu1": float(mu1), "sigma1": float(s1), "a1": float(a1),
            "mu2": float(mu2), "sigma2": float(s2), "a2": float(a2)}


def min_between_peaks(fit: dict) -> float:
    """Minimum of the fitted mixture between the two peaks
    (kmer_spectrum.py:108-128, bounded scalar minimisation -> fine grid)."""
    xs = np.linspace(fit["mu1"], fit["mu2"], 512)
    y = fit["a1"] * gauss(xs, fit["mu1"], fit["sigma1"]) + fit["a2"] * gauss(
        xs, fit["mu2"], fit["sigma2"]
    )
    return float(xs[np.argmin(y)])


def homozygous_bounds(hist, min_depth: int = 10, max_depth: int = 200) -> tuple[int, int]:
    """Lower = round(min between peaks); upper = round(2*mu1 + 2*sigma2)
    with mu1 = the HIGHER peak mean in reference naming (kmer_spectrum.py:
    218-227 uses the homozygous peak).  Returns (lower, upper)."""
    h = preprocess(np.asarray(hist, dtype=np.float64), min_depth, max_depth)
    fit = fit_bimodal(h)
    lower = int(round(min_between_peaks(fit)))
    upper = int(round(2 * fit["mu2"] + 2 * fit["sigma2"]))
    return lower, upper


def plot_spectrum_fit(hist, fit: dict, out_dir: str):
    """S14 spectrum-fit plot sink (``kmer_spectrum.py:197-216``): bar plot of
    the DF histogram with the fitted bimodal curve overlaid, saved as
    ``df_spectrum_fit.png``.  Optional — matplotlib is not in this
    environment, so this gates on import and no-ops (returns None)
    otherwise, mirroring :func:`dedup_ray.stages.trim.plot_dnd_ratio`."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    import os

    h = np.asarray(hist, dtype=np.float64)
    xs = np.linspace(0, len(h), 1000)
    curve = fit["a1"] * gauss(xs, fit["mu1"], fit["sigma1"]) + fit["a2"] * gauss(
        xs, fit["mu2"], fit["sigma2"]
    )
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(12, 6))
    ax.bar(np.arange(len(h)), h, color="skyblue")
    ax.plot(xs, curve, color="red", label="Fitted Gaussian Curve")
    ax.set_title("Shingle DF histogram")
    ax.set_xlabel("Shingle DF depth")
    ax.set_ylabel("Relative Frequency")
    ax.legend()
    path = os.path.join(out_dir, "df_spectrum_fit.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def differential_evolution_np(
    loss,
    bounds,
    *,
    seed: int = 42,
    popsize: int = 30,
    maxiter: int = 300,
    mutation: float = 0.7,
    recombination: float = 0.9,
    tol: float = 1e-12,
    init: np.ndarray | None = None,
):
    """Dependency-free differential evolution (Storn & Price 1997,
    rand/1/bin) — the same global-optimiser family the reference uses via
    ``scipy.optimize.differential_evolution`` (kmer_spectrum.py:182).  Lets
    the spectrum-fit parity tests execute in environments without scipy.

    Returns (best_x, best_fun)."""
    rng = np.random.default_rng(seed)
    b = np.asarray(bounds, dtype=np.float64)
    d = len(b)
    lo, hi = b[:, 0], b[:, 1]
    pop = rng.uniform(lo, hi, size=(popsize, d))
    if init is not None:
        pop[0] = np.clip(np.asarray(init, dtype=np.float64), lo, hi)
    fit = np.array([loss(x) for x in pop])
    for _ in range(maxiter):
        for i in range(popsize):
            idx = rng.choice(popsize - 1, size=3, replace=False)
            idx[idx >= i] += 1
            a, bb, c = pop[idx]
            mutant = np.clip(a + mutation * (bb - c), lo, hi)
            cross = rng.random(d) < recombination
            cross[rng.integers(d)] = True
            trial = np.where(cross, mutant, pop[i])
            ft = loss(trial)
            if ft <= fit[i]:
                pop[i] = trial
                fit[i] = ft
        if fit.max() - fit.min() <= tol * abs(fit.min()) + 1e-30:
            break
    j = int(np.argmin(fit))
    return pop[j].copy(), float(fit[j])


def df_band_from_histogram(
    df_hist_rows: list[dict], min_depth: int, max_depth: int, plot_dir: str | None = None
):
    """df histogram rows (df, n_shingles) -> (dup_lower, dup_upper) band.

    ``plot_dir``: when set, save the fit-quality plot there
    (``kmer_spectrum.py:197-216`` analogue; no-op without matplotlib)."""
    if not df_hist_rows:
        return None
    max_df = max(r["df"] for r in df_hist_rows)
    hist = np.zeros(max_df + 1)
    for r in df_hist_rows:
        hist[r["df"]] = r["n_shingles"]
    if plot_dir is not None:
        h = preprocess(hist, min_depth, max_depth)
        plot_spectrum_fit(h, fit_bimodal(h), plot_dir)
    return homozygous_bounds(hist, min_depth, max_depth)
