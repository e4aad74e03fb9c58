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
    """Least-squares bimodal fit: returns mu1 < mu2, sigma1, sigma2, a1, a2."""
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
    _, mu1, s1, a1, mu2, s2, a2 = best
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


def df_band_from_histogram(df_hist_rows: list[dict], min_depth: int, max_depth: int):
    """df histogram rows (df, n_shingles) -> (dup_lower, dup_upper) band."""
    if not df_hist_rows:
        return None
    max_df = max(r["df"] for r in df_hist_rows)
    hist = np.zeros(max_df + 1)
    for r in df_hist_rows:
        hist[r["df"]] = r["n_shingles"]
    return homozygous_bounds(hist, min_depth, max_depth)
