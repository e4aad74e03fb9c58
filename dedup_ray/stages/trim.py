"""M5 — interval trim + output stats (reference
``Contig.get_non_duplicated_sequence``, ``/root/reference/dedup/
contig.py:134-191`` and the stats tail ``dedup.py:177-187``).

Branch semantics preserved exactly:
  * no intervals -> full text kept, stats (0, tdk, 0, tndk);
  * any interval with end - start == len(text) -> whole doc removed,
    stats (tdk, tdk, tndk, tndk);
  * else 5' start = max end over intervals CONTAINING 0 (``0 in interval`` —
    either endpoint!), 3' end = min start over intervals containing len;
    interior intervals are ignored by the trim (contig.py:168-178);
  * kept only if strictly longer than min_doc_len; otherwise removed AND the
    stats claim full removal (contig.py:188-191 quirk preserved).

tdk/tndk count dup / unique shingle POSTINGS (the reference's depth sums,
without reproducing its double-increment bug at dedup.py:400-405 — ratios
are unaffected; deviation documented).
"""

from __future__ import annotations

import numpy as np

from .chain import range_sum

EPS = 1e-6  # dedup.py:183


def trim_text(
    text: str,
    intervals: list[tuple[int, int]],
    dup_pos: np.ndarray,
    uniq_pos: np.ndarray,
    min_doc_len: int,
) -> tuple[str, list]:
    """Returns (kept_text, [removed_dup, total_dup, removed_ndup, total_ndup])."""
    n = len(text)
    tdk = int(len(dup_pos))
    tndk = int(len(uniq_pos))
    if not intervals:
        return text, [0, tdk, 0, tndk]
    for start, end in intervals:
        if end - start == n:
            return "", [tdk, tdk, tndk, tndk]
    start = 0
    for iv in intervals:
        if 0 in iv and iv[1] > start:
            start = iv[1]
    end = n
    for iv in intervals:
        if n in iv and iv[0] < end:
            end = iv[0]
    removed_dup = range_sum(dup_pos, 0, start) + range_sum(dup_pos, end, n)
    removed_ndup = range_sum(uniq_pos, 0, start) + range_sum(uniq_pos, end, n)
    kept = text[start:end]
    if len(kept) > min_doc_len:
        return kept, [removed_dup, tdk, removed_ndup, tndk]
    return "", [tdk, tdk, tndk, tndk]


def dnd_ratio(dup_pos: np.ndarray, uniq_pos: np.ndarray, n: int) -> np.ndarray:
    """Per-position dup/non-dup score (``Contig.calculate_dnd_ratio``,
    ``contig.py:53-76``): depth difference, NaN where neither class has a
    posting.  Depths here are posting counts per position (0/1 per class)."""
    dup_depth = np.bincount(dup_pos, minlength=n).astype(np.float64)
    uniq_depth = np.bincount(uniq_pos, minlength=n).astype(np.float64)
    out = dup_depth - uniq_depth
    out[(dup_depth == 0) & (uniq_depth == 0)] = np.nan
    return out


def moving_average(data: np.ndarray, window: int) -> np.ndarray:
    """Block (non-sliding) nanmean per window (``contig.py:88-97``)."""
    out = []
    with np.errstate(invalid="ignore"):
        for i in range(0, len(data), window):
            out.append(np.nanmean(data[i : i + window]))
    return np.array(out)


def plot_dnd_ratio(url: str, dnd: np.ndarray, out_dir: str, window: int = 10000):
    """S14 plot sink (``contig.plot_dnd_ratio``): optional — matplotlib is
    not in this environment, so this gates on import and no-ops otherwise."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    import os

    ma = moving_average(dnd, window)
    pos = [i * window for i in range(len(ma))]
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots()
    ax.scatter(pos, ma)
    ax.set_xlabel("Position")
    ax.set_ylabel("Duplication Score")
    path = os.path.join(out_dir, f"{url.replace('/', '_')}_dnd_ratio.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def stats_row(stats: list) -> list[float]:
    """The 3 epsilon-guarded derived ratios (dedup.py:183-187)."""
    removed_dup, tdk, removed_ndup, tndk = stats
    return [
        removed_dup / (tdk + EPS),
        removed_ndup / (tndk + EPS),
        removed_dup / (removed_ndup + EPS),
    ]
