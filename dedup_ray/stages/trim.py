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


def stats_row(stats: list) -> list[float]:
    """The 3 epsilon-guarded derived ratios (dedup.py:183-187)."""
    removed_dup, tdk, removed_ndup, tndk = stats
    return [
        removed_dup / (tdk + EPS),
        removed_ndup / (tndk + EPS),
        removed_dup / (removed_ndup + EPS),
    ]
