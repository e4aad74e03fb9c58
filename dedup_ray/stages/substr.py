"""Suffix-array exact-substring duplicate spans (north_rule: "suffix-array
substring" / reference V3 analogue, SURVEY.md §2 T3/V3 mapping).

Finds, per candidate document pair, the maximal spans of length >=
``min_len`` whose text appears verbatim in the other document — the
web-text re-expression of the reference's minimap2 homologous-interval
discovery (``/root/reference/dedup/dedup.py:437``), and the per-pair
building block of corpus-level long-exact-substring dedup (the
ExactSubstr construction of Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better").

All numpy: suffix array by prefix doubling (O(n log^2 n) lexsorts),
adjacent-suffix LCP by vectorised rank-level descent, per-suffix
max-LCP-to-the-other-document via segmented running minima (the
offset-reset trick), then interval merging.  No Python loop is
proportional to text length.

Distributed shape (``exact_substring_spans`` in pipelines/queries.py):
winnowing fingerprints (window = min_len - k + 1 guarantees any shared
substring of length >= min_len shares a fingerprint) -> fingerprint
bucket groupby -> candidate pairs (bucket-capped) -> per-pair SA spans
inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64


def suffix_array(arr: np.ndarray) -> np.ndarray:
    """Suffix array of an int array by prefix doubling (stable lexsorts)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=_I64)
    order = np.argsort(arr, kind="stable")
    # dense ranks
    sorted_vals = arr[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(sorted_vals[1:], sorted_vals[:-1], out=first[1:])
    rank = np.empty(n, dtype=_I64)
    rank[order] = np.cumsum(first) - 1
    k = 1
    idx = np.arange(n, dtype=_I64)
    while k < n and rank[order[-1]] < n - 1:
        # secondary key: rank of suffix i+k (or -1 past the end)
        key2 = np.full(n, -1, dtype=_I64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, k1 = rank[order], key2[order]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (r1[1:] != r1[:-1]) | (k1[1:] != k1[:-1])
        new_rank = np.empty(n, dtype=_I64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        k *= 2
    return order.astype(_I64)


def _rank_levels(arr: np.ndarray):
    """All prefix-doubling rank arrays [(k, rank_k), ...] for LCP queries."""
    n = len(arr)
    order = np.argsort(arr, kind="stable")
    sorted_vals = arr[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(sorted_vals[1:], sorted_vals[:-1], out=first[1:])
    rank = np.empty(n, dtype=_I64)
    rank[order] = np.cumsum(first) - 1
    levels = [(1, rank)]
    k = 1
    while k < n and rank[order[-1]] < n - 1:
        key2 = np.full(n, -1, dtype=_I64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, k1 = rank[order], key2[order]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (r1[1:] != r1[:-1]) | (k1[1:] != k1[:-1])
        new_rank = np.empty(n, dtype=_I64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        k *= 2
        levels.append((k, rank))
    return order.astype(_I64), levels


def sa_and_adjacent_lcp(arr: np.ndarray):
    """(suffix array, lcp) with lcp[i] = LCP(sa[i], sa[i+1]) — vectorised
    descent over the doubling rank levels (O(n log n) total)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=_I64), np.empty(0, dtype=_I64)
    sa, levels = _rank_levels(arr)
    if n == 1:
        return sa, np.empty(0, dtype=_I64)
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=_I64)
    for k, rank in reversed(levels):
        ok = (i + k <= n) & (j + k <= n)
        eq = ok & (rank[np.minimum(i, n - 1)] == rank[np.minimum(j, n - 1)])
        lcp[eq] += k
        i[eq] += k
        j[eq] += k
    # the level-1 rank equality only proves a 1-char match; verify residual
    # char equality once more at the end (i/j may sit on a still-equal char)
    ok = (i < n) & (j < n)
    while ok.any():
        eq = ok & (arr[np.minimum(i, n - 1)] == arr[np.minimum(j, n - 1)])
        if not eq.any():
            break
        lcp[eq] += 1
        i[eq] += 1
        j[eq] += 1
        ok = (i < n) & (j < n)
    return sa, lcp


def _segmented_cummin(vals: np.ndarray, reset: np.ndarray) -> np.ndarray:
    """Running minimum that restarts at every True in ``reset`` — the
    per-segment offset trick keeps it one np.minimum.accumulate."""
    if len(vals) == 0:
        return vals
    seg = np.cumsum(reset)
    big = vals.max() + 1 if len(vals) else 1
    shifted = vals + (seg.max() - seg) * (big + 1)
    return np.minimum.accumulate(shifted) - (seg.max() - seg) * (big + 1)


def _merge_intervals(starts: np.ndarray, ends: np.ndarray):
    """Merge overlapping/adjacent [start, end) intervals (inputs unsorted)."""
    if len(starts) == 0:
        return starts, ends
    order = np.lexsort((ends, starts))
    s, e = starts[order], ends[order]
    run_max = np.maximum.accumulate(e)
    new = np.empty(len(s), dtype=bool)
    new[0] = True
    new[1:] = s[1:] > run_max[:-1]
    grp = np.cumsum(new) - 1
    out_s = s[new]
    out_e = np.maximum.reduceat(e, np.flatnonzero(new))
    return out_s, out_e


def winnow_fingerprints(hashes: np.ndarray, window: int) -> np.ndarray:
    """Robust-winnowing selection (Schleimer et al., public algorithm):
    the distinct minima of every ``window``-length sliding window over the
    shingle-hash sequence.  Guarantee used by the candidate stage: two
    documents sharing a verbatim substring of length >= window + k - 1
    (k = shingle width) share at least one selected fingerprint."""
    n = len(hashes)
    if n == 0:
        return hashes.astype(_I64)
    if n <= window:
        return np.array([hashes.min()], dtype=_I64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1)).astype(_I64)


def seeded_common_spans(
    a: str,
    b: str,
    min_len: int,
    k: int,
    ha: np.ndarray,
    hb: np.ndarray,
    pre_a,
    pre_b,
    max_seeds: int = 65536,
):
    """Seed-based exact common-substring spans: identical output to
    ``common_substring_spans`` but O(shared k-grams) instead of
    O((|a|+|b|) log^2) — the fast path for the 99.9% of candidate pairs that
    share only a handful of boilerplate shingles.

    A verbatim common substring of length L >= k produces k-gram hash
    matches at EVERY offset along one diagonal (consecutive, step 1), so
    maximal gap-1 diagonal runs of shared k-gram positions are exactly the
    maximal common substrings; each kept run is character-verified so hash
    collisions cannot fabricate or extend a span.  Returns None when the
    pair should fall back to the suffix-array path (degenerate repetition
    blowing up the seed cross-product, or a failed character check)."""
    if len(ha) == 0 or len(hb) == 0:
        e = np.empty((0, 2), dtype=_I64)
        return e, e
    from ..util import intersect_sorted

    sa_, va, ua = pre_a
    sb_, vb, ub = pre_b
    # shared hash values + their occurrence ranges in each sorted array
    common = intersect_sorted(ua, ub)
    if len(common) == 0:
        e = np.empty((0, 2), dtype=_I64)
        return e, e
    a_lo = np.searchsorted(va, common, side="left")
    a_hi = np.searchsorted(va, common, side="right")
    b_lo = np.searchsorted(vb, common, side="left")
    b_hi = np.searchsorted(vb, common, side="right")
    npairs = (a_hi - a_lo) * (b_hi - b_lo)
    total = int(npairs.sum())
    if total == 0:
        e = np.empty((0, 2), dtype=_I64)
        return e, e
    if total > max_seeds:
        return None  # degenerate repetition: the SA path is the right tool
    vidx = np.repeat(np.arange(len(common)), npairs)
    offs = np.cumsum(npairs) - npairs
    within = np.arange(total) - offs[vidx]
    cb = b_hi - b_lo
    pos_a = sa_[a_lo[vidx] + within // cb[vidx]]
    pos_b = sb_[b_lo[vidx] + within % cb[vidx]]
    diag = pos_a - pos_b
    order = np.lexsort((pos_a, diag))
    diag_s, pa_s = diag[order], pos_a[order]
    new_run = np.empty(len(pa_s), dtype=bool)
    new_run[0] = True
    # strict verbatim runs: consecutive positions only (gap == 1); a gap
    # means an intermediate k-gram differs, i.e. the substring breaks
    np.logical_or(
        diag_s[1:] != diag_s[:-1], pa_s[1:] - pa_s[:-1] != 1, out=new_run[1:]
    )
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], len(pa_s)]
    a_start = pa_s[starts]
    a_end = pa_s[ends - 1] + k
    d = diag_s[starts]
    keep = np.flatnonzero(a_end - a_start >= min_len)
    if len(keep) == 0:
        e = np.empty((0, 2), dtype=_I64)
        return e, e
    for i in keep:
        s0, e0 = int(a_start[i]), int(a_end[i])
        if a[s0:e0] != b[s0 - int(d[i]) : e0 - int(d[i])]:
            return None  # hash collision — verify with the SA path
    a_s, a_e = _merge_intervals(a_start[keep], a_end[keep])
    b_s, b_e = _merge_intervals(a_start[keep] - d[keep], a_end[keep] - d[keep])
    return np.stack([a_s, a_e], axis=1), np.stack([b_s, b_e], axis=1)


def common_substring_spans(a: str, b: str, min_len: int):
    """Maximal spans (length >= min_len) of ``a`` that occur verbatim in
    ``b`` and vice versa.

    Returns (a_spans, b_spans): each an (n, 2) int64 array of merged
    [start, end) intervals.
    """
    na, nb = len(a), len(b)
    empty = np.empty((0, 2), dtype=_I64)
    if na < min_len or nb < min_len:
        return empty, empty
    ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(_I64)
    cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(_I64)
    # separator below all code points: shift text up by 1, sep = 0
    s = np.concatenate([ca + 1, np.zeros(1, dtype=_I64), cb + 1])
    n = len(s)
    sa, lcp = sa_and_adjacent_lcp(s)
    is_b = sa > na  # suffixes starting in b (the separator suffix is at na)
    is_a = sa < na
    # cap LCP at the separator: suffixes never match across it (sep is
    # unique), so adjacent LCP values are already separator-safe.
    # max LCP of each suffix against ANY suffix of the other doc =
    # max(best above, best below) where best-above scanning down is the
    # running min of lcp since the last other-doc suffix.
    def other_doc_lcp(mine: np.ndarray, other: np.ndarray) -> np.ndarray:
        # down-scan: for SA position i, min lcp over (j..i-1] where j is the
        # nearest other-doc suffix above
        down = np.full(n, -1, dtype=_I64)
        if n > 1:
            seen = np.cumsum(other) > 0
            run = _segmented_cummin(lcp, other[:-1])
            down[1:] = np.where(seen[:-1], run, -1)
        up = np.full(n, -1, dtype=_I64)
        if n > 1:
            other_r = other[::-1]
            seen_r = np.cumsum(other_r) > 0
            run_r = _segmented_cummin(lcp[::-1], other_r[:-1])
            up[: n - 1] = np.where(seen_r[:-1], run_r, -1)[::-1]
        return np.maximum(down, up)

    best_a = other_doc_lcp(is_a, is_b)  # for every SA slot; valid where is_a
    best_b = other_doc_lcp(is_b, is_a)
    m_a = is_a & (best_a >= min_len)
    m_b = is_b & (best_b >= min_len)
    a_pos = sa[m_a]
    a_len = best_a[m_a]
    b_pos = sa[m_b] - (na + 1)
    b_len = best_b[m_b]
    a_s, a_e = _merge_intervals(a_pos, a_pos + a_len)
    b_s, b_e = _merge_intervals(b_pos, b_pos + b_len)
    return np.stack([a_s, a_e], axis=1), np.stack([b_s, b_e], axis=1)
