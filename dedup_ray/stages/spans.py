"""V3 — matching-span discovery between a candidate pair of texts.

The reference delegated this to minimap2 (``/root/reference/dedup/
dedup.py:437``), a seed-chain-extend aligner.  Web text has no reverse
complement, so we implement the '+'-strand seed-and-chain directly:

  1. seeds: all k-shingle hash matches between the two texts, as
     (pos_a, pos_b) anchor pairs (cross product per matching hash value,
     capped per value to bound degenerate repeats);
  2. group by diagonal d = pos_a - pos_b; within a diagonal, consecutive
     seeds whose gap <= merge_gap chain into one run;
  3. each run becomes a span (a_start, a_end, b_start, b_end, nmatch) where
     nmatch = number of positions covered by seed windows in the run (for a
     verbatim shared substring this equals its length, matching PAF nmatch
     semantics for an exact match).

Spans shorter than min_span_len are dropped.  All numpy-vectorized.
"""

from __future__ import annotations

import numpy as np

from .chain import Span


def find_spans(
    text_a: str,
    text_b: str,
    *,
    k: int,
    min_span_len: int = 0,
    merge_gap: int | None = None,
    max_anchors_per_hash: int = 16,
    ha: np.ndarray | None = None,
    hb: np.ndarray | None = None,
) -> list[Span]:
    from ..hashing import shingle_hashes

    if ha is None:
        ha = shingle_hashes(text_a, k)
    if hb is None:
        hb = shingle_hashes(text_b, k)
    if len(ha) == 0 or len(hb) == 0:
        return []
    if merge_gap is None:
        merge_gap = k
    # match positions per common hash value
    sa = np.argsort(ha, kind="stable")
    sb = np.argsort(hb, kind="stable")
    va, vb = ha[sa], hb[sb]
    common, ia, ib = np.intersect1d(va, vb, return_indices=True)
    if len(common) == 0:
        return []
    # run boundaries per value in each sorted array
    a_hi = np.searchsorted(va, common, side="right")
    a_lo = np.searchsorted(va, common, side="left")
    b_hi = np.searchsorted(vb, common, side="right")
    b_lo = np.searchsorted(vb, common, side="left")
    pos_a_parts, pos_b_parts = [], []
    for lo_a, hi_a, lo_b, hi_b in zip(a_lo, a_hi, b_lo, b_hi):
        pa_ = sa[lo_a:hi_a][:max_anchors_per_hash]
        pb_ = sb[lo_b:hi_b][:max_anchors_per_hash]
        # cross product (usually 1x1)
        pos_a_parts.append(np.repeat(pa_, len(pb_)))
        pos_b_parts.append(np.tile(pb_, len(pa_)))
    pos_a = np.concatenate(pos_a_parts)
    pos_b = np.concatenate(pos_b_parts)
    diag = pos_a - pos_b
    # sort by (diagonal, pos_a)
    order = np.lexsort((pos_a, diag))
    diag_s, pa_s = diag[order], pos_a[order]
    new_run = np.r_[True, (diag_s[1:] != diag_s[:-1]) | (pa_s[1:] - pa_s[:-1] > merge_gap)]
    run_ids = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], len(pa_s)]
    spans: list[Span] = []
    for s_idx, e_idx in zip(starts, ends):
        a_start = int(pa_s[s_idx])
        a_end = int(pa_s[e_idx - 1]) + k
        d = int(diag_s[s_idx])
        b_start, b_end = a_start - d, a_end - d
        if a_end - a_start < min_span_len:
            continue
        # covered positions = union of [pos, pos+k) windows in the run;
        # windows are sorted and gaps <= merge_gap == k are... gaps can leave
        # uncovered space when gap in (k, merge_gap]; with merge_gap == k the
        # union is contiguous per sub-run split below.
        seg = pa_s[s_idx:e_idx]
        gaps = np.diff(seg)
        covered = int(np.minimum(gaps, k).sum() + k)
        spans.append(Span(a_start, a_end, b_start, b_end, "+", covered))
    return spans
