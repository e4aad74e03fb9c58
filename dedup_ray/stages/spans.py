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


def sort_state(h: np.ndarray):
    """Per-doc reusable sort state for ``find_spans``: (stable argsort,
    sorted values, unique sorted values).  A doc appears in many candidate
    pairs, so computing this once per doc per batch removes the dominant
    per-pair argsort/unique cost."""
    sa = np.argsort(h, kind="stable")
    va = h[sa]
    if len(va):
        first = np.empty(len(va), dtype=bool)
        first[0] = True
        np.not_equal(va[1:], va[:-1], out=first[1:])
        ua = va[first]
    else:
        ua = va
    return sa, va, ua


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
    pre_a=None,
    pre_b=None,
) -> list[Span]:
    from ..hashing import shingle_hashes
    from ..util import intersect_sorted

    if ha is None:
        ha = shingle_hashes(text_a, k)
    if hb is None:
        hb = shingle_hashes(text_b, k)
    if len(ha) == 0 or len(hb) == 0:
        return []
    if merge_gap is None:
        merge_gap = k
    # match positions per common hash value (sort state cached per doc by
    # the caller when a doc appears in many pairs)
    sa, va, ua = pre_a if pre_a is not None else sort_state(ha)
    sb, vb, ub = pre_b if pre_b is not None else sort_state(hb)
    common = intersect_sorted(ua, ub)
    if len(common) == 0:
        return []
    # run boundaries per value in each sorted array
    a_hi = np.searchsorted(va, common, side="right")
    a_lo = np.searchsorted(va, common, side="left")
    b_hi = np.searchsorted(vb, common, side="right")
    b_lo = np.searchsorted(vb, common, side="left")
    # vectorised ragged cross product per common value (usually 1x1): for
    # value v with ca_v anchors in a and cb_v in b (capped), emit the ca*cb
    # grid via a flat index decomposed as (within // cb, within % cb)
    ca = np.minimum(a_hi - a_lo, max_anchors_per_hash)
    cb = np.minimum(b_hi - b_lo, max_anchors_per_hash)
    npairs = ca * cb
    total = int(npairs.sum())
    if total == 0:
        return []
    vidx = np.repeat(np.arange(len(common)), npairs)
    offs = np.cumsum(npairs) - npairs
    within = np.arange(total) - offs[vidx]
    pos_a = sa[a_lo[vidx] + within // cb[vidx]]
    pos_b = sb[b_lo[vidx] + within % cb[vidx]]
    diag = pos_a - pos_b
    # sort by (diagonal, pos_a)
    order = np.lexsort((pos_a, diag))
    diag_s, pa_s = diag[order], pos_a[order]
    new_run = np.empty(len(pa_s), dtype=bool)
    new_run[0] = True
    np.logical_or(
        diag_s[1:] != diag_s[:-1], pa_s[1:] - pa_s[:-1] > merge_gap, out=new_run[1:]
    )
    starts = np.flatnonzero(new_run)
    ends = np.empty(len(starts), dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = len(pa_s)
    a_start = pa_s[starts]
    a_end = pa_s[ends - 1] + k
    d = diag_s[starts]
    # covered positions = union of [pos, pos+k) windows in the run: per-run
    # sum of min(gap, k) + k, via a cumulative sum of clipped gaps sampled at
    # the run boundaries (gaps spanning two runs are zeroed by the sampling)
    if len(pa_s) > 1:
        cg = np.concatenate([[0], np.cumsum(np.minimum(np.diff(pa_s), k))])
    else:
        cg = np.zeros(1, dtype=np.int64)
    covered = cg[ends - 1] - cg[starts] + k
    keep = np.flatnonzero(a_end - a_start >= min_span_len)
    return [
        Span(
            int(a_start[i]), int(a_end[i]),
            int(a_start[i] - d[i]), int(a_end[i] - d[i]),
            "+", int(covered[i]),
        )
        for i in keep
    ]
