"""Unit parity tests for V2/V3/D1/M5, mirroring the reference's
``dedup/test/test_alignment.py`` and ``test_contig.py`` over web text
(SURVEY.md §5.2 item 1)."""

import numpy as np
import pytest

from dedup_ray.config import DedupConfig
from dedup_ray.stages.chain import (
    Span,
    _Node,
    best_alignment,
    build_dag,
    chain_pair,
    dnd_segment_score,
    score_spans,
    simplify_spans,
)
from dedup_ray.stages.decide import decide_pair
from dedup_ray.stages.spans import find_spans
from dedup_ray.stages.trim import stats_row, trim_text

E = np.empty(0, dtype=np.int64)


def _spans3():
    # the reference fixture's 3-segment PAF (test_alignment.py:22-30)
    return [
        Span(0, 2, 0, 2, "+", 3),
        Span(1, 3, 1, 3, "+", 3),
        Span(2, 4, 2, 4, "+", 3),
    ]


# dnd analogues of contig1.dnd_ratio=[1,1,0,0,0,0], contig2=[0,1,0,0,0,0]
DUP1 = np.array([0, 1], dtype=np.int64)
DUP2 = np.array([1], dtype=np.int64)


def test_score_spans_parity():
    """test_parse_paf analogue: 3 nodes, node0 coordinates + positive score."""
    nodes = score_spans(_spans3(), DUP1, E, DUP2, E, match_weight=0.2, aln_coverage=0)
    assert len(nodes) == 3
    n0 = nodes[0]
    assert (n0.qstart, n0.qend, n0.tstart, n0.tend, n0.direction) == (0, 2, 0, 2, "+")
    assert n0.score > 0
    # exact: c1 = 2 dup positions in [0,2), c2 = 1, + 0.2*3
    assert n0.score == pytest.approx(3.6)


def test_no_alignment_when_scores_negative():
    """test_find_best_alignment_no_alignment analogue."""
    nodes = [
        _Node(0, 2, 0, 2, "+", -1.0),
        _Node(1, 3, 1, 3, "+", -1.0),
        _Node(2, 4, 2, 4, "+", -1.0),
    ]
    assert best_alignment(nodes) is None


def test_best_alignment_hand_built():
    """test_find_best_alignment_with_alignment analogue: 3-node graph,
    expected span {qstart 0, qend 3, tstart 0, tend 3, '+'}"""
    n0 = _Node(0, 2, 0, 2, "+", 3.0)
    n1 = _Node(1, 3, 1, 3, "+", 2.0)
    n2 = _Node(2, 4, 2, 4, "+", 0.0)
    n1.parents = [(0, 0.0)]
    n2.parents = [(0, 0.0), (1, 0.0)]
    result = best_alignment([n0, n1, n2])
    assert {k: result[k] for k in ("qstart", "qend", "tstart", "tend", "direction")} == {
        "qstart": 0, "qend": 3, "tstart": 0, "tend": 3, "direction": "+",
    }


def test_create_dag_parity():
    """test_create_DAG analogue: 3 colinear segments -> 3 edges; node1 has 1
    parent, node2 has 2."""
    nodes = score_spans(_spans3(), DUP1, E, DUP2, E, match_weight=0.2, aln_coverage=0)
    build_dag(nodes, DUP1, E, DUP2, E, max_gap=25000)
    n_edges = sum(len(n.parents) for n in nodes)
    assert n_edges == 3
    assert len(nodes[1].parents) == 1
    assert len(nodes[2].parents) == 2


def test_forced_parent_quirk():
    """The reference recursion ALWAYS extends through the best parent even
    when that lowers the score (alignment.py:210-226)."""
    n0 = _Node(0, 2, 0, 2, "+", -5.0)
    n1 = _Node(3, 5, 3, 5, "+", 4.0)
    n1.parents = [(0, 0.0)]
    result = best_alignment([n0, n1])
    # path forced through n0: dp = -5 + 4 = -1 <= 0 -> no alignment
    assert result is None


def test_reverse_strand_coordinates():
    n0 = _Node(0, 2, 8, 10, "-", 3.0)
    n1 = _Node(4, 6, 2, 4, "-", 2.0)
    n1.parents = [(0, 0.0)]
    result = best_alignment([n0, n1])
    assert result["qstart"] == 0 and result["qend"] == 6
    # reverse: tstart from END node, tend from START node (alignment.py:120-122)
    assert result["tstart"] == 2 and result["tend"] == 10
    assert result["direction"] == "-"


def test_reverse_dag_conditions():
    nodes = [_Node(0, 2, 8, 10, "-", 1.0), _Node(4, 6, 2, 4, "-", 1.0)]
    build_dag(nodes, E, E, E, E, max_gap=25000)
    assert len(nodes[1].parents) == 1  # proper reverse colinearity
    # delta gap too POSITIVE (q gap >> t gap) -> no edge; note a large
    # NEGATIVE delta still chains (signed test, alignment.py:329)
    nodes = [_Node(0, 2, 10, 12, "-", 1.0), _Node(40000, 40002, 2, 4, "-", 1.0)]
    build_dag(nodes, E, E, E, E, max_gap=25000)
    assert len(nodes[1].parents) == 0


def test_signed_delta_gap_not_absolute():
    """Gap test is the signed DIFFERENCE of gaps (alignment.py:303), so two
    huge but equal gaps still chain."""
    nodes = [_Node(0, 10, 0, 10, "+", 1.0), _Node(70000, 70010, 70000, 70010, "+", 1.0)]
    build_dag(nodes, E, E, E, E, max_gap=25000)
    assert len(nodes[1].parents) == 1


def test_simplify_spans():
    spans = [
        Span(0, 10, 0, 10, "+", 10),
        Span(2, 8, 2, 8, "+", 6),     # contained -> dropped
        Span(2, 8, 2, 8, "-", 6),     # different strand -> kept
        Span(0, 12, 0, 12, "+", 12),  # container came later -> kept
    ]
    kept = simplify_spans(spans)
    assert [(s.qstart, s.qend, s.strand) for s in kept] == [
        (0, 10, "+"), (2, 8, "-"), (0, 12, "+"),
    ]


def test_dnd_segment_score_empty_slice_is_zero():
    assert dnd_segment_score(DUP1, E, 5, 3) == 0.0
    assert dnd_segment_score(DUP1, E, 3, 3) == 0.0
    assert dnd_segment_score(DUP1, DUP1, 0, 2) == 0.0  # dup - nondup


# ---------------- trim parity (test_contig.py:46-78) ----------------


def test_trim_no_duplicates():
    assert trim_text("ATGC", [], E, E, 0) == ("ATGC", [0, 0, 0, 0])


def test_trim_completely_duplicated():
    assert trim_text("ATGC", [(0, 4)], E, E, 0) == ("", [0, 0, 0, 0])


def test_trim_5_prime():
    assert trim_text("ATGC", [(0, 2)], E, E, 0) == ("GC", [0, 0, 0, 0])


def test_trim_min_length():
    assert trim_text("ATGC", [(0, 2)], E, E, 10) == ("", [0, 0, 0, 0])


def test_trim_3_prime():
    assert trim_text("ATGC", [(2, 4)], E, E, 0) == ("AT", [0, 0, 0, 0])


def test_trim_multiple():
    assert trim_text("ATGC", [(0, 1), (3, 4)], E, E, 0) == ("TG", [0, 0, 0, 0])


def test_trim_stats_postings():
    dup = np.array([0, 1, 5], dtype=np.int64)
    uniq = np.array([2, 6], dtype=np.int64)
    kept, stats = trim_text("abcdefgh", [(0, 2)], dup, uniq, 0)
    assert kept == "cdefgh"
    assert stats == [2, 3, 0, 2]
    ratios = stats_row(stats)
    assert ratios[0] == pytest.approx(2 / (3 + 1e-6))
    assert ratios[2] == pytest.approx(2 / 1e-6)


def test_trim_interior_interval_ignored():
    """contig.py:168-178: intervals touching neither edge don't trim."""
    assert trim_text("ATGC", [(1, 3)], E, E, 0) == ("ATGC", [0, 0, 0, 0])


# ---------------- decision branches (dedup.py:244-307) ----------------

CFG = DedupConfig(full_duplication_threshold=0.9, end_buffer=10)


def test_decide_full_removal():
    best = dict(qstart=0, qend=95, tstart=0, tend=95)
    assert decide_pair(best, 100, 1000, CFG) == (0, (0, 100), "full")


def test_decide_head_trim():
    best = dict(qstart=5, qend=50, tstart=200, tend=245)
    # q pct = 45/100 > t pct = 45/1000; start 5 < buffer 10 -> head trim
    assert decide_pair(best, 100, 1000, CFG) == (0, (0, 50), "head")


def test_decide_tail_trim():
    best = dict(qstart=55, qend=95, tstart=200, tend=240)
    assert decide_pair(best, 100, 1000, CFG) == (0, (55, 100), "tail")


def test_decide_tie_goes_to_t_side():
    best = dict(qstart=0, qend=100, tstart=0, tend=100)
    # equal pct (both 1.0): strict > fails -> t side chosen first (full)
    assert decide_pair(best, 100, 100, CFG) == (1, (0, 100), "full")


def test_decide_fallback_to_other_side():
    # q side more duplicated but its span is interior -> falls back to t side
    best = dict(qstart=40, qend=80, tstart=0, tend=40)
    # q pct 40/100=0.4 > t pct 40/1000=0.04; q interior (40>=10, 80<=90)
    # fallback t: start 0 < 10 -> head trim on t
    assert decide_pair(best, 100, 1000, CFG) == (1, (0, 40), "head")


def test_decide_no_branch_returns_none():
    best = dict(qstart=40, qend=60, tstart=400, tend=600)
    assert decide_pair(best, 100, 1000, CFG) is None


# ---------------- V3 span discovery ----------------


def test_find_spans_shared_block():
    a = "x" * 0 + "abcdefghijklmnopqrstuvwxyz0123456789" + "SHAREDBLOCKCONTENTHERE" + "qqq"
    shared = "THISISALONGSHAREDSUBSTRINGBETWEENDOCS"
    a = "aaaaaaaaabbbbbbbbb" + shared + "ccccc"
    b = "ddddddd" + shared + "eeeeeeeeeeeee"
    spans = find_spans(a, b, k=8)
    assert spans, "no spans found"
    s = max(spans, key=lambda s: s.nmatch)
    assert a[s.qstart : s.qend] == b[s.tstart : s.tend]
    assert shared in a[s.qstart : s.qend] or a[s.qstart : s.qend] in shared or len(
        a[s.qstart : s.qend]
    ) >= len(shared)


def test_find_spans_identical_texts():
    t = "the quick brown fox jumps over the lazy dog 0123456789"
    spans = find_spans(t, t, k=8)
    full = [s for s in spans if s.qstart == 0 and s.qend == len(t) and s.tstart == 0]
    assert full and full[0].nmatch == len(t)


def test_find_spans_disjoint_texts():
    assert find_spans("abcdefghij" * 3, "0123456789" * 3, k=8) == []


def test_chain_pair_end_to_end():
    shared = "SHAREDDUPLICATECONTENTBLOCKXYZ123456"
    a = "aaaaaaaaaa" + shared + "bbbbbbbbbb"
    b = shared + "cccccccccccccccc"
    spans = find_spans(a, b, k=8)
    # dup positions: every position inside the shared block of each text
    dup1 = np.arange(10, 10 + len(shared), dtype=np.int64)
    dup2 = np.arange(0, len(shared), dtype=np.int64)
    best = chain_pair(
        spans, dup1, E, dup2, E, max_gap=50, match_weight=0.2, aln_coverage=0.2
    )
    assert best is not None
    assert a[best["qstart"] : best["qend"]] == b[best["tstart"] : best["tend"]]


# ---------------- dnd ratio / moving average (test_contig.py:16-27) ----------------


def test_dnd_ratio_parity():
    from dedup_ray.stages.trim import dnd_ratio

    # analogue of homo_dup_depth=[0,4,0,4], homo_non_dup_depth=[2,4,0,0]
    # with 0/1 postings: dup at {1,3}, uniq at {0,1}
    dup = np.array([1, 3], dtype=np.int64)
    uniq = np.array([0, 1], dtype=np.int64)
    out = dnd_ratio(dup, uniq, 4)
    assert out[0] == -1            # only uniq
    assert out[1] == 0             # both -> difference 0
    assert np.isnan(out[2])        # neither -> NaN (contig.py:64)
    assert out[3] == 1             # only dup


def test_moving_average_blocks():
    from dedup_ray.stages.trim import moving_average

    data = np.array([1.0, 3.0, np.nan, 5.0])
    out = moving_average(data, 2)
    assert out[0] == 2.0
    assert out[1] == 5.0           # nanmean skips the NaN


def test_single_span_fast_path_matches_general_dp():
    """chain_pair's single-span fast path must equal the full
    score->DAG->best machinery on one-span inputs (both strands, both
    sides of the coverage gate)."""
    import numpy as np

    from dedup_ray.stages.chain import (
        Span, best_alignment, build_dag, chain_pair, score_spans,
    )

    E = np.empty(0, dtype=np.int64)
    dup1 = np.array([1, 2, 3, 5, 8], dtype=np.int64)
    dup2 = np.array([0, 4, 6, 7], dtype=np.int64)
    cases = [
        Span(0, 10, 0, 10, "+", 4),
        Span(0, 10, 0, 10, "-", 4),
        Span(2, 4, 6, 8, "+", 1),      # below coverage on one side
        Span(0, 1000, 0, 1000, "+", 0),  # low coverage both sides
        Span(5, 9, 3, 8, "-", 2),
    ]
    for s in cases:
        for cov in (0.0, 0.2, 0.9):
            fast = chain_pair(
                [s], dup1, E, dup2, E,
                max_gap=50, match_weight=0.2, aln_coverage=cov,
            )
            nodes = score_spans(
                [s], dup1, E, dup2, E, match_weight=0.2, aln_coverage=cov
            )
            build_dag(nodes, dup1, E, dup2, E, max_gap=50)
            general = best_alignment(nodes)
            assert fast == general, (s, cov, fast, general)


def test_chain_plus_np_matches_object_path():
    """Differential: random all-'+' span sets through the vectorised chain
    vs the object (simplify/score/DAG/DP) path — identical results incl.
    tie-breaks."""
    import numpy as np

    from dedup_ray.stages.chain import (
        Span,
        best_alignment,
        build_dag,
        chain_pair,
        score_spans,
        simplify_spans,
    )

    rng = np.random.default_rng(1234)
    for trial in range(300):
        m = int(rng.integers(2, 7))
        spans = []
        for _ in range(m):
            qs = int(rng.integers(0, 200))
            ql = int(rng.integers(5, 60))
            ts = int(rng.integers(0, 200))
            tl = int(rng.integers(5, 60))
            spans.append(Span(qs, qs + ql, ts, ts + tl, "+", int(rng.integers(1, 50))))
        dup1 = np.unique(rng.integers(0, 260, size=rng.integers(0, 120)))
        dup2 = np.unique(rng.integers(0, 260, size=rng.integers(0, 120)))
        E = np.empty(0, dtype=np.int64)
        kw = dict(max_gap=int(rng.integers(5, 100)), match_weight=0.2, aln_coverage=0.2)

        got = chain_pair(spans, dup1, E, dup2, E, **kw)

        simp = simplify_spans(list(spans))
        nodes = score_spans(
            simp, dup1, E, dup2, E,
            match_weight=kw["match_weight"], aln_coverage=kw["aln_coverage"],
        )
        build_dag(nodes, dup1, E, dup2, E, max_gap=kw["max_gap"])
        want = best_alignment(nodes)

        assert (got is None) == (want is None), f"trial {trial}: {got} vs {want}"
        if got is not None:
            for key in ("qstart", "qend", "tstart", "tend", "direction"):
                assert got[key] == want[key], f"trial {trial} {key}: {got} vs {want}"
            assert abs(got["score"] - want["score"]) < 1e-9, f"trial {trial}"
