"""Fused V3+V2+D1 verifier: verified pairs + texts -> dedup decisions.

Distributed shape (SURVEY.md §2.5): the verified-pair table is joined with
the doc texts on each side (two hash joins — pairs are few relative to the
corpus), then a stateless ``map_batches`` runs per pair:

  find_spans (V3 seed-chain)  ->  chain_pair (V2 simplify/score/DAG/best)
  ->  decide_pair (D1 full/head/tail/fallback)

emitting decision rows and best-alignment evidence rows (the reference's
``best_alignments.paf``, both orientations: ``dedup.py:171-173``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..config import DedupConfig
from ..hashing import shingle_hashes
from .chain import chain_pair
from .decide import decide_pair
from .spans import find_spans


def _common_dup_positions(text: str, dup_set: np.ndarray, common: np.ndarray, k: int):
    """Positions in text whose shingle is in the pair's common dup set."""
    h = shingle_hashes(text, k)
    if len(h) == 0 or len(common) == 0:
        return np.empty(0, dtype=np.int64)
    mask = np.isin(h, common)
    return np.flatnonzero(mask).astype(np.int64)


def align_decide_batch(
    batch: pa.Table, cfg: DedupConfig, high: np.ndarray | None = None
) -> pa.Table:
    """One row per verified pair (with text_a/text_b columns) -> decision rows.

    ``high``: globally-sorted array of df > dup_upper shingles (broadcast) —
    used when pair rows don't carry a per-pair ``common_high`` blob (the
    scalar verification path)."""
    E = np.empty(0, dtype=np.int64)
    has_ch = "common_high" in batch.column_names
    out = {
        "loser_uid": [], "loser_url": [], "winner_uid": [], "winner_url": [],
        "start": [], "end": [], "kind": [],
        "qstart": [], "qend": [], "tstart": [], "tend": [], "direction": [],
        "score": [],
    }
    n = batch.num_rows
    # one column->python conversion per batch (cell-wise .as_py() is ~10x)
    cols = {
        name: batch.column(name).to_pylist()
        for name in (
            "text_a", "text_b", "uid_a", "uid_b", "url_a", "url_b",
            "n_chars_a", "n_chars_b",
        )
    }
    if has_ch:
        cols["common_high"] = batch.column("common_high").to_pylist()
    for i in range(n):
        text_a = cols["text_a"][i]
        text_b = cols["text_b"][i]
        # reconstruct the pair's common dup-band shingles from texts alone:
        # shingles present in BOTH texts have corpus df >= 2 by definition;
        # subtracting the carried df>hi commons (common_high) leaves exactly
        # dup_a & dup_b (the df-in-[lo,hi] commons).
        h_a = cfg.shingles(text_a)
        h_b = cfg.shingles(text_b)
        common_txt = np.intersect1d(np.unique(h_a), np.unique(h_b), assume_unique=True)
        if has_ch:
            hi_set = np.frombuffer(cols["common_high"][i], dtype=np.int64)
            common = np.setdiff1d(common_txt, hi_set, assume_unique=True)
        elif high is not None and len(high):
            idx = np.minimum(np.searchsorted(high, common_txt), len(high) - 1)
            common = common_txt[high[idx] != common_txt]
        else:
            common = common_txt
        pos_a = np.flatnonzero(np.isin(h_a, common)).astype(np.int64)
        pos_b = np.flatnonzero(np.isin(h_b, common)).astype(np.int64)
        spans = find_spans(
            text_a, text_b, k=cfg.shingle_k, min_span_len=cfg.min_span_len
        )
        if len(spans) > cfg.max_spans_per_pair:
            # keep the longest-match spans (deterministic tie-break by
            # coordinates); the chaining DAG is O(n^2) in span count
            spans = sorted(
                spans, key=lambda s: (-s.nmatch, s.qstart, s.tstart)
            )[: cfg.max_spans_per_pair]
            spans.sort(key=lambda s: (s.qstart, s.qend, s.tstart, s.tend))
        best = chain_pair(
            spans, pos_a, E, pos_b, E,
            max_gap=cfg.alignment_max_gap,
            match_weight=cfg.alignment_match_weight,
            aln_coverage=cfg.alignment_min_coverage,
        )
        if best is None:
            continue
        n_a = int(cols["n_chars_a"][i])
        n_b = int(cols["n_chars_b"][i])
        decision = decide_pair(best, n_a, n_b, cfg)
        if decision is None:
            continue
        idx, (start, end), kind = decision
        side = ("a", "b") if idx == 0 else ("b", "a")
        out["loser_uid"].append(cols[f"uid_{side[0]}"][i])
        out["loser_url"].append(cols[f"url_{side[0]}"][i])
        out["winner_uid"].append(cols[f"uid_{side[1]}"][i])
        out["winner_url"].append(cols[f"url_{side[1]}"][i])
        out["start"].append(start)
        out["end"].append(end)
        out["kind"].append(kind)
        for key in ("qstart", "qend", "tstart", "tend"):
            out[key].append(int(best[key]))
        out["direction"].append(best["direction"])
        out["score"].append(float(best["score"]))
    return pa.table(
        {
            "loser_uid": pa.array(out["loser_uid"], type=pa.int64()),
            "loser_url": pa.array(out["loser_url"], type=pa.string()),
            "winner_uid": pa.array(out["winner_uid"], type=pa.int64()),
            "winner_url": pa.array(out["winner_url"], type=pa.string()),
            "start": pa.array(out["start"], type=pa.int64()),
            "end": pa.array(out["end"], type=pa.int64()),
            "kind": pa.array(out["kind"], type=pa.string()),
            "qstart": pa.array(out["qstart"], type=pa.int64()),
            "qend": pa.array(out["qend"], type=pa.int64()),
            "tstart": pa.array(out["tstart"], type=pa.int64()),
            "tend": pa.array(out["tend"], type=pa.int64()),
            "direction": pa.array(out["direction"], type=pa.string()),
            "score": pa.array(out["score"], type=pa.float64()),
        }
    )


def decisions(
    verified: Dataset, docs: Dataset, cfg: DedupConfig, high_ref=None
) -> Dataset:
    """Join texts onto the (light) verified pairs, then run the fused
    verifier.  Pair rows stay small through the barrier (no texts/blobs —
    just the tiny common_high exclusion set); the two text joins here are on
    the pair table, which is orders of magnitude smaller than the corpus."""
    texts = docs.select_columns(["uid", "text"])
    t_a = texts.rename_columns({"uid": "uid_a", "text": "text_a"})
    t_b = texts.rename_columns({"uid": "uid_b", "text": "text_b"})
    # both joins chain in ONE execution: inputs are materialised ref-datasets
    # (verified via the phase barrier, docs via the corpus materialise), whose
    # blocks are never the zero-column empties that poison Ray 2.49 joins.
    half = verified.join(
        t_a, "inner", num_partitions=cfg.join_partitions(), on=("uid_a",)
    )
    full = half.join(t_b, "inner", num_partitions=cfg.join_partitions(), on=("uid_b",))

    def run(b: pa.Table) -> pa.Table:
        import ray

        high = ray.get(high_ref) if high_ref is not None else None
        return align_decide_batch(b, cfg, high)

    return full.map_batches(
        run, batch_format="pyarrow", batch_size=cfg.pair_batch_size
    )


def merge_decisions(dec: Dataset, cfg: DedupConfig) -> Dataset:
    """D2: per loser doc, collect all intervals (flattened int64 pairs blob).

    One sort execution + per-block vectorised grouping + raw-task boundary
    heal (the first/last uid of a block may span blocks) — no per-group
    map_groups overhead, no extra executions.
    """
    import ray

    from ..util import ds_from_refs, split_boundary

    s = dec.select_columns(["loser_uid", "start", "end"]).sort("loser_uid")

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "uid": pa.array([], type=pa.int64()),
                    "intervals": pa.array([], type=pa.large_binary()),
                    "_boundary": pa.array([], type=pa.bool_()),
                }
            )
        uids = batch.column("loser_uid").to_numpy(zero_copy_only=False)
        st = batch.column("start").to_numpy(zero_copy_only=False)
        en = batch.column("end").to_numpy(zero_copy_only=False)
        flat = np.empty(2 * len(uids), dtype=np.int64)
        flat[0::2] = st
        flat[1::2] = en
        g_starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
        g_ends = np.r_[g_starts[1:], len(uids)]
        out_uid = uids[g_starts]
        blobs = [flat[2 * a : 2 * b].tobytes() for a, b in zip(g_starts, g_ends)]
        boundary = np.zeros(len(out_uid), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        return pa.table(
            {
                "uid": pa.array(out_uid, type=pa.int64()),
                "intervals": pa.array(blobs, type=pa.large_binary()),
                "_boundary": pa.array(boundary),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        merged: dict[int, bytes] = {}
        for r in boundary.to_pylist():
            merged[r["uid"]] = merged.get(r["uid"], b"") + r["intervals"]
        bt = pa.table(
            {
                "uid": pa.array(list(merged), type=pa.int64()),
                "intervals": pa.array(list(merged.values()), type=pa.large_binary()),
            }
        )
        int_refs = int_refs + [ray.put(bt)]
        n_int += bt.num_rows
    return ds_from_refs(
        int_refs, count=n_int, uid=pa.int64(), intervals=pa.large_binary()
    )
