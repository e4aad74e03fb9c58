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


def _empty_decisions() -> pa.Table:
    i64, s, f64 = pa.int64(), pa.string(), pa.float64()
    return pa.table(
        {
            "loser_uid": pa.array([], i64), "loser_url": pa.array([], s),
            "winner_uid": pa.array([], i64), "winner_url": pa.array([], s),
            "start": pa.array([], i64), "end": pa.array([], i64),
            "kind": pa.array([], s), "qstart": pa.array([], i64),
            "qend": pa.array([], i64), "tstart": pa.array([], i64),
            "tend": pa.array([], i64), "direction": pa.array([], s),
            "score": pa.array([], f64),
        }
    )


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
    # per-batch doc caches: a doc appears in many pairs, so its shingle
    # hashes (both the char-k span seeds and the tokenizer-dispatched dedup
    # shingles), their find_spans sort state, and their sorted uniques are
    # computed once per batch
    from ..hashing import shingle_hashes as _char_hashes
    from ..util import intersect_sorted, member_mask
    from .spans import sort_state

    char_cache: dict[int, tuple] = {}
    doc_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def char_h(uid: int, text: str) -> tuple:
        """(hashes, (argsort, sorted, unique)) of the char-k span seeds."""
        if uid not in char_cache:
            h = _char_hashes(text, cfg.shingle_k)
            char_cache[uid] = (h, sort_state(h))
        return char_cache[uid]

    def doc_h(uid: int, text: str) -> tuple[np.ndarray, np.ndarray]:
        """(hashes, sorted unique) of the tokenizer-dispatched dedup shingles."""
        if uid not in doc_cache:
            if cfg.tokenizer == "char":
                h, (_, _, u) = char_h(uid, text)
            else:
                h = cfg.shingles(text)
                u = np.unique(h)
            doc_cache[uid] = (h, u)
        return doc_cache[uid]

    for i in range(n):
        text_a = cols["text_a"][i]
        text_b = cols["text_b"][i]
        # reconstruct the pair's common dup-band shingles from texts alone:
        # shingles present in BOTH texts have corpus df >= 2 by definition;
        # subtracting the carried df>hi commons (common_high) leaves exactly
        # dup_a & dup_b (the df-in-[lo,hi] commons).
        h_a, u_a = doc_h(cols["uid_a"][i], text_a)
        h_b, u_b = doc_h(cols["uid_b"][i], text_b)
        common_txt = intersect_sorted(u_a, u_b)
        if has_ch:
            hi_set = np.frombuffer(cols["common_high"][i], dtype=np.int64)
            common = np.setdiff1d(common_txt, hi_set, assume_unique=True)
        elif high is not None and len(high):
            common = common_txt[~member_mask(common_txt, high)]
        else:
            common = common_txt
        pos_a = np.flatnonzero(member_mask(h_a, common)).astype(np.int64)
        pos_b = np.flatnonzero(member_mask(h_b, common)).astype(np.int64)
        ca, pre_a = char_h(cols["uid_a"][i], text_a)
        cb, pre_b = char_h(cols["uid_b"][i], text_b)
        spans = find_spans(
            text_a, text_b, k=cfg.shingle_k, min_span_len=cfg.min_span_len,
            ha=ca, hb=cb, pre_a=pre_a, pre_b=pre_b,
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
    """Attach texts to the (light) verified pairs, then run the fused
    verifier.

    Broadcast path (default under the byte gate): the texts of ONLY the docs
    appearing in a pair are gathered as an arrow table in the object store
    (zero-copy plasma reads per task) and each pair batch resolves text_a /
    text_b by sorted-uid lookup + vectorised ``take`` — no hash joins, and
    the per-pair align work scales linearly with CPUs.  Above the gate: two
    chained hash joins (the 100-TB path).
    """
    import ray

    from ..util import map_blocks

    vm = verified.materialize()

    def pair_uids_fn(b: pa.Table) -> np.ndarray:
        return np.unique(
            np.concatenate(
                [
                    b.column("uid_a").to_numpy(zero_copy_only=False),
                    b.column("uid_b").to_numpy(zero_copy_only=False),
                ]
            )
        )

    parts = ray.get(map_blocks(pair_uids_fn, vm))
    pair_uids = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    )
    broadcast = len(pair_uids) <= cfg.broadcast_classify_limit
    if broadcast:
        keys_ref = ray.put(pair_uids)

        def slim(b: pa.Table):
            k = ray.get(keys_ref)
            uids = b.column("uid").to_numpy(zero_copy_only=False)
            if len(k) == 0:
                hit = np.zeros(len(uids), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(k, uids), len(k) - 1)
                hit = k[pos] == uids
            t = pa.table(
                {"uid": b.column("uid"), "text": b.column("text")}
            ).filter(pa.array(hit))
            return t, t.nbytes

        outs = map_blocks(slim, docs.materialize(), num_returns=2)
        sizes = ray.get([o[1] for o in outs])
        if sum(sizes) <= cfg.broadcast_text_bytes:
            tables = [t for t in ray.get([o[0] for o in outs]) if t.num_rows]
            if tables:
                tbl = pa.concat_tables(tables).combine_chunks().sort_by("uid")
            else:
                tbl = pa.table(
                    {
                        "uid": pa.array([], type=pa.int64()),
                        "text": pa.array([], type=pa.large_string()),
                    }
                )
            text_ref = ray.put(tbl)

            def run_bcast(b: pa.Table) -> pa.Table:
                t = ray.get(text_ref)
                ku = t.column("uid").to_numpy(zero_copy_only=False)
                texts = t.column("text")
                ua = b.column("uid_a").to_numpy(zero_copy_only=False)
                ub = b.column("uid_b").to_numpy(zero_copy_only=False)
                if len(ku) == 0:
                    return _empty_decisions()
                ia = np.minimum(np.searchsorted(ku, ua), len(ku) - 1)
                ib = np.minimum(np.searchsorted(ku, ub), len(ku) - 1)
                hit = (ku[ia] == ua) & (ku[ib] == ub)
                sub = b.filter(pa.array(hit))
                full_b = sub.append_column(
                    "text_a", texts.take(pa.array(ia[hit]))
                ).append_column("text_b", texts.take(pa.array(ib[hit])))
                high = ray.get(high_ref) if high_ref is not None else None
                return align_decide_batch(full_b, cfg, high)

            return vm.map_batches(
                run_bcast, batch_format="pyarrow", batch_size=cfg.pair_batch_size
            )

    texts = docs.select_columns(["uid", "text"])
    t_a = texts.rename_columns({"uid": "uid_a", "text": "text_a"})
    t_b = texts.rename_columns({"uid": "uid_b", "text": "text_b"})
    # both joins chain in ONE execution: inputs are materialised ref-datasets
    # (verified via the phase barrier, docs via the corpus materialise), whose
    # blocks are never the zero-column empties that poison Ray 2.49 joins.
    half = vm.join(t_a, "inner", num_partitions=cfg.join_partitions(), on=("uid_a",))
    full = half.join(t_b, "inner", num_partitions=cfg.join_partitions(), on=("uid_b",))

    def run(b: pa.Table) -> pa.Table:
        high = ray.get(high_ref) if high_ref is not None else None
        return align_decide_batch(b, cfg, high)

    return full.map_batches(
        run, batch_format="pyarrow", batch_size=cfg.pair_batch_size
    )


def dual_orientation_alignments(dec: Dataset) -> Dataset:
    """S7 parity: the reference writes each winning alignment in BOTH
    orientations — query->target and target->query
    (``/root/reference/dedup/dedup.py:162-175``).  Decision rows carry the
    loser-as-query orientation; this emits that row plus the mirror with
    query/target urls and coordinate spans swapped (valid directly because
    only "+"-direction spans are produced for text)."""

    def both(b: pa.Table) -> pa.Table:
        def orient(qu, tu, qs, qe, ts, te):
            return pa.table(
                {
                    "query_url": b.column(qu),
                    "target_url": b.column(tu),
                    "qstart": b.column(qs),
                    "qend": b.column(qe),
                    "tstart": b.column(ts),
                    "tend": b.column(te),
                    "direction": b.column("direction"),
                    "score": b.column("score"),
                    "kind": b.column("kind"),
                }
            )

        fwd = orient("loser_url", "winner_url", "qstart", "qend", "tstart", "tend")
        rev = orient("winner_url", "loser_url", "tstart", "tend", "qstart", "qend")
        return pa.concat_tables([fwd, rev])

    return dec.map_batches(both, batch_format="pyarrow")


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
