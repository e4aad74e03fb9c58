"""Corpus-curation queries: the training-data-pipeline operations layered on
top of the dedup engine (all public-knowledge designs, each with a DuckDB
oracle whose semantics are byte-identical — RE2 on both sides for regex ops,
exact segment/gram STRINGS as join keys, single-IEEE-op floats only).

- ``near_dup_dedup``   — the deduplicated corpus itself (drop exact losers and
  near-dup cluster non-representatives; the reference's end product,
  /root/reference/dedup/dedup.py:129-187, re-expressed as a query).
- ``line_dedup``       — CCNet-style repeated-segment removal (Wenzek et al.
  2020): drop every 10-word segment occurring >= 2 times corpus-wide.
- ``incremental_dedup``— Bloom-gated exact dedup of an incoming slice against
  a base corpus (Bloom 1970): new docs skip the join entirely.
- ``top_ngrams``       — global top-k word bigrams (vocabulary/boilerplate
  audit), map-side combined before one slim aggregation.
- ``pii_redact``       — vectorized RE2 email/IPv4 scrubbing with counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig

# ---------------------------------------------------------------------------
# near_dup_dedup
# ---------------------------------------------------------------------------


def q_near_dup_dedup(sf_dir: str):
    """Kept corpus after full dedup under the word-3-gram oracle config:
    every doc except exact-dup losers and near-dup cluster
    non-representatives (cluster rep = min url = min doc_id).

    Composes the memoised flagship pipeline via the clusters-oracle labels
    (already driver-resident by that query's <=2M-edge contract; the 100-TB
    path swaps in stages/cluster.py's distributed label propagation plus a
    hash anti-join — same output, no driver table)."""
    import ray

    from ..util import member_mask
    from .queries import _read_mat, q_near_dup_clusters_oracle

    lbl = q_near_dup_clusters_oracle(sf_dir)
    urls = lbl.column("url").to_pylist()
    cl = lbl.column("cluster_url").to_pylist()
    dropped = np.sort(
        np.array(
            [int(u[-8:]) for u, c in zip(urls, cl) if u != c], dtype=np.int64
        )
    )
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "lang"])
    dropped_ref = ray.put(dropped)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(dropped_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~member_mask(ids, d)))

    return ds.map_batches(keep, batch_format="pyarrow")


def q_near_dup_keep_longest(sf_dir: str):
    """Quality-priority dedup: within each near-dup cluster keep the LONGEST
    member (ties -> lower doc_id) instead of the lowest-id one — the
    curation default when duplicates differ by truncation (keep the fullest
    version).  Non-clustered docs pass through.  Output: (doc_id, n_chars)
    of every kept doc.

    Composes the memoised flagship pipeline via the clusters-oracle labels
    (driver-resident under that query's <=2M-edge contract; the 100-TB path
    swaps in distributed label propagation + a hash join of (cluster, len)
    partials — same output).  Length is an INTEGER priority so the per
    cluster argmax is exact in both engines."""
    import ray

    from ..util import member_mask
    from .queries import _read_mat, q_near_dup_clusters_oracle

    lbl = q_near_dup_clusters_oracle(sf_dir)
    urls = lbl.column("url").to_pylist()
    cl = lbl.column("cluster_url").to_pylist()
    members = np.sort(np.array([int(u[-8:]) for u in urls], dtype=np.int64))
    cluster_of = {
        int(u[-8:]): int(c[-8:]) for u, c in zip(urls, cl)
    }

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "n_chars"])

    # lengths of clustered docs only (O(clustered docs) driver state)
    from ..util import map_blocks

    members_ref = ray.put(members)

    def member_lens(b: pa.Table):
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        hit = member_mask(ids, ray.get(members_ref))
        return ids[hit], b.column("n_chars").to_numpy(zero_copy_only=False)[hit]

    best: dict = {}  # cluster -> (-n_chars, doc_id)
    for ids, lens in ray.get(map_blocks(member_lens, ds)):
        for i, ln in zip(ids.tolist(), lens.tolist()):
            c = cluster_of[i]
            key = (-ln, i)
            if c not in best or key < best[c]:
                best[c] = key
    winners = {doc for _, doc in best.values()}
    dropped = np.sort(
        np.array([i for i in cluster_of if i not in winners], dtype=np.int64)
    )
    dropped_ref = ray.put(dropped)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(dropped_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~member_mask(ids, d)))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# line_dedup (CCNet-style repeated-segment removal)
# ---------------------------------------------------------------------------

_SEG_WORDS = 10


def _doc_segments(text: str) -> list[str]:
    w = text.split(" ")
    return [
        " ".join(w[j : j + _SEG_WORDS]) for j in range(0, len(w), _SEG_WORDS)
    ]


def _segment_batch(batch: pa.Table):
    """Vectorised segmenting of a whole batch: (segment strings Array,
    per-segment doc_id int64 array, per-segment seg_idx int64 array).

    One split_pattern + one zero-copy flatten + one ListArray re-window +
    one binary_join — no per-word Python; identical output to
    ``_doc_segments`` per doc (pinned by the brute-parity tests)."""
    ws = pc.split_pattern(batch.column("text"), " ")
    la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
    flat = la.flatten()
    offs = la.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    n = len(flat)
    wcount = offs[1:] - offs[:-1]
    doc_start = np.repeat(offs[:-1], wcount)
    pos_in_doc = np.arange(n, dtype=np.int64) - doc_start
    starts = np.flatnonzero(pos_in_doc % _SEG_WORDS == 0)
    lists = pa.ListArray.from_arrays(
        pa.array(np.r_[starts, n], type=pa.int32()), flat
    )
    segs = pc.binary_join(lists, " ")
    nseg = -(-wcount // _SEG_WORDS)  # ceil; >=1 (split never yields [])
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    seg_doc = np.repeat(ids, nseg)
    seg_end = np.cumsum(nseg)
    seg_idx = np.arange(len(seg_doc), dtype=np.int64) - np.repeat(
        seg_end - nseg, nseg
    )
    return segs, seg_doc, seg_idx, nseg


def q_line_dedup(sf_dir: str, *, _broadcast_row_gate: int | None = None):
    """CCNet-style segment dedup: drop every 10-word segment whose exact
    string occurs >= 2 times corpus-wide, keep per-doc order, and return
    (doc_id, clean_text, n_segs, n_removed).

    Physical plan: per-block partial (segment, count) combine -> ONE slim
    sorted aggregation over segment strings -> the (small) duplicated-segment
    set is broadcast (row+byte gated) and each doc is rebuilt in one
    map_batches pass with pc.is_in.  Above the gate the fallback never
    materialises the dup set: segments are exploded once, a sort by segment
    marks duplicate buckets per block (boundary buckets healed on the
    driver, <= 2 per block), and a second sort by (doc_id, seg_idx) rebuilds
    the texts with the same boundary-heal shape."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import heal, map_blocks
    from .queries import _read_mat

    cfg = DedupConfig()
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def seg_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        segs, _, _, _ = _segment_batch(batch)
        g = pa.table({"s": segs}).group_by("s").aggregate([("s", "count")])
        return pa.table(
            {"s": g.column("s"), "cnt": g.column("s_count").cast(pa.int64())}
        )

    partial = heal(
        ds.map_batches(seg_counts, batch_format="pyarrow"),
        s=pa.string(),
        cnt=pa.int64(),
    )
    totals = sorted_aggregate(
        partial,
        ["s"],
        {"cnt": ("cnt", "sum")},
        empty_types=dict(s=pa.string(), cnt=pa.int64()),
    )

    # duplicated segments (cnt >= 2) per block, as raw tasks (no execution)
    def dup_part(block: pa.Table):
        m = pc.greater_equal(block.column("cnt"), 2)
        t = block.filter(m)
        return t.column("s").to_pylist(), t.nbytes

    parts = ray.get(map_blocks(dup_part, totals))
    dup_segs = [s for p, _ in parts for s in p]
    dup_bytes = sum(b for _, b in parts)

    if len(dup_segs) <= row_gate and dup_bytes <= cfg.broadcast_bytes_limit:
        dup_ref = ray.put(pa.array(dup_segs, type=pa.string()))
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_segs": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            }
        )

        def rebuild(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return empty
            segs, _, _, nseg = _segment_batch(batch)
            dup = pc.is_in(segs, value_set=ray.get(dup_ref)).to_numpy(
                zero_copy_only=False
            )
            seg_list = segs.to_pylist()
            ends = np.cumsum(nseg)
            starts = ends - nseg
            clean, n_rm = [], []
            for a, b in zip(starts, ends):
                kept = [seg_list[j] for j in range(a, b) if not dup[j]]
                clean.append(" ".join(kept))
                n_rm.append(int(b - a) - len(kept))
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "clean_text": pa.array(clean, type=pa.string()),
                    "n_segs": pa.array(nseg, type=pa.int64()),
                    "n_removed": pa.array(n_rm, type=pa.int64()),
                }
            )

        return ds.map_batches(rebuild, batch_format="pyarrow")

    return _line_dedup_sorted(ds)


def _merge_partial_docs(boundary: pa.Table) -> pa.Table:
    """Merge per-block partial docs (the block-edge docs of the sorted
    rebuild) back into whole docs, in segment order (first_idx carries it).

    Partials are gated on ``n_kept``, not string truthiness: a partial whose
    only kept segment is "" (a doc whose text ends in a space) must still
    contribute its join separator, exactly as the broadcast path and the
    DuckDB oracle produce."""
    rows_b = sorted(
        boundary.to_pylist(), key=lambda r: (r["doc_id"], r["first_idx"])
    )
    out: dict[int, list] = {}
    for r in rows_b:
        e = out.setdefault(r["doc_id"], [[], 0, 0])
        if r["n_kept"]:
            e[0].append(r["clean_text"])
        e[1] += r["n_segs"]
        e[2] += r["n_removed"]
    return pa.table(
        {
            "doc_id": pa.array(sorted(out), type=pa.int64()),
            "clean_text": pa.array(
                [" ".join(out[i][0]) for i in sorted(out)], type=pa.string()
            ),
            "n_segs": pa.array([out[i][1] for i in sorted(out)], type=pa.int64()),
            "n_removed": pa.array(
                [out[i][2] for i in sorted(out)], type=pa.int64()
            ),
        }
    )


def _line_dedup_sorted(ds):
    """Broadcast-free line-dedup path: explode -> sort by segment (mark
    duplicate buckets, heal block-edge buckets on the driver) -> sort by
    (doc_id, seg_idx) -> per-block doc rebuild with partial-doc heal."""
    import ray

    from ..util import ds_from_refs, split_boundary

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "s": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "seg_idx": pa.array([], pa.int64()),
                }
            )
        segs, seg_doc, seg_idx, _ = _segment_batch(batch)
        return pa.table(
            {
                "s": segs,
                "doc_id": pa.array(seg_doc, type=pa.int64()),
                "seg_idx": pa.array(seg_idx, type=pa.int64()),
            }
        )

    from ..stages.bucketjoin import annotate_bucket_size

    rows = ds.map_batches(explode, batch_format="pyarrow")
    marked = annotate_bucket_size(rows, "s", out_col="_n")
    bydoc = marked.sort(["doc_id", "seg_idx"])

    def rebuild_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_segs": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
                "first_idx": pa.array([], pa.int64()),
                "_boundary": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dup = batch.column("_n").to_numpy(zero_copy_only=False) >= 2
        idx = batch.column("seg_idx").to_numpy(zero_copy_only=False)
        segs = batch.column("s").to_pylist()
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], len(ids)]
        out_id, out_txt, out_n, out_rm, out_fi, out_b = [], [], [], [], [], []
        out_k = []
        for a, b in zip(starts, ends):
            kept = [segs[j] for j in range(a, b) if not dup[j]]
            out_id.append(int(ids[a]))
            out_txt.append(" ".join(kept))
            out_n.append(int(b - a))
            out_rm.append(int(b - a) - len(kept))
            out_k.append(len(kept))
            out_fi.append(int(idx[a]))
            out_b.append(ids[a] == ids[0] or ids[a] == ids[-1])
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "clean_text": pa.array(out_txt, type=pa.string()),
                "n_segs": pa.array(out_n, type=pa.int64()),
                "n_removed": pa.array(out_rm, type=pa.int64()),
                "n_kept": pa.array(out_k, type=pa.int64()),
                "first_idx": pa.array(out_fi, type=pa.int64()),
                "_boundary": pa.array(out_b, type=pa.bool_()),
            }
        )

    part = bydoc.map_batches(
        rebuild_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()
    int_refs, boundary, _ = split_boundary(part)

    def strip(block: pa.Table) -> pa.Table:
        return block.drop_columns(["first_idx", "n_kept"])

    from ..util import map_blocks

    int_refs = [r for r in map_blocks(strip, ds_from_refs(int_refs))]
    if boundary is not None and boundary.num_rows:
        healed = _merge_partial_docs(boundary)
        import ray

        int_refs = int_refs + [ray.put(healed)]
    return ds_from_refs(
        int_refs, doc_id=pa.int64(), clean_text=pa.string(), n_segs=pa.int64(),
        n_removed=pa.int64(),
    )


# ---------------------------------------------------------------------------
# incremental_dedup (Bloom-gated)
# ---------------------------------------------------------------------------


def q_incremental_dedup(sf_dir: str, *, _broadcast_row_gate: int | None = None):
    """Incremental exact dedup: keep every INCOMING doc (odd doc_id) whose
    text does not appear in the BASE corpus (even doc_id).

    Physical plan (the 100-TB onboarding shape): (1) a fixed-size Bloom
    filter of base content hashes is built from per-block bitmaps OR-merged
    on the driver (bytes independent of corpus size; shard by hash at
    larger capacities); (2) one pass over incoming docs — Bloom-negative
    docs are PROVABLY new and skip all joins (the common case when most
    incoming data is fresh); (3) the few Bloom-positive candidates are
    confirmed exactly: a second Bloom over the candidate keys prunes the
    base side to its matching slice, and the surviving (128-bit key) rows
    are compared on the driver under the usual row gate (fallback: the
    sorted semi-join used by ``decontaminate``)."""
    from hashlib import blake2b

    import ray

    from ..stages.bloom import (
        bloom_contains,
        bloom_params,
        build_bloom_distributed,
    )
    from ..util import fast_count, map_blocks
    from .queries import _read_mat

    cfg = DedupConfig()
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    m_bits = bloom_params(fast_count(ds))

    def _digests(texts: list[str]) -> tuple[np.ndarray, list[str]]:
        """(uint64 bloom keys, 128-bit hex confirm keys) per text."""
        h64 = np.empty(len(texts), dtype=np.uint64)
        hx = []
        for i, t in enumerate(texts):
            d = blake2b(t.encode(), digest_size=16).digest()
            h64[i] = int.from_bytes(d[:8], "little")
            hx.append(d.hex())
        return h64, hx

    def base_keys(block: pa.Table) -> np.ndarray:
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        texts = block.column("text").to_pylist()
        h64, _ = _digests([t for i, t in zip(ids, texts) if i % 2 == 0])
        return h64

    base_bloom_ref = ray.put(build_bloom_distributed(ds, base_keys, m_bits))

    # one pass over incoming: split into provably-new vs Bloom candidates
    def incoming_scan(batch: pa.Table) -> pa.Table:
        bloom = ray.get(base_bloom_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        inc = ids % 2 == 1
        t = batch.filter(pa.array(inc))
        h64, hx = _digests(t.column("text").to_pylist())
        hit = bloom_contains(bloom, h64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "key": pa.array(hx, type=pa.string()),
                "hit": pa.array(hit),
            }
        )

    from ..util import heal

    incoming = heal(
        ds.map_batches(incoming_scan, batch_format="pyarrow"),
        doc_id=pa.int64(),
        lang=pa.string(),
        key=pa.string(),
        hit=pa.bool_(),
    )

    # candidate keys -> a second bloom that prunes the base scan
    def cand_keys(block: pa.Table) -> np.ndarray:
        t = block.filter(block.column("hit"))
        if not t.num_rows:
            return np.empty(0, dtype=np.uint64)
        ks = t.column("key").to_pylist()
        return np.array(
            [int.from_bytes(bytes.fromhex(k)[:8], "little") for k in ks],
            dtype=np.uint64,
        )

    n_cand_parts = ray.get(
        map_blocks(lambda b: int(pc.sum(b.column("hit")).as_py() or 0), incoming)
    )
    n_cand = sum(n_cand_parts)
    if n_cand == 0:
        return incoming.select_columns(["doc_id", "lang"])

    cand_bloom_ref = ray.put(
        build_bloom_distributed(
            incoming, cand_keys, bloom_params(n_cand)
        )
    )

    # base slice that can possibly confirm a candidate (bloom-pruned)
    def base_hits(block: pa.Table) -> list[str]:
        bloom = ray.get(cand_bloom_ref)
        ids = block.column("doc_id").to_numpy(zero_copy_only=False)
        texts = block.column("text").to_pylist()
        base = [t for i, t in zip(ids, texts) if i % 2 == 0]
        h64, hx = _digests(base)
        return [k for k, h in zip(hx, bloom_contains(bloom, h64)) if h]

    hit_parts = ray.get(map_blocks(base_hits, ds))
    confirm_keys = {k for p in hit_parts for k in p}
    if len(confirm_keys) > row_gate:
        # fallback: sorted semi-join of candidate keys vs base-hit keys
        return _incremental_confirm_join(incoming, hit_parts)
    confirm_ref = ray.put(confirm_keys)

    def final(batch: pa.Table) -> pa.Table:
        conf = ray.get(confirm_ref)
        keys = batch.column("key").to_pylist()
        hit = batch.column("hit").to_numpy(zero_copy_only=False)
        keep = np.array(
            [not (h and k in conf) for h, k in zip(hit, keys)], dtype=bool
        )
        return batch.filter(pa.array(keep)).select(["doc_id", "lang"])

    return incoming.map_batches(final, batch_format="pyarrow")


def _incremental_confirm_join(incoming, hit_parts):
    """Above-gate confirm: one sorted semi-join (decontaminate shape) of the
    candidate rows against the bloom-pruned base keys, then an anti-filter
    using the confirmed ids (bounded by the true-duplicate count)."""
    import ray
    import ray.data as rd

    from ..stages.bucketjoin import semi_join_by_key
    from ..util import member_mask

    def cand_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("hit"))  # tiny by construction
        return pa.table(
            {
                "key": t.column("key"),
                "doc_id": t.column("doc_id"),
                "ev": pa.array(np.zeros(t.num_rows, dtype=bool)),
            }
        )

    base_keys = sorted({k for p in hit_parts for k in p})
    base_tbl = pa.table(
        {
            "key": pa.array(base_keys, type=pa.string()),
            "doc_id": pa.array([-1] * len(base_keys), type=pa.int64()),
            "ev": pa.array([True] * len(base_keys)),
        }
    )
    rows = incoming.map_batches(cand_rows, batch_format="pyarrow").union(
        rd.from_arrow(base_tbl)
    )
    confirmed = semi_join_by_key(rows, "key", "doc_id", "ev")
    from ..util import map_blocks

    parts = ray.get(
        map_blocks(
            lambda b: b.column("id").to_numpy(zero_copy_only=False), confirmed
        )
    )
    conf_ids = np.sort(
        np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    )
    conf_ref = ray.put(conf_ids)

    def final(batch: pa.Table) -> pa.Table:
        conf = ray.get(conf_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~member_mask(ids, conf))).select(
            ["doc_id", "lang"]
        )

    return incoming.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top_ngrams
# ---------------------------------------------------------------------------


def q_top_ngrams(sf_dir: str, k: int = 100):
    """Global top-k word bigrams by count (ties broken lexicographically) —
    the vocabulary/boilerplate audit every corpus build runs.

    Map-side combined: each block emits its LOCAL (bigram, count) table
    (vectorised: one split_pattern, one zero-copy flatten, one
    binary_join_element_wise, one Arrow hash-count), so the single slim
    aggregation only exchanges distinct grams.  The final top-k is a
    per-block partial top-k merged on the driver (<= k rows per block)."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import heal, map_blocks
    from .queries import _read_mat

    ds = _read_mat(sf_dir, "documents", columns=["text"])
    empty = pa.table(
        {"g": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        flat = la.flatten()
        n = len(flat)
        if n < 2:
            return empty
        offs = la.offsets.to_numpy()
        bi = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
        valid = np.ones(n - 1, dtype=bool)
        ends = offs[1:-1] - offs[0]  # bigrams may not span doc boundaries
        valid[ends[(ends > 0) & (ends < n)] - 1] = False
        t = pa.table({"g": bi.filter(pa.array(valid))})
        g = t.group_by("g").aggregate([("g", "count")])
        return pa.table(
            {"g": g.column("g"), "cnt": g.column("g_count").cast(pa.int64())}
        )

    parts = heal(
        ds.map_batches(partial, batch_format="pyarrow"),
        g=pa.string(),
        cnt=pa.int64(),
    )
    totals = sorted_aggregate(
        parts,
        ["g"],
        {"cnt": ("cnt", "sum")},
        empty_types=dict(g=pa.string(), cnt=pa.int64()),
    )

    def topk(block: pa.Table):
        cnt = block.column("cnt").to_numpy(zero_copy_only=False)
        g = np.asarray(block.column("g").to_pylist(), dtype=object)
        order = np.lexsort((g, -cnt))[:k]
        return g[order], cnt[order]

    merged = ray.get(map_blocks(topk, totals))
    merged = [m for m in merged if len(m[0])]
    if not merged:
        return empty
    g = np.concatenate([m[0] for m in merged])
    cnt = np.concatenate([m[1] for m in merged])
    order = np.lexsort((g, -cnt))[:k]
    return pa.table(
        {
            "g": pa.array(g[order].tolist(), type=pa.string()),
            "cnt": pa.array(cnt[order], type=pa.int64()),
        }
    )


def q_boilerplate_segments(sf_dir: str, min_count: int = 5, k: int = 100):
    """Corpus-wide repeated-segment (boilerplate) report: the exact 10-word
    segments of q_line_dedup's segmentation that occur >= min_count times,
    top-k by (count DESC, segment ASC) — the audit a curation team runs
    BEFORE turning on segment dedup, to see what would be removed (CCNet §3
    / RefinedWeb line-dedup prep).

    Physical shape: per-block partial (segment, count) combine (the
    q_line_dedup emitter) -> ONE slim sorted aggregation over distinct
    segments -> threshold filter -> per-block partial top-k merged on the
    driver (<= k rows per block, like q_top_ngrams)."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import heal, map_blocks
    from .queries import _read_mat

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    empty = pa.table(
        {"s": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def seg_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        segs, _, _, _ = _segment_batch(batch)
        g = pa.table({"s": segs}).group_by("s").aggregate([("s", "count")])
        return pa.table(
            {"s": g.column("s"), "cnt": g.column("s_count").cast(pa.int64())}
        )

    partial = heal(
        ds.map_batches(seg_counts, batch_format="pyarrow"),
        s=pa.string(), cnt=pa.int64(),
    )
    totals = sorted_aggregate(
        partial, ["s"], {"cnt": ("cnt", "sum")},
        empty_types=dict(s=pa.string(), cnt=pa.int64()),
    )

    def topk(block: pa.Table):
        keep = pc.greater_equal(block.column("cnt"), min_count)
        t = block.filter(keep)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        s = np.asarray(t.column("s").to_pylist(), dtype=object)
        order = np.lexsort((s, -cnt))[:k]
        return s[order], cnt[order]

    merged = ray.get(map_blocks(topk, totals))
    merged = [m for m in merged if len(m[0])]
    if not merged:
        return empty
    s = np.concatenate([m[0] for m in merged])
    cnt = np.concatenate([m[1] for m in merged])
    order = np.lexsort((s, -cnt))[:k]
    return pa.table(
        {
            "s": pa.array(s[order].tolist(), type=pa.string()),
            "cnt": pa.array(cnt[order], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# salient_terms (tf/df keyword extraction)
# ---------------------------------------------------------------------------


def q_salient_terms(sf_dir: str, k: int = 3):
    """Top-k salient terms per doc ranked by tf/df (term frequency over
    document frequency — the tf-idf shape with the monotone idf replaced by
    1/df so the score is ONE IEEE division of the same two integers in both
    engines; ties broken lexicographically).

    Physical plan: per-block Arrow hash-count -> distinct (term, doc, tf)
    rows -> df attached by ``annotate_bucket_size`` (sort by term, per-block
    bucket sizes, block-edge heal — no join, no df-table broadcast) -> sort
    by doc -> per-block per-doc top-k with boundary-doc heal.  Both sorts
    are slim (term, doc_id, tf) rows; nothing is driver-resident but the
    <=2-docs-per-block-edge heal."""
    import ray

    from ..stages.bucketjoin import annotate_bucket_size
    from ..util import ds_from_refs, heal, split_boundary
    from .queries import _read_mat

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        flat = la.flatten()
        offs = la.offsets.to_numpy()
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, lens), type=pa.int64()),
                "term": flat,
            }
        )
        g = t.group_by(["doc_id", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "term": g.column("term"),
                "tf": g.column("term_count").cast(pa.int64()),
            }
        )

    rows = heal(
        ds.map_batches(tf_rows, batch_format="pyarrow"),
        doc_id=pa.int64(),
        term=pa.string(),
        tf=pa.int64(),
    )
    with_df = annotate_bucket_size(rows, "term", out_col="df")
    bydoc = with_df.sort(["doc_id", "term"])

    def topk_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "_boundary": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        df = batch.column("df").to_numpy(zero_copy_only=False)
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        bnd_doc = (ids == ids[0]) | (ids == ids[-1])
        out = {c: [] for c in ("doc_id", "term", "tf", "df", "rnk", "_b")}
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], len(ids)]
        for a, b in zip(starts, ends):
            if bnd_doc[a]:
                # ship the boundary doc's full posting list for the heal
                sel = slice(a, b)
                m = b - a
                out["doc_id"].extend(ids[sel].tolist())
                out["term"].extend(terms[sel].tolist())
                out["tf"].extend(tf[sel].tolist())
                out["df"].extend(df[sel].tolist())
                out["rnk"].extend([0] * m)
                out["_b"].extend([True] * m)
                continue
            score = tf[a:b].astype(np.float64) / df[a:b]
            order = np.lexsort((terms[a:b], -score))[:k]
            for r, j in enumerate(order, 1):
                out["doc_id"].append(int(ids[a + j]))
                out["term"].append(terms[a + j])
                out["tf"].append(int(tf[a + j]))
                out["df"].append(int(df[a + j]))
                out["rnk"].append(r)
                out["_b"].append(False)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "term": pa.array(out["term"], type=pa.string()),
                "tf": pa.array(out["tf"], type=pa.int64()),
                "df": pa.array(out["df"], type=pa.int64()),
                "rnk": pa.array(out["rnk"], type=pa.int64()),
                "_boundary": pa.array(out["_b"]),
            }
        )

    part = bydoc.map_batches(
        topk_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        ids = boundary.column("doc_id").to_numpy(zero_copy_only=False)
        tf = boundary.column("tf").to_numpy(zero_copy_only=False)
        df = boundary.column("df").to_numpy(zero_copy_only=False)
        terms = np.asarray(boundary.column("term").to_pylist(), dtype=object)
        order = np.argsort(ids, kind="stable")
        ids, tf, df, terms = ids[order], tf[order], df[order], terms[order]
        rows_out = {c: [] for c in ("doc_id", "term", "tf", "df", "rnk")}
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], len(ids)]
        for a, b in zip(starts, ends):
            score = tf[a:b].astype(np.float64) / df[a:b]
            order = np.lexsort((terms[a:b], -score))[:k]
            for r, j in enumerate(order, 1):
                rows_out["doc_id"].append(int(ids[a + j]))
                rows_out["term"].append(terms[a + j])
                rows_out["tf"].append(int(tf[a + j]))
                rows_out["df"].append(int(df[a + j]))
                rows_out["rnk"].append(r)
        healed = pa.table(
            {
                "doc_id": pa.array(rows_out["doc_id"], type=pa.int64()),
                "term": pa.array(rows_out["term"], type=pa.string()),
                "tf": pa.array(rows_out["tf"], type=pa.int64()),
                "df": pa.array(rows_out["df"], type=pa.int64()),
                "rnk": pa.array(rows_out["rnk"], type=pa.int64()),
            }
        )
        int_refs = int_refs + [ray.put(healed)]
        n_int += healed.num_rows
    return ds_from_refs(
        int_refs, count=n_int, doc_id=pa.int64(), term=pa.string(),
        tf=pa.int64(), df=pa.int64(), rnk=pa.int64(),
    )


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def q_pii_redact(sf_dir: str):
    """PII scrub: replace emails then IPv4s (in that order, so the oracle's
    nested regexp_replace matches byte-for-byte) and count matches.  Fully
    vectorised RE2 kernels (pc.replace_substring_regex /
    count_substring_regex) — the same regex engine DuckDB uses, so the
    semantics are identical by construction."""
    from .queries import _read_mat

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        n_email = pc.count_substring_regex(t, _PII_EMAIL).cast(pa.int64())
        t1 = pc.replace_substring_regex(t, _PII_EMAIL, "<EMAIL>")
        n_ip = pc.count_substring_regex(t1, _PII_IPV4).cast(pa.int64())
        t2 = pc.replace_substring_regex(t1, _PII_IPV4, "<IP>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "clean_text": t2,
                "n_emails": n_email,
                "n_ips": n_ip,
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# oracle SQL (merged into queries.ORACLE_SQL)
# ---------------------------------------------------------------------------

CURATE_QUERIES = {
    "near_dup_dedup": q_near_dup_dedup,
    "near_dup_keep_longest": q_near_dup_keep_longest,
    "line_dedup": q_line_dedup,
    "incremental_dedup": q_incremental_dedup,
    "top_ngrams": q_top_ngrams,
    "pii_redact": q_pii_redact,
    "salient_terms": q_salient_terms,
    "boilerplate_segments": q_boilerplate_segments,
}

CURATE_SQL = {
    "line_dedup": (
        "WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents), "
        "segs AS ("
        "  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx, "
        "         array_to_string(w[(i*10+1):((i+1)*10)], ' ') AS s "
        "  FROM toks, UNNEST(generate_series(0, CAST(ceil(len(w)/10.0) AS BIGINT) - 1)) AS t(i)"
        "), dupseg AS (SELECT s FROM segs GROUP BY s HAVING COUNT(*) >= 2) "
        "SELECT doc_id, "
        "  COALESCE(string_agg(s, ' ' ORDER BY seg_idx) "
        "           FILTER (WHERE s NOT IN (SELECT s FROM dupseg)), '') AS clean_text, "
        "  CAST(COUNT(*) AS BIGINT) AS n_segs, "
        "  CAST(COUNT(*) FILTER (WHERE s IN (SELECT s FROM dupseg)) AS BIGINT) AS n_removed "
        "FROM segs GROUP BY doc_id"
    ),
    "incremental_dedup": (
        "SELECT d.doc_id, d.lang FROM documents d "
        "WHERE d.doc_id % 2 = 1 AND NOT EXISTS ("
        "  SELECT 1 FROM documents b WHERE b.doc_id % 2 = 0 AND b.text = d.text)"
    ),
    # same segmentation as line_dedup; top-100 by (count DESC, segment)
    "boilerplate_segments": (
        "WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents), "
        "segs AS ("
        "  SELECT doc_id, array_to_string(w[(i*10+1):((i+1)*10)], ' ') AS s "
        "  FROM toks, UNNEST(generate_series(0, CAST(ceil(len(w)/10.0) AS BIGINT) - 1)) AS t(i)"
        ") "
        "SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt FROM segs GROUP BY s "
        "HAVING COUNT(*) >= 5 ORDER BY cnt DESC, s LIMIT 100"
    ),
    "top_ngrams": (
        "WITH toks AS (SELECT string_split(text,' ') AS w FROM documents), "
        "ga AS (SELECT w[i] || ' ' || w[i+1] AS g FROM toks, "
        "       UNNEST(generate_series(1, len(w)-1)) AS t(i)) "
        "SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM ga GROUP BY g "
        "ORDER BY cnt DESC, g LIMIT 100"
    ),
    "pii_redact": (
        "SELECT doc_id, "
        f"  regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'), "
        f"                 '{_PII_IPV4}', '<IP>', 'g') AS clean_text, "
        f"  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails, "
        f"  CAST(len(regexp_extract_all(regexp_replace(text, '{_PII_EMAIL}', "
        f"       '<EMAIL>', 'g'), '{_PII_IPV4}')) AS BIGINT) AS n_ips "
        "FROM documents"
    ),
    "salient_terms": (
        "WITH toks AS (SELECT doc_id, string_split(text,' ') AS w FROM documents), "
        "tfx AS ("
        "  SELECT doc_id, w[i] AS term, CAST(COUNT(*) AS BIGINT) AS tf"
        "  FROM toks, UNNEST(generate_series(1, len(w))) AS t(i) GROUP BY 1, 2"
        "), dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY term), "
        "r AS ("
        "  SELECT doc_id, term, tf, df, "
        "         row_number() OVER (PARTITION BY doc_id "
        "           ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS rnk "
        "  FROM tfx JOIN dfx USING (term)"
        ") "
        "SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3"
    ),
    # near_dup_dedup reuses the clusters-oracle CC CTE with a different final
    # SELECT; assembled in queries.py where that CTE lives.
}
