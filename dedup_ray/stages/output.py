"""Final output assembly: apply merged intervals, compute stats, attach
clusters (reference write phase, ``/root/reference/dedup/dedup.py:162-187``
+ ``contig.py:134-191``).

Output schema (FIXTURES.md §2 ``output`` table):
  url, [warc_ts, lang,] text_kept, kept:bool,
  removed_spans:list<struct<start,end>>, cluster_id:int64,
  removed_dup, total_dup, removed_ndup, total_ndup,
  ratio_dup, ratio_ndup, ratio_dnd  (the 3 eps-guarded ratios, dedup.py:183-187)

Exact-dup losers (E5) appear with kept=false and the stats of their
byte-identical winner (full removal).

Physical shape: ONE corpus-wide hash join (survivors x per-doc stats); the
small per-uid annotations (trim intervals, loser shingle sets, cluster ids)
broadcast as sorted-array lookups into the assemble map, falling back to hash
joins above ``cfg.broadcast_classify_limit``.  The assemble map itself is
vectorised for the no-interval fast path (the vast majority of docs — no
re-shingling, no per-row Python); only docs WITH trim intervals drop into the
per-doc trim_text loop.  Exact-loser rows are attached by raw tasks over the
materialised blocks (no extra executions) under the same gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..config import DedupConfig
from ..hashing import shingle_hashes
from .trim import EPS, trim_text

_SPANS_T = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))


def doc_stats(
    matched: Dataset, cfg: DedupConfig, partials: Dataset | None = None
) -> Dataset:
    """Per-doc posting counts from the classified shingle rows:
    (uid, n_multi_postings, n_dup_postings).

    ``partials`` (from the fused exchange, stages/df.shingle_df_classify
    with_doc_partials): aggregate the per-partition per-uid combiner rows
    instead of re-scanning the full matched table — identical output (every
    matched row has tf >= 1, so the partial and scan paths cover exactly the
    same uid set).  The partial volume is n_docs x T (T = exchange task
    partitions), i.e. it GROWS with parallelism — so the aggregation is the
    radix hash exchange (groupagg.hash_sum_aggregate), whose per-combiner
    volume stays ~n_docs independent of T, not a range sort (measured 5x
    slower at 32 vs 8 cpus on the same corpus; see BENCH/BASELINE.md)."""
    import pyarrow.compute as pc

    from .groupagg import hash_sum_aggregate, sorted_aggregate

    if partials is not None:
        return hash_sum_aggregate(
            partials,
            "uid",
            {"n_multi_postings": "n_multi_tf", "n_dup_postings": "n_dup_tf"},
            empty_types=dict(
                uid=pa.int64(), n_multi_postings=pa.int64(), n_dup_postings=pa.int64()
            ),
        )
    lo, hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper

    def add_dup_tf(batch: pa.Table) -> pa.Table:
        d = batch.column("df")
        band = pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        tf_dup = np.where(band.to_numpy(zero_copy_only=False), tf, 0)
        return pa.table(
            {
                "uid": batch.column("uid"),
                "tf": pa.array(tf),
                "tf_dup": pa.array(tf_dup),
            }
        )

    return sorted_aggregate(
        matched.map_batches(add_dup_tf, batch_format="pyarrow"),
        ["uid"],
        {"n_multi_postings": ("tf", "sum"), "n_dup_postings": ("tf_dup", "sum")},
        empty_types=dict(
            uid=pa.int64(), n_multi_postings=pa.int64(), n_dup_postings=pa.int64()
        ),
    )


def _ratio_cols(rd_, td, rn, tn) -> dict:
    rd_ = np.asarray(rd_, dtype=np.float64)
    td = np.asarray(td, dtype=np.float64)
    rn = np.asarray(rn, dtype=np.float64)
    tn = np.asarray(tn, dtype=np.float64)
    return {
        "ratio_dup": pa.array(rd_ / (td + EPS)),
        "ratio_ndup": pa.array(rn / (tn + EPS)),
        "ratio_dnd": pa.array(rd_ / (rn + EPS)),
    }


def _stats_table(out: dict) -> pa.Table:
    cols = {"url": pa.array(out["url"], type=pa.string())}
    cols.update(
        {
            "text_kept": pa.array(out["text_kept"], type=pa.large_string()),
            "kept": pa.array(out["kept"], type=pa.bool_()),
            "removed_spans": pa.array(out["removed_spans"], type=_SPANS_T),
            "cluster_id": pa.array(out["cluster_id"], type=pa.int64()),
            "removed_dup": pa.array(np.asarray(out["removed_dup"], dtype=np.int64)),
            "total_dup": pa.array(np.asarray(out["total_dup"], dtype=np.int64)),
            "removed_ndup": pa.array(np.asarray(out["removed_ndup"], dtype=np.int64)),
            "total_ndup": pa.array(np.asarray(out["total_ndup"], dtype=np.int64)),
        }
    )
    cols.update(
        _ratio_cols(
            out["removed_dup"], out["total_dup"], out["removed_ndup"], out["total_ndup"]
        )
    )
    return pa.table(cols)


def _sorted_lookup(idx_arr: np.ndarray, keys: np.ndarray):
    """searchsorted hit mask + positions of ``keys`` in sorted ``idx_arr``."""
    if len(idx_arr) == 0 or len(keys) == 0:
        return np.zeros(len(keys), dtype=bool), np.zeros(len(keys), dtype=np.int64)
    pos = np.minimum(np.searchsorted(idx_arr, keys), len(idx_arr) - 1)
    return idx_arr[pos] == keys, pos


def _empty_out() -> dict:
    return {
        "url": [], "text_kept": [], "kept": [], "removed_spans": [],
        "cluster_id": [], "removed_dup": [], "total_dup": [],
        "removed_ndup": [], "total_ndup": [],
    }


def _trim_doc(text: str, iv_blob, dup_blob, multi_blob, cfg: DedupConfig):
    """Per-doc trim: intervals blob + dup/multi shingle-set blobs -> (kept
    text, removed spans, (removed_dup, total_dup, removed_ndup, total_ndup))."""
    flat = np.frombuffer(iv_blob, dtype=np.int64)
    intervals = [
        (int(flat[2 * j]), int(flat[2 * j + 1])) for j in range(len(flat) // 2)
    ]
    h = cfg.shingles(text)
    if dup_blob is not None and len(h):
        dup_set = np.frombuffer(dup_blob, dtype=np.int64)
        dup_pos = np.flatnonzero(np.isin(h, dup_set)).astype(np.int64)
    else:
        dup_pos = np.empty(0, dtype=np.int64)
    if multi_blob is not None and len(h):
        multi_set = np.frombuffer(multi_blob, dtype=np.int64)
        uniq_pos = np.flatnonzero(~np.isin(h, multi_set)).astype(np.int64)
    else:
        uniq_pos = np.arange(len(h), dtype=np.int64)
    kept_text, stats = trim_text(text, intervals, dup_pos, uniq_pos, cfg.min_doc_len)
    spans = [{"start": s, "end": e} for s, e in intervals]
    return kept_text, spans, stats


def _assemble_batch(batch: pa.Table, cfg: DedupConfig, lookups=None) -> pa.Table:
    """survivor rows (+ optional joined annotation columns) -> output rows.

    Annotations resolve column-first (hash-join fallback path), then from the
    broadcast ``lookups`` dict {"m": (uid, intervals), "s": (uid, dup, multi),
    "c": (uid, cluster_id)} of sorted arrays.  ``lookups["drop"]`` (sorted uid
    array) removes rows that the trimmed-doc patch path re-emits separately.
    """
    k = cfg.shingle_k
    lookups = lookups or {}
    drop = lookups.get("drop")
    if drop is not None and len(drop) and batch.num_rows:
        uids0 = batch.column("uid").to_numpy(zero_copy_only=False)
        hit, _ = _sorted_lookup(drop, uids0)
        if hit.any():
            batch = batch.filter(pa.array(~hit))
    n = batch.num_rows
    names = batch.column_names
    if n == 0:
        return _stats_table(_empty_out())
    uids = batch.column("uid").to_numpy(zero_copy_only=False)
    n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
    n_post = np.maximum(0, n_chars - k + 1)

    import pyarrow.compute as pc

    if "n_multi_postings" in names:
        n_multi = pc.fill_null(batch.column("n_multi_postings"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_dup = pc.fill_null(batch.column("n_dup_postings"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
    elif "st" in lookups:
        s_uid, s_multi, s_dup = lookups["st"]
        hit, pos = _sorted_lookup(s_uid, uids)
        n_multi = np.where(hit, s_multi[pos] if len(s_multi) else 0, 0).astype(np.int64)
        n_dup = np.where(hit, s_dup[pos] if len(s_dup) else 0, 0).astype(np.int64)
    else:
        n_multi = np.zeros(n, dtype=np.int64)
        n_dup = np.zeros(n, dtype=np.int64)

    # ---- intervals per row (column > lookup > none) ----
    iv_blobs = None
    if "intervals" in names:
        iv_blobs = batch.column("intervals").to_pylist()
    elif "m" in lookups:
        m_uid, m_iv = lookups["m"]
        hit, pos = _sorted_lookup(m_uid, uids)
        if hit.any():
            iv_blobs = [m_iv[p] if h else None for h, p in zip(hit, pos)]

    # ---- cluster id (column > lookup > own uid) ----
    if "cluster_id" in names:
        cl = batch.column("cluster_id").to_pylist()
        cluster = np.array(
            [uids[i] if c is None else c for i, c in enumerate(cl)], dtype=np.int64
        )
    elif "c" in lookups:
        c_uid, c_id = lookups["c"]
        hit, pos = _sorted_lookup(c_uid, uids)
        cluster = np.where(hit, c_id[np.minimum(pos, max(len(c_id) - 1, 0))] if len(c_id) else 0, uids)
    else:
        cluster = uids.copy()

    # ---- fast path: no doc in this batch has trim intervals ----
    trim_rows = (
        [i for i, b in enumerate(iv_blobs) if b] if iv_blobs is not None else []
    )
    n_uniq = n_post - n_multi
    removed_dup = np.zeros(n, dtype=np.int64)
    total_dup = n_dup.copy()
    removed_ndup = np.zeros(n, dtype=np.int64)
    total_ndup = n_uniq.copy()
    if not trim_rows:
        cols = {
            "url": batch.column("url"),
            "text_kept": batch.column("text").cast(pa.large_string()),
            "kept": pa.array(n_chars > 0),
            "removed_spans": pa.array([[]] * n, type=_SPANS_T),
            "cluster_id": pa.array(cluster, type=pa.int64()),
            "removed_dup": pa.array(removed_dup),
            "total_dup": pa.array(total_dup),
            "removed_ndup": pa.array(removed_ndup),
            "total_ndup": pa.array(total_ndup),
        }
        cols.update(_ratio_cols(removed_dup, total_dup, removed_ndup, total_ndup))
        return pa.table(cols)

    # ---- slow path: only the trimmed docs run per-doc Python ----
    texts = batch.column("text").to_pylist()
    text_kept = list(texts)
    spans_out: list = [[]] * n
    dup_col = batch.column("dup_shingles").to_pylist() if "dup_shingles" in names else None
    multi_col = (
        batch.column("multi_shingles").to_pylist() if "multi_shingles" in names else None
    )
    s_lk = lookups.get("s")
    for i in trim_rows:
        dup_blob = multi_blob = None
        if dup_col is not None:
            dup_blob, multi_blob = dup_col[i], multi_col[i]
        elif s_lk is not None:
            s_uid, s_dup, s_multi = s_lk
            hit, pos = _sorted_lookup(s_uid, uids[i : i + 1])
            if hit[0]:
                dup_blob, multi_blob = s_dup[pos[0]], s_multi[pos[0]]
        kept_text, spans, stats = _trim_doc(
            texts[i], iv_blobs[i], dup_blob, multi_blob, cfg
        )
        text_kept[i] = kept_text
        spans_out[i] = spans
        removed_dup[i], total_dup[i], removed_ndup[i], total_ndup[i] = stats
    kept = np.array([t != "" for t in text_kept])
    cols = {
        "url": batch.column("url"),
        "text_kept": pa.array(text_kept, type=pa.large_string()),
        "kept": pa.array(kept),
        "removed_spans": pa.array(spans_out, type=_SPANS_T),
        "cluster_id": pa.array(cluster, type=pa.int64()),
        "removed_dup": pa.array(removed_dup),
        "total_dup": pa.array(total_dup),
        "removed_ndup": pa.array(removed_ndup),
        "total_ndup": pa.array(total_ndup),
    }
    cols.update(_ratio_cols(removed_dup, total_dup, removed_ndup, total_ndup))
    return pa.table(cols)


def _build_lookup_task(cols, *tables):
    """Remote body of :func:`_collect_lookup`: concat + uid-argsort the
    annotation blocks into the sorted-array lookup tuple."""
    tables = [t for t in tables if t.num_rows and t.num_columns]
    if not tables:
        return (np.empty(0, dtype=np.int64),) + tuple(
            np.empty(0, dtype=object) for _ in cols
        )
    t = pa.concat_tables(tables).combine_chunks()
    uid = t.column("uid").to_numpy(zero_copy_only=False)
    order = np.argsort(uid)  # unique keys: stability moot
    out = [uid[order]]
    for c in cols:
        col = t.column(c)
        if pa.types.is_integer(col.type):
            out.append(col.to_numpy(zero_copy_only=False)[order])
        else:
            vals = col.to_pylist()
            out.append(np.array([vals[i] for i in order], dtype=object))
    return tuple(out)


def _collect_lookup(ds: Dataset, cols: list[str], cfg: DedupConfig):
    """ObjectRef of a sorted-array lookup tuple for a small per-uid
    annotation table, or None when the table exceeds the broadcast gates —
    row count AND bytes (blob columns like shingle sets blow a
    row-count-only gate) — in which case the caller hash-joins instead.

    The build (concat + argsort) runs in ONE remote task per lookup, so the
    driver never deserialises the annotation bytes and independent lookups
    build concurrently — the gates are resolved from metadata only.  A
    table whose size metadata is unavailable takes the join fallback (the
    safe answer at scale)."""
    import ray

    from ..util import fast_count

    if fast_count(ds) > cfg.broadcast_classify_limit:
        return None
    mat = ds.materialize()
    try:
        sb = mat.size_bytes()
    except Exception:
        return None
    if sb is not None and sb > cfg.broadcast_bytes_limit:
        return None
    return ray.remote(_build_lookup_task).remote(cols, *mat.to_arrow_refs())


def _patch_trimmed(survivors: Dataset, sets: Dataset, m_ref, c_ref, cfg: DedupConfig):
    """Trimmed-doc output rows computed directly on the per-trim-doc
    shingle-set blocks (raw tasks), instead of hash-joining the blob table
    against the full corpus — that join ships every survivor's text through a
    shuffle just to annotate the small trimmed minority (measured 9.4 s of a
    68.7 s run at 843 MiB).

    ``m_ref`` / ``c_ref`` are the ObjectRefs of the merged-interval and
    cluster lookup tuples (built off-driver by :func:`_collect_lookup`);
    their bytes are only ever dereferenced inside raw tasks.

    Returns (drop_uids, patch_block_refs, n_patch) — the caller removes
    ``drop_uids`` from the fast-path output and appends the patch blocks — or
    None when the trimmed-doc text exceeds the broadcast gate (caller falls
    back to the join).
    """
    import ray

    from ..util import block_refs

    empty = (np.empty(0, dtype=np.int64), [], 0)
    n_m = ray.get(ray.remote(lambda lk: len(lk[0])).remote(m_ref))
    if n_m == 0:
        return empty
    sets_mat = sets.materialize()
    s_refs = block_refs(sets_mat)
    if not s_refs:
        return empty

    @ray.remote
    def hit_uids(b: pa.Table):
        uids = b.column("uid").to_numpy(zero_copy_only=False)
        hit, _ = _sorted_lookup(ray.get(m_ref)[0], uids)
        return np.sort(uids[hit])

    parts = [h for h in ray.get([hit_uids.remote(r) for r in s_refs]) if len(h)]
    if not parts:
        return empty
    drop_uids = np.sort(np.concatenate(parts))

    # text-bytes gate: the trimmed docs' text is pinned in ONE plasma object;
    # estimate from the survivors' mean row size before collecting
    surv_mat = survivors.materialize()
    try:
        n_surv = surv_mat.count()
        est = surv_mat.size_bytes() / max(n_surv, 1) * len(drop_uids)
    except Exception:
        est = None
    if est is not None and est > cfg.broadcast_text_bytes:
        return None

    du_ref = ray.put(drop_uids)

    @ray.remote
    def texts_block(b: pa.Table):
        uids = b.column("uid").to_numpy(zero_copy_only=False)
        hit, _ = _sorted_lookup(ray.get(du_ref), uids)
        return b.filter(pa.array(hit)).select(["uid", "text"])

    ttables = [
        t
        for t in ray.get([texts_block.remote(r) for r in block_refs(surv_mat)])
        if t.num_rows
    ]
    if not ttables:
        return empty
    tt = pa.concat_tables(ttables).combine_chunks()
    if tt.nbytes > cfg.broadcast_text_bytes:
        return None
    tu = tt.column("uid").to_numpy(zero_copy_only=False)
    txt_ref = ray.put(tt.take(pa.array(np.argsort(tu))))

    @ray.remote(num_returns=2)
    def patch_block(b: pa.Table):
        mu, miv = ray.get(m_ref)
        uids = b.column("uid").to_numpy(zero_copy_only=False)
        hit, pos = _sorted_lookup(mu, uids)
        sub = b.filter(pa.array(hit))
        n = sub.num_rows
        if n == 0:
            return _stats_table(_empty_out()), 0
        suids = sub.column("uid").to_numpy(zero_copy_only=False)
        iv_sel = [miv[p] for p in pos[hit]]
        txt = ray.get(txt_ref)
        tuids = txt.column("uid").to_numpy(zero_copy_only=False)
        thit, tpos = _sorted_lookup(tuids, suids)
        if not thit.all():
            raise RuntimeError("trimmed uid missing from survivors text table")
        texts = txt.take(pa.array(tpos)).column("text").to_pylist()
        dup_blobs = sub.column("dup_shingles").to_pylist()
        multi_blobs = sub.column("multi_shingles").to_pylist()
        cu, cid = ray.get(c_ref)
        chit, cpos = _sorted_lookup(cu, suids)
        clus = np.where(
            chit, cid[np.minimum(cpos, max(len(cid) - 1, 0))] if len(cid) else 0, suids
        ).astype(np.int64)
        out = _empty_out()
        out["url"] = sub.column("url").to_pylist()
        out["cluster_id"] = clus.tolist()
        for i in range(n):
            kept_text, spans, st = _trim_doc(
                texts[i], iv_sel[i], dup_blobs[i], multi_blobs[i], cfg
            )
            out["text_kept"].append(kept_text)
            out["kept"].append(kept_text != "")
            out["removed_spans"].append(spans)
            out["removed_dup"].append(st[0])
            out["total_dup"].append(st[1])
            out["removed_ndup"].append(st[2])
            out["total_ndup"].append(st[3])
        t = _stats_table(out)
        return t, t.num_rows

    outs = [patch_block.remote(r) for r in s_refs]
    counts = ray.get([o[1] for o in outs])
    refs = [o[0] for o, c in zip(outs, counts) if c]
    return drop_uids, refs, int(sum(counts))


def assemble_output(
    survivors: Dataset,
    merged_intervals: Dataset,
    stats: Dataset,
    sets: Dataset,
    clusters: Dataset,
    exact_edges: Dataset,
    cfg: DedupConfig,
) -> Dataset:
    """One corpus join (stats) + broadcast annotations + raw-task loser rows."""
    import os
    import time

    import ray

    from ..util import block_refs, ds_from_refs, fast_count, heal, map_blocks

    _timing = bool(os.environ.get("DEDUP_RAY_TIMING"))
    _last = [time.perf_counter()]

    def tick(name):
        if _timing:
            now = time.perf_counter()
            print(f"[timing]   assemble/{name}: {now - _last[0]:.2f}s", flush=True)
            _last[0] = now

    npart = cfg.join_partitions()
    lookups = {}  # key -> ObjectRef of a sorted-array lookup tuple
    ds = survivors
    patch = None
    lks = {}
    # gates resolve from metadata; the builds are remote tasks that run
    # CONCURRENTLY (nothing is ray.get here) — the driver never touches the
    # annotation bytes
    for key, right, cols in (
        ("m", merged_intervals, ["intervals"]),
        ("c", clusters, ["cluster_id"]),
        ("s", sets, ["dup_shingles", "multi_shingles"]),
    ):
        lks[key] = _collect_lookup(right, cols, cfg)
        tick(f"lookup_{key}")
        if lks[key] is not None:
            lookups[key] = lks[key]
    if lks["s"] is None and lks["m"] is not None and lks["c"] is not None:
        # blob table over the broadcast gate: compute the trimmed-doc rows
        # where the blobs live instead of joining them into the corpus
        patch = _patch_trimmed(survivors, sets, lks["m"], lks["c"], cfg)
        tick("patch_trimmed")
        if patch is not None:
            lookups["drop"] = ray.put(patch[0])
    for key, right, cols, fields in (
        ("m", merged_intervals, ["intervals"], dict(uid=pa.int64(), intervals=pa.large_binary())),
        (
            "s",
            sets,
            ["dup_shingles", "multi_shingles"],
            dict(uid=pa.int64(), dup_shingles=pa.large_binary(), multi_shingles=pa.large_binary()),
        ),
        ("c", clusters, ["cluster_id"], dict(uid=pa.int64(), cluster_id=pa.int64())),
    ):
        if lks[key] is not None or (key == "s" and patch is not None):
            continue
        right = heal(right if key != "s" else right.select_columns(["uid"] + cols), **fields)
        ds = heal(
            ds.join(right, "left_outer", num_partitions=npart, on=("uid",)),
            uid=pa.int64(),
        )
        tick(f"join_{key}")

    # per-doc posting stats: 24 bytes/doc — broadcast under the gates (the
    # corpus-row-count gate engages the left-outer join fallback at scale,
    # where 10^10 x 24B no longer fits one object)
    st_lk = _collect_lookup(stats, ["n_multi_postings", "n_dup_postings"], cfg)
    tick("lookup_stats")
    if st_lk is not None:
        lookups["st"] = st_lk
    elif fast_count(stats) > 0:
        ds = ds.join(stats, "left_outer", num_partitions=npart, on=("uid",))
    # (stats empty anywhere: _assemble_batch defaults to zeros)

    lk_refs = dict(lookups)  # refs serialize with the closure

    def assemble(b: pa.Table) -> pa.Table:
        return _assemble_batch(
            b, cfg, {k: ray.get(r) for k, r in lk_refs.items()}
        )

    main = ds.map_batches(
        assemble, batch_format="pyarrow", batch_size=256
    ).materialize()
    n_main = main.count()
    if patch is not None and patch[2]:
        # append the trimmed-doc patch rows computed on the sets blocks
        main = ds_from_refs(block_refs(main) + patch[1], count=n_main + patch[2])
        n_main += patch[2]
    tick("stats_join_and_assemble")

    # exact losers: full removal with the byte-identical winner's stats and
    # cluster.  Broadcast path: winner rows fetched from the materialised main
    # blocks by raw tasks, loser rows built per edge block — no executions.
    n_edges = fast_count(exact_edges)
    if n_edges == 0:
        return main
    if n_edges <= cfg.broadcast_classify_limit:
        edges_mat = exact_edges.materialize()

        def edge_urls(b: pa.Table):
            return np.unique(np.asarray(b.column("winner_url").to_pylist(), dtype=object))

        wsets = [w for w in ray.get(map_blocks(edge_urls, edges_mat)) if len(w)]
        wurls = (
            np.sort(np.unique(np.concatenate(wsets)))
            if wsets
            else np.empty(0, dtype=object)
        )
        wref = ray.put(wurls)

        def wslim(b: pa.Table) -> pa.Table:
            wu = ray.get(wref)
            urls = np.asarray(b.column("url").to_pylist(), dtype=object)
            if len(wu) == 0:
                hit = np.zeros(len(urls), dtype=bool)
            else:
                pos = np.minimum(np.searchsorted(wu, urls), len(wu) - 1)
                hit = wu[pos] == urls
            return b.filter(pa.array(hit)).select(
                ["url", "total_dup", "total_ndup", "cluster_id"]
            )

        wtables = [t for t in ray.get(map_blocks(wslim, main)) if t.num_rows]
        if wtables:
            wt = pa.concat_tables(wtables).combine_chunks()
            wu = np.asarray(wt.column("url").to_pylist(), dtype=object)
            order = np.argsort(wu)  # unique keys: stability moot
            winfo_ref = ray.put(
                (
                    wu[order],
                    wt.column("total_dup").to_numpy(zero_copy_only=False)[order],
                    wt.column("total_ndup").to_numpy(zero_copy_only=False)[order],
                    wt.column("cluster_id").to_numpy(zero_copy_only=False)[order],
                )
            )
        else:
            e = np.empty(0, dtype=np.int64)
            winfo_ref = ray.put((np.empty(0, dtype=object), e, e, e))

        def loser_rows(b: pa.Table):
            ku, kdup, kndup, kcl = ray.get(winfo_ref)
            wurl = np.asarray(b.column("winner_url").to_pylist(), dtype=object)
            if len(ku) == 0:
                t = _stats_table(
                    {
                        "url": [], "text_kept": [], "kept": [], "removed_spans": [],
                        "cluster_id": [], "removed_dup": [], "total_dup": [],
                        "removed_ndup": [], "total_ndup": [],
                    }
                )
                return t, 0
            pos = np.minimum(np.searchsorted(ku, wurl), len(ku) - 1)
            # winners are always present in main (they are survivors)
            m = b.num_rows
            t = _stats_table(
                {
                    "url": b.column("url").to_pylist(),
                    "text_kept": [""] * m,
                    "kept": [False] * m,
                    "removed_spans": [[] for _ in range(m)],
                    "cluster_id": kcl[pos].tolist(),
                    "removed_dup": kdup[pos],
                    "total_dup": kdup[pos],
                    "removed_ndup": kndup[pos],
                    "total_ndup": kndup[pos],
                }
            )
            return t, t.num_rows

        outs = map_blocks(loser_rows, edges_mat, num_returns=2)
        counts = ray.get([o[1] for o in outs])
        tick("exact_losers")
        loser_refs = [o[0] for o, c in zip(outs, counts) if c]
        return ds_from_refs(
            block_refs(main) + loser_refs, count=n_main + int(sum(counts))
        )

    # join fallback (loser table over the broadcast gate)
    def main_slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "winner_url": batch.column("url"),
                "w_dup": batch.column("total_dup"),
                "w_ndup": batch.column("total_ndup"),
                "w_cluster": batch.column("cluster_id"),
            }
        )

    slim = main.map_batches(main_slim, batch_format="pyarrow")
    joined = exact_edges.join(slim, "inner", num_partitions=npart, on=("winner_url",))

    def loser_rows_join(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {
            "url": batch.column("url").to_pylist(),
            "text_kept": [""] * n,
            "kept": [False] * n,
            "removed_spans": [[] for _ in range(n)],
            "cluster_id": batch.column("w_cluster").to_pylist(),
            "removed_dup": batch.column("w_dup").to_pylist(),
            "total_dup": batch.column("w_dup").to_pylist(),
            "removed_ndup": batch.column("w_ndup").to_pylist(),
            "total_ndup": batch.column("w_ndup").to_pylist(),
        }
        return _stats_table(out)

    losers = joined.map_batches(loser_rows_join, batch_format="pyarrow")
    return main.union(losers)
