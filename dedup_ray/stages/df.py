"""A1/A3/A4 — shingle document-frequency table, histogram, band classification.

Analogue of the reference's KMC count DBs + band filter/intersect
(``/root/reference/dedup/kmer_utilities.py:89-149``) and count-of-counts
histogram (``kmer_spectrum.py:34-68``).  Because corpus == reads == assembly
in the web re-expression (SURVEY.md §2.4 A2), a single DF table serves both
counting passes:

  df == 1                       -> "unique" shingle  (reference band [1,1])
  df in [dup_lower, dup_upper]  -> "duplicated"      (reference band [2,4])
  df >  dup_upper               -> neither (boilerplate; ignored, which also
                                   suppresses hot-shingle skew — the analogue
                                   of KMC's -cs255 saturation)

Only shingles with df >= 2 are ever materialised in the classification table;
a doc-side shingle missing from it is by definition unique (df == 1).  This
keeps the join small: the "unique" class — the overwhelming majority of
shingles — never moves through the classification shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..config import DedupConfig
from .shingle import df_partials_batch


def df_table(pairs: Dataset, cfg: DedupConfig) -> Dataset:
    """(shingle, uid, tf) -> (shingle, df).  THE wide shuffle (A1).

    Uses the sort-based vectorized aggregation (groupagg.sorted_aggregate):
    Ray's native aggregate pays per-key Python overhead, fatal at shingle
    cardinality."""
    from .groupagg import sorted_aggregate

    import pyarrow as pa

    partials = pairs.map_batches(df_partials_batch, batch_format="pyarrow")
    return sorted_aggregate(
        partials, ["shingle"], {"df": ("n", "sum")},
        empty_types=dict(shingle=pa.int64(), df=pa.int64()),
    )


def df_multi(df: Dataset, cfg: DedupConfig) -> Dataset:
    """Shingles with df >= 2 (everything the classification join needs).

    Raw-task filter over the materialised DF blocks — no executor spin-up;
    the full DF table (mostly df==1 rows) is dropped right here."""
    import pyarrow as pa
    import ray

    from ..util import ds_from_refs, map_blocks

    mat = df.materialize()

    def filt(b: pa.Table):
        t = b.filter(pc.greater_equal(b.column("df"), 2))
        return t, t.num_rows

    outs = map_blocks(filt, mat, num_returns=2)
    counts = ray.get([o[1] for o in outs])
    refs = [o[0] for o, c in zip(outs, counts) if c]
    return ds_from_refs(
        refs, count=int(sum(counts)), shingle=pa.int64(), df=pa.int64()
    )


def df_histogram(df: Dataset) -> Dataset:
    """(df, n_shingles) count-of-counts (A3) — tiny; safe to take_all()."""
    return df.groupby("df").aggregate(Count(alias_name="n_shingles"))


def classify_pairs(pairs: Dataset, multi: Dataset, cfg: DedupConfig) -> Dataset:
    """Annotate doc-side (shingle, uid, tf) rows with df for df>=2 shingles
    (A4/A5).  Output (shingle, uid, tf, df); shingles absent are unique
    (df == 1), reconstructed locally at annotation time.

    Two physical forms (the small-side broadcast rule, SURVEY.md §4.2):
      * broadcast: the df>=2 table is ray.put once as sorted numpy arrays and
        every pairs batch classifies via searchsorted — no shuffle of the
        (much larger) pairs table.  Chosen when the table fits
        ``cfg.broadcast_classify_limit`` rows.
      * join: hash-shuffle join for when the df>=2 table itself is too large
        to broadcast (the 100-TB path).
    """
    from ..util import fast_count

    n_multi = fast_count(multi)
    if n_multi <= cfg.broadcast_classify_limit:
        return _classify_broadcast(pairs, multi, cfg)
    return pairs.join(
        multi, "inner", num_partitions=cfg.join_partitions(), on=("shingle",)
    )


def _classify_broadcast(pairs: Dataset, multi: Dataset, cfg: DedupConfig) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import ray

    tables = [
        t for t in ray.get(multi.to_arrow_refs()) if t.num_rows and t.num_columns
    ]
    if tables:
        big = pa.concat_tables(tables)
        keys = big.column("shingle").to_numpy(zero_copy_only=False)
        dfs = big.column("df").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order], dfs[order]))
    else:
        z = np.empty(0, dtype=np.int64)
        ref = ray.put((z, z))

    # plain tasks, not an actor pool: ray.get of a plasma object inside a
    # task is a zero-copy shared-memory read on the node, and a pool with
    # reserved CPUs would starve co-running stages on small machines.
    def classify(batch: pa.Table) -> pa.Table:
        keys, dfs = ray.get(ref)
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            sub = batch.slice(0, 0)
            return sub.append_column("df", pa.array([], type=pa.int64()))
        idx = np.searchsorted(keys, sh)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == sh
        sub = batch.filter(pa.array(hit))
        return sub.append_column("df", pa.array(dfs[idx_c[hit]], type=pa.int64()))

    return pairs.map_batches(classify, batch_format="pyarrow")


def shingle_df_classify(
    survivors: Dataset,
    cfg: DedupConfig,
    *,
    with_doc_partials: bool = False,
    with_pair_partials: bool = False,
):
    """Fused A1+A4: ONE shingling pass over the materialised survivor blocks,
    then a single-round B x P raw-task hash exchange on ``shingle % P`` whose
    reduce computes the per-partition DF counts AND classifies its own rows in
    place — no driver-side lookup build, no broadcast, no second pass over the
    postings.

    Returns (multi, matched) as materialised ref-datasets, both partitioned by
    ``shingle % P`` (rows unordered within a partition — every consumer
    groups by its own key anyway: candidates lexsort the small dup band,
    doc stats / dup sets aggregate by uid).

    ``with_pair_partials=True`` additionally returns raw dup-band candidate
    pair rows (ua, ub) emitted INSIDE the reduce, where each partition's rows
    are already grouped by shingle — the flagship's candidate stage then only
    aggregates those pairs (distinct + n_buckets) instead of re-reading and
    re-sorting the matched table (stages/lsh.candidate_pairs_dup_index does
    that standalone pass for non-fused callers).  Dup-band buckets hold at
    most ``cfg.duplicate_df_upper`` docs, so emission is O(rows) with a
    C(df_upper, 2) constant — the same skew-free bound as the standalone
    path.

    Why not ``Dataset.sort``: the DF table needs grouping, not global order.
    Measured on this node, the sort's sample+exchange+merge pipeline scaled
    only ~1.6x from 8->32 cpus at ~100M rows, while the one-round hash
    exchange is one map + one reduce with B x P mid-size objects — the same
    shape the exchange has on a multi-node cluster.  Fusing classification
    into the reduce removes the three serial/bandwidth tails the previous
    design had (a full unsplit postings copy in plasma, a single-threaded
    driver concat+argsort of the df>=2 table, and a separate classify wave
    re-reading every posting block).

    At 100-TB scale the per-partition reduce memory is bounded by raising
    ``cfg.num_partitions`` (rows/P per task); no stage here ever holds more
    than one partition.  Exchange tasks charge ``cfg.exchange_task_cpus()``
    CPUs — bandwidth-bound waves run at physical-core width, not
    hyperthread width.
    """
    import os
    import time

    import numpy as np
    import ray

    from ..util import block_refs, ds_from_refs
    from .shingle import shingle_pairs_local

    _timing = bool(os.environ.get("DEDUP_RAY_TIMING"))
    _last = [time.perf_counter()]

    def tick(name, futures=None):
        # attribution barrier: only when timing — ray.wait here would
        # otherwise serialise waves that normally overlap
        if _timing:
            if futures:
                ray.wait(futures, num_returns=len(futures), fetch_local=False)
            now = time.perf_counter()
            print(f"[timing/df] {name}: {now - _last[0]:.2f}s", flush=True)
            _last[0] = now

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    tcpus = cfg.exchange_task_cpus()
    mat = survivors.materialize()
    refs = block_refs(mat)
    tick("survivors_blocks")
    B = len(refs)
    # Two-level partitioning: T task partitions (one reduce task each), each
    # covering G consecutive FINE partitions that the task processes
    # SEQUENTIALLY.  The fine granularity bounds the reduce's concat+argsort
    # working set to ~cfg.exchange_part_rows rows — on bandwidth-limited
    # hosts a 44M-row sort runs at 6.9M rows/s vs 32-94M rows/s at 5-11M
    # rows (round-4 microbench, BENCH/BASELINE.md) — while the task
    # granularity keeps the per-uid combiner volume at n_docs x T (the
    # partials are emitted once per TASK, not once per fine slice; a fine-
    # grained single-level P would inflate them P/T-fold).  The same split
    # is how a multi-node reduce bounds memory regardless of corpus size.
    est_rows = int(mat.size_bytes() or 0)  # ~1 shingle/char
    T = max(8, min(cfg.num_partitions, 2 * cpus))
    G = max(1, -(-est_rows // max(1, cfg.exchange_part_rows * T)))
    G = min(G, max(1, cfg.exchange_max_partitions // T))
    P = T * G  # fine partitions; shingle % P
    # ---- bounded-memory rounds ----
    # The exchange's map wave materialises the FULL posting set (~12 bytes
    # per character at the narrow wire) in the object store before the
    # reduces drain it.  Once that exceeds the store, plasma spills to disk
    # at disk-write speed and the run is I/O-bound (measured: a 1M-doc corpus
    # spilled 33 GB at 31-95 MiB/s — 2x the total wall).  When the estimate
    # exceeds a fraction of the store, run the exchange in R rounds over
    # partition ranges: each round re-shingles the survivor blocks (cheap,
    # vectorized — ~85 CPU-s per pass for 300k docs) but only EMITS and
    # reduces partitions in its range, and the round's map outputs are freed
    # before the next round starts.  Peak store usage drops to ~postings/R +
    # the (much smaller) df>=2 survivors.  On a real multi-node cluster the
    # same knob bounds per-node shuffle memory; R scales with data/store.
    try:
        store_bytes = int(ray.cluster_resources().get("object_store_memory", 16 << 30))
    except Exception:
        store_bytes = 16 << 30
    est_postings = int(mat.size_bytes() or 0) * 12  # ~1 shingle/char, 12 B wire
    env_r = os.environ.get("DEDUP_RAY_EXCHANGE_ROUNDS")
    if env_r:
        R = max(1, int(env_r))
    else:
        R = max(1, -(-est_postings // max(1, int(store_bytes * 0.45))))
    R = min(R, T // 4) if T >= 8 else 1
    if _timing and R > 1:
        print(f"[timing/df] exchange rounds: {R} (est {est_postings >> 20} MiB)", flush=True)
    if B == 0:
        empty_multi = ds_from_refs([], count=0, shingle=pa.int64(), df=pa.int64())
        empty_matched = ds_from_refs(
            [], count=0, shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64()
        )
        out = [empty_multi, empty_matched]
        if with_doc_partials:
            out.append(
                ds_from_refs(
                    [], count=0, uid=pa.int64(), n_multi_tf=pa.int64(),
                    n_dup_cnt=pa.int64(), n_dup_tf=pa.int64(),
                )
            )
        if with_pair_partials:
            out.append(ds_from_refs([], count=0, ua=pa.int64(), ub=pa.int64()))
        return tuple(out) if len(out) > 2 else (out[0], out[1])

    @ray.remote(num_cpus=tcpus)
    def shingle_split(block: pa.Table, plo: int, phi: int):
        # rows are distinct per (shingle, uid), so df == global row count per
        # shingle.  Partition rows by shingle % P with ONE stable argsort on
        # the partition id (radix for small ints) + one gather per column —
        # not P masked passes over the full array.  Only partitions in
        # [plo, phi) are emitted (the caller's bounded-memory round); rows
        # outside the range are dropped before the sort, so R rounds cost R
        # shinglings but the same total sort/gather work.
        #
        # Wire width: postings ship as (shingle:8, uidx:2-or-4, tf:2-or-4)
        # instead of (shingle:8, uid:8, tf:4) — uidx is the doc's index into
        # this block's uid lut (attached once per partition table as schema
        # metadata, ~8 bytes/doc), 40% narrower at the common widths.  Both
        # narrow dtypes are gated exactly: uidx needs the block's doc count
        # < 65536, tf needs the block's max tf < 65536; otherwise the wide
        # dtype rides and the reduce's numpy concat promotes losslessly.
        sh, uidx, tf, lut = shingle_pairs_local(block, cfg=cfg)
        # narrow partition ids: numpy's stable sort IS a radix sort for 1- and
        # 2-byte ints (it is timsort for wider ints), so one byte of key means
        # one counting pass
        part = (sh % P).astype(np.uint8 if P <= 256 else np.uint16)
        k = phi - plo
        if k != P:
            m = (part >= plo) & (part < phi)
            sh, uidx, tf, part = sh[m], uidx[m], tf[m], part[m] - plo
            part = part.astype(np.uint8 if k <= 256 else np.uint16)
        order = np.argsort(part, kind="stable")
        counts = np.bincount(part, minlength=k)
        bounds = np.r_[0, np.cumsum(counts)]
        shs, uidxs, tfs = sh[order], uidx[order], tf[order]
        if len(lut) <= 65535:
            uidxs = uidxs.astype(np.uint16)
        if len(tfs) and tfs.max() < 65536:
            tfs = tfs.astype(np.uint16)
        meta = {b"uid_lut": lut.tobytes()}
        out = tuple(
            pa.table(
                {
                    "shingle": pa.array(shs[bounds[p] : bounds[p + 1]]),
                    "uidx": pa.array(uidxs[bounds[p] : bounds[p + 1]]),
                    "tf": pa.array(tfs[bounds[p] : bounds[p + 1]]),
                }
            ).replace_schema_metadata(meta)
            for p in range(k)
        )
        return out if k > 1 else out[0]

    def _np_col(t: pa.Table, name: str) -> np.ndarray:
        # single-chunk columns built from numpy: zero-copy view
        col = t.column(name)
        if col.num_chunks == 1:
            return col.chunk(0).to_numpy(zero_copy_only=False)
        return col.to_numpy(zero_copy_only=False)

    _e64 = np.empty(0, dtype=np.int64)
    _empty_partials = pa.table(
        {
            "uid": pa.array(_e64),
            "n_multi_tf": pa.array(_e64),
            "n_dup_cnt": pa.array(_e64),
            "n_dup_tf": pa.array(_e64),
        }
    )
    band_lo, band_hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper

    _empty_pairs = pa.table({"ua": pa.array(_e64), "ub": pa.array(_e64)})

    @ray.remote(num_cpus=tcpus, num_returns=5)
    def reduce_classify(emit_pairs, n_blocks, *parts):
        # ``parts``: n_fine x n_blocks tables, fine-major (all blocks of fine
        # slice 0, then fine slice 1, ...).  Each fine slice is a complete
        # shingle-hash partition and is processed SEQUENTIALLY so the
        # concat+argsort working set stays at ~cfg.exchange_part_rows rows;
        # outputs and the per-uid combiner accumulate across slices and are
        # emitted ONCE per task (so partials volume is n_docs x T, not x P).
        n_fine = len(parts) // n_blocks
        # per-BLOCK luts are identical across that block's fine slices (the
        # map attaches the same metadata to every slice): read them once
        luts = [
            np.frombuffer(parts[b].schema.metadata[b"uid_lut"], dtype=np.int64)
            for b in range(n_blocks)
        ]
        offs = np.r_[0, np.cumsum([len(l) for l in luts])]
        all_lut = np.concatenate(luts) if luts else np.empty(0, dtype=np.int64)
        nd = len(all_lut)
        idx_t = np.int64 if nd > (1 << 31) - 1 else np.int32
        acc_multi_tf = np.zeros(nd, dtype=np.int64)
        acc_dup_cnt = np.zeros(nd, dtype=np.int64)
        acc_dup_tf = np.zeros(nd, dtype=np.int64)
        m_parts, matched_parts, pair_parts = [], [], []
        for j in range(n_fine):
            live = [
                (parts[j * n_blocks + b], offs[b])
                for b in range(n_blocks)
                if parts[j * n_blocks + b].num_rows
            ]
            if not live:
                continue
            # Grouping strategy, measured both ways: acero's hash group_by +
            # index_in beats this argsort ~1.4x when ONE task runs alone, but
            # under the real pipeline's concurrent reduce wave it LOSES ~1.5x
            # — hash tables are latency-bound random access and collapse when
            # co-running tasks share the memory system, while the sort is
            # prefetchable streaming.  Default (introsort) argsort, NOT
            # kind="stable": numpy's stable sort is timsort for 8-byte ints
            # and measures ~1.9x slower.  Introsort is deterministic for a
            # fixed input array, and the input here is a fixed concat order
            # of deterministic map outputs; downstream consumers group by
            # their own keys, so within-group row order is free.
            # Columns concatenate per part in numpy (not pa.concat_tables):
            # mixed per-block uidx/tf dtypes (uint16/int32) promote exactly.
            # Global uids materialise ONLY for the df>=2 survivors, via each
            # part's lut offset into the one concatenated lut.
            sh = np.concatenate([_np_col(p, "shingle") for p, _ in live])
            uidx = np.concatenate(
                [_np_col(p, "uidx").astype(idx_t) + idx_t(o) for p, o in live]
            )
            tf = np.concatenate([_np_col(p, "tf") for p, _ in live])
            order = np.argsort(sh)
            ss = sh[order]
            # group boundaries without np.r_ temp-concat copies: one
            # preallocated bool buffer + in-place not_equal (~4x cheaper)
            neq = np.empty(len(ss), dtype=bool)
            neq[0] = True
            np.not_equal(ss[1:], ss[:-1], out=neq[1:])
            starts = np.flatnonzero(neq)
            counts = np.diff(starts, append=len(ss))
            m_mask = counts >= 2
            m_parts.append(
                pa.table(
                    {
                        "shingle": pa.array(ss[starts][m_mask], type=pa.int64()),
                        "df": pa.array(counts[m_mask], type=pa.int64()),
                    }
                )
            )
            row_df = np.repeat(counts, counts)
            keep = row_df >= 2
            sel = order[keep]
            mu = all_lut[uidx[sel]]
            mt = tf[sel]
            matched_parts.append(
                pa.table(
                    {
                        "shingle": pa.array(ss[keep], type=pa.int64()),
                        "uid": pa.array(mu, type=pa.int64()),
                        "tf": pa.array(mt, type=pa.int32()),
                        "df": pa.array(row_df[keep], type=pa.int64()),
                    }
                )
            )
            # Per-uid combiner partials for doc_stats / doc_scalars —
            # accumulated HERE across the task's fine slices, so those stages
            # never re-scan the (much larger) matched table.  uidx is a dense
            # doc index into all_lut, so per-uid sums are three streaming
            # np.bincounts — no sort.  Rows are globally distinct per
            # (shingle, uid) and each shingle lives in exactly ONE fine
            # slice of ONE task, so the per-task partials sum exactly.
            mi = uidx[sel]
            tf64 = mt.astype(np.int64)
            acc_multi_tf += np.bincount(mi, weights=tf64, minlength=nd).astype(
                np.int64
            )
            band = (row_df[keep] >= band_lo) & (row_df[keep] <= band_hi)
            bi = mi[band]
            acc_dup_cnt += np.bincount(bi, minlength=nd)
            acc_dup_tf += np.bincount(
                bi, weights=tf64[band], minlength=nd
            ).astype(np.int64)
            # Fused dup-band pair emission: every dup-shingle bucket lives
            # wholly inside this fine slice and its rows are already grouped,
            # so candidate pairs fall out here for one small lexsort over the
            # dup subset — no second pass over the matched table (same pairs,
            # same canonical ua < ub order as candidate_pairs_dup_index).
            if emit_pairs:
                kcounts = counts[m_mask]
                kb = (kcounts >= band_lo) & (kcounts <= band_hi)
                dsizes = kcounts[kb]
                if dsizes.size:
                    dup_uid = mu[band]
                    gid = np.repeat(np.arange(len(dsizes), dtype=np.int64), dsizes)
                    ordd = np.lexsort((dup_uid, gid))
                    du = dup_uid[ordd]
                    dstarts = np.r_[0, np.cumsum(dsizes)[:-1]]
                    ua_parts, ub_parts = [], []
                    max_m = int(dsizes.max())
                    for y in range(1, max_m):
                        gmask = dsizes > y
                        if not gmask.any():
                            break
                        base = dstarts[gmask]
                        for x in range(y):
                            ua_parts.append(du[base + x])
                            ub_parts.append(du[base + y])
                    if ua_parts:
                        pair_parts.append(
                            pa.table(
                                {
                                    "ua": pa.array(
                                        np.concatenate(ua_parts), type=pa.int64()
                                    ),
                                    "ub": pa.array(
                                        np.concatenate(ub_parts), type=pa.int64()
                                    ),
                                }
                            )
                        )
        if not m_parts:
            m = pa.table(
                {"shingle": pa.array([], type=pa.int64()), "df": pa.array([], type=pa.int64())}
            )
            matched = pa.table(
                {
                    "shingle": pa.array([], type=pa.int64()),
                    "uid": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int32()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
            return m, matched, _empty_partials, _empty_pairs, (0, 0, 0, 0)
        m = pa.concat_tables(m_parts).combine_chunks()
        matched = pa.concat_tables(matched_parts).combine_chunks()
        nz = np.flatnonzero(acc_multi_tf)
        partials = pa.table(
            {
                "uid": pa.array(all_lut[nz], type=pa.int64()),
                "n_multi_tf": pa.array(acc_multi_tf[nz]),
                "n_dup_cnt": pa.array(acc_dup_cnt[nz]),
                "n_dup_tf": pa.array(acc_dup_tf[nz]),
            }
        )
        pairs = (
            pa.concat_tables(pair_parts).combine_chunks()
            if pair_parts
            else _empty_pairs
        )
        return m, matched, partials, pairs, (
            m.num_rows, matched.num_rows, partials.num_rows, pairs.num_rows,
        )

    bounds_r = np.linspace(0, T, R + 1).astype(int)
    red = []
    for rid in range(R):
        tlo, thi = int(bounds_r[rid]), int(bounds_r[rid + 1])
        if thi == tlo:
            continue
        flo, fhi = tlo * G, thi * G  # fine-partition range of this round
        k = fhi - flo
        outs = [
            shingle_split.options(num_returns=k).remote(ref, flo, fhi)
            for ref in refs
        ]
        if k == 1:
            outs = [[o] for o in outs]
        tick(f"shingle_split[{flo}:{fhi}]", [o[0] for o in outs])
        rred = [
            reduce_classify.remote(
                with_pair_partials,
                B,
                # fine-major layout: all blocks of fine slice f, then f+1, ...
                *[
                    outs[b][f - flo]
                    for f in range(t * G, (t + 1) * G)
                    for b in range(B)
                ],
            )
            for t in range(tlo, thi)
        ]
        if R > 1:
            # barrier per round: the round's reduces must drain its map
            # outputs before the next round's maps fill the store
            ray.wait([r[4] for r in rred], num_returns=thi - tlo, fetch_local=False)
        del outs  # release this round's map partitions from the store
        red.extend(rred)
        tick(f"reduce_classify[{flo}:{fhi}]")
    stats = ray.get([r[4] for r in red])
    tick("reduce_stats")
    multi = ds_from_refs(
        [r[0] for r, s in zip(red, stats) if s[0]],
        count=int(sum(s[0] for s in stats)),
        shingle=pa.int64(), df=pa.int64(),
    )
    matched = ds_from_refs(
        [r[1] for r, s in zip(red, stats) if s[1]],
        count=int(sum(s[1] for s in stats)),
        shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64(),
    )
    out = [multi, matched]
    if with_doc_partials:
        out.append(
            ds_from_refs(
                [r[2] for r, s in zip(red, stats) if s[2]],
                count=int(sum(s[2] for s in stats)),
                uid=pa.int64(), n_multi_tf=pa.int64(),
                n_dup_cnt=pa.int64(), n_dup_tf=pa.int64(),
            )
        )
    if with_pair_partials:
        out.append(
            ds_from_refs(
                [r[3] for r, s in zip(red, stats) if s[3]],
                count=int(sum(s[3] for s in stats)),
                ua=pa.int64(), ub=pa.int64(),
            )
        )
    return tuple(out) if len(out) > 2 else (out[0], out[1])


def filter_dup_band(matched_batch, lo: int, hi: int):
    d = matched_batch.column("df")
    return matched_batch.filter(
        pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
    )
