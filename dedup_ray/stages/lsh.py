"""T2/J4/A7 — data-parallel LSH banding, bucket pair-enumeration, distinct.

Replaces the reference's driver-resident ``MinHashLSHEnsemble`` index
(``/root/reference/dedup/dedup.py:330-351``) with a shuffle: each signature is
flattened into ``b`` band rows keyed by a hash of its ``r`` components; a
``groupby(band_key)`` co-locates docs sharing a band; within-bucket pair
enumeration is the self-join (``dedup.py:424-443`` analogue).  The (b, r)
choice minimises the weighted false-positive/negative integrals at the
reference threshold ``containment_threshold / 20`` (``dedup.py:333``) — the
standard MMDS optimal-parameter computation, same as datasketch's public
``_optimal_param``.

Skew: buckets larger than ``cfg.bucket_cap`` (hot bands from boilerplate /
near-empty docs) are not silently exploded into O(m^2) pairs — pairs are
emitted fully for the first ``cap`` members (sorted by uid, deterministic)
plus a connecting ring over the remainder, and the truncation is recorded in
a ``truncated`` metrics column (no silent drop; SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from ..config import DedupConfig
from ..hashing import combine_u64, splitmix64


def optimal_band_rows(threshold: float, num_perm: int) -> tuple[int, int]:
    """Minimise 0.5*FP + 0.5*FN integral over the S-curve (public algorithm)."""
    s = np.linspace(0.0, 1.0, 1001)
    ds = s[1] - s[0]
    best = (1, num_perm)
    best_err = np.inf
    for b in range(1, num_perm + 1):
        r = num_perm // b
        if b * r > num_perm or r < 1:
            continue
        prob = 1.0 - (1.0 - s**r) ** b
        mask = s < threshold
        fp = prob[mask].sum() * ds
        fn = (1.0 - prob[~mask]).sum() * ds
        err = 0.5 * fp + 0.5 * fn
        if err < best_err:
            best_err = err
            best = (b, r)
    return best


def resolve_bands(cfg: DedupConfig) -> tuple[int, int]:
    if cfg.lsh_bands is not None and cfg.lsh_rows is not None:
        return cfg.lsh_bands, cfg.lsh_rows
    return optimal_band_rows(cfg.lsh_threshold(), cfg.num_perm)


def size_partition(sizes: np.ndarray, base: float) -> np.ndarray:
    """Ensemble size-partition id: floor(log_base(max(size, 1)))."""
    s = np.maximum(sizes.astype(np.float64), 1.0)
    return np.floor(np.log(s) / np.log(base)).astype(np.int64)


def make_band_rows(sigs: Dataset, cfg: DedupConfig) -> Dataset:
    """signature rows -> (band_key:int64, uid:int64) x b [x 2 tags] per doc.

    Docs with no duplicated shingles are excluded — the reference's query gate
    (``dedup.py:350``: only contigs with homo_dup_kmers query) combined with
    the fact that an empty signature can never reach the containment
    threshold makes this recall-neutral.

    With ``cfg.lsh_ensemble`` (containment calibration): each doc's band keys
    are additionally salted with its size-partition tag p = floor(log_base
    (n_dup_distinct)) AND with p+1, so two docs collide iff they share a band
    hash within a COMMON tag.  Any pair with size ratio < base (hence
    partition gap <= 1) shares at least one tag; restricting collisions to
    near-size partitions is exactly the LSH-Ensemble containment trick (the
    jaccard of a containment-qualified pair is bounded below by
    t/(1+base^2) inside a shared tag).  Pairs with partition gap >= 2 are
    handled by ``ensemble_extreme_pairs``.
    """
    b, r = resolve_bands(cfg)
    sig_cols = [f"s{p:03d}" for p in range(b * r)]
    band_seeds = splitmix64(
        np.arange(1, b + 1, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    )
    ensemble = cfg.lsh_ensemble
    base = cfg.lsh_partition_base

    def to_bands(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.greater(batch.column("n_dup_distinct"), 0))
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "band_key": pa.array([], type=pa.int64()),
                    "uid": pa.array([], type=pa.int64()),
                }
            )
        sig = np.stack(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in sig_cols], axis=1
        )  # (n, b*r)
        sig = sig.reshape(n, b, r)
        keys = np.broadcast_to(band_seeds[None, :], (n, b)).copy()
        for j in range(r):
            keys = combine_u64(keys, sig[:, :, j])
        uids = batch.column("uid").to_numpy(zero_copy_only=False)
        if not ensemble:
            return pa.table(
                {
                    "band_key": pa.array(keys.reshape(-1), type=pa.int64()),
                    "uid": pa.array(np.repeat(uids, b), type=pa.int64()),
                }
            )
        sizes = batch.column("n_dup_distinct").to_numpy(zero_copy_only=False)
        part = size_partition(sizes, base)
        tag_salt_own = splitmix64((part + 1).astype(np.uint64))
        tag_salt_up = splitmix64((part + 2).astype(np.uint64))
        k_own = combine_u64(keys, np.broadcast_to(tag_salt_own[:, None], (n, b)))
        k_up = combine_u64(keys, np.broadcast_to(tag_salt_up[:, None], (n, b)))
        return pa.table(
            {
                "band_key": pa.array(
                    np.concatenate([k_own.reshape(-1), k_up.reshape(-1)]),
                    type=pa.int64(),
                ),
                "uid": pa.array(
                    np.tile(np.repeat(uids, b), 2), type=pa.int64()
                ),
            }
        )

    return sigs.map_batches(to_bands, batch_format="pyarrow")


def _emit_bucket_pairs(group: pa.Table, cap: int) -> pa.Table:
    uids = np.unique(group.column("uid").to_numpy(zero_copy_only=False))
    m = len(uids)
    empty = {
        "ua": pa.array([], type=pa.int64()),
        "ub": pa.array([], type=pa.int64()),
        "truncated": pa.array([], type=pa.bool_()),
    }
    if m < 2:
        return pa.table(empty)
    truncated = m > cap
    head = uids[:cap]
    hm = len(head)
    ia, ib = np.triu_indices(hm, k=1)
    ua, ub = head[ia], head[ib]
    if truncated:
        # connect the tail with a deterministic ring so transitive clustering
        # can still reach every member; log via the truncated flag.
        tail = uids[cap - 1 :]
        ua = np.concatenate([ua, tail[:-1]])
        ub = np.concatenate([ub, tail[1:]])
    return pa.table(
        {
            "ua": pa.array(ua, type=pa.int64()),
            "ub": pa.array(ub, type=pa.int64()),
            "truncated": pa.array(np.full(len(ua), truncated)),
        }
    )


def candidate_pairs_dup_index(
    matched: Dataset, cfg: DedupConfig, *, shingle_partitioned: bool = False
) -> Dataset:
    """Exact candidate generation from the dup-shingle inverted index.

    Because the DF band caps dup-shingle document frequency at
    ``cfg.duplicate_df_upper`` (default 4, ``dedup.py:601-611``), the inverted
    index on dup shingles has buckets of at most 4 docs — a self-join on
    ``shingle`` emits at most ``C(4,2)=6`` pairs per shingle, linear in corpus
    size and skew-free by construction.  The candidate set is a strict
    superset of what any MinHash-LSH banding returns at the same config
    (every oracle pair shares >= 1 dup shingle), so after the shared exact
    containment filter (V1) dup-pair recall vs the reference math is 1.0.

    This replaces probabilistic banding as the flagship path; banding remains
    available via cfg.candidate_strategy == "minhash_lsh".

    ``shingle_partitioned=True`` (the fused-exchange path, stages/df.py
    shingle_df_classify): every BLOCK REF of the materialised ``matched``
    dataset is a complete ``shingle % P`` partition, so no bucket ever spans
    refs — pair emission is purely partition-local (one numpy lexsort per
    partition), skipping the global Dataset.sort and the boundary heal
    entirely.  The emission runs as RAW TASKS over the partition refs, not
    map_batches: a map_batches pipe re-splits task output into blocks by
    target_max_block_size, which at scale could cut a partition (and its
    dup-shingle buckets) across block boundaries and silently drop pairs.
    Raw tasks preserve the one-task-per-partition invariant by construction.
    Measured on the 843 MiB bench corpus the sort-based path was flat at
    ~5.5 s from 8 to 32 cpus (Dataset.sort's sample+merge tail); the local
    path scales with the partition width.
    """
    import pyarrow.compute as pc

    lo, hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper

    def dup_only(batch: pa.Table) -> pa.Table:
        d = batch.column("df")
        return batch.filter(
            pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
        ).select(["shingle", "uid"])

    from .groupagg import sorted_aggregate

    if shingle_partitioned:

        def block_pairs_local(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "ua": pa.array([], type=pa.int64()),
                    "ub": pa.array([], type=pa.int64()),
                }
            )
            if batch.num_rows == 0:
                return empty
            sh = batch.column("shingle").to_numpy(zero_copy_only=False)
            uid = batch.column("uid").to_numpy(zero_copy_only=False)
            order = np.lexsort((uid, sh))
            sh, uid = sh[order], uid[order]
            starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
            ends = np.r_[starts[1:], len(sh)]
            sizes = ends - starts
            elig = sizes >= 2
            ua_parts, ub_parts = [], []
            max_m = int(sizes[elig].max()) if elig.any() else 0
            for y in range(1, max_m):
                mask = elig & (sizes > y)
                if not mask.any():
                    break
                base = starts[mask]
                for x in range(y):
                    # uid ascending within a bucket => ua < ub canonical
                    ua_parts.append(uid[base + x])
                    ub_parts.append(uid[base + y])
            if not ua_parts:
                return empty
            return pa.table(
                {
                    "ua": pa.array(np.concatenate(ua_parts), type=pa.int64()),
                    "ub": pa.array(np.concatenate(ub_parts), type=pa.int64()),
                }
            )

        import ray
        from ray.data.dataset import MaterializedDataset

        from ..util import ds_from_refs, map_blocks

        def partition_pairs(block: pa.Table):
            out = block_pairs_local(dup_only(block))
            return out, out.num_rows

        mat = (
            matched
            if isinstance(matched, MaterializedDataset)
            else matched.materialize()
        )
        outs = map_blocks(partition_pairs, mat, num_returns=2)
        counts = ray.get([o[1] for o in outs])
        refs = [o[0] for o, c in zip(outs, counts) if c]
        raw = ds_from_refs(
            refs, count=int(sum(counts)), ua=pa.int64(), ub=pa.int64()
        )
        return sorted_aggregate(
            raw, ["ua", "ub"], {"n_buckets": ("ua", "count")},
            empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
        )

    # Physical form: sort the dup postings by shingle and emit each bucket's
    # pairs directly per sorted block (buckets <= df_upper rows), healing the
    # first/last shingle of each block on the driver — one sort instead of a
    # hash self-join, then the usual distinct pass.  Pair emission is fully
    # vectorised over groups: for each in-group index combination (x, y) one
    # masked gather emits every group's (x, y) pair at once.
    import ray

    from ..util import ds_from_refs, split_boundary

    def block_pairs(batch: pa.Table) -> pa.Table:
        # Output rows: interior pairs (ua, ub, _boundary=False) plus the raw
        # postings of the block's first/last shingle (shingle in ua, uid in
        # ub, _boundary=True) — those buckets may span blocks and are paired
        # on the driver after the boundary split.
        empty = pa.table(
            {
                "ua": pa.array([], type=pa.int64()),
                "ub": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        uid = batch.column("uid").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        sizes = ends - starts
        first, last = sh[0], sh[-1]
        bnd_rows = (sh == first) | (sh == last)
        interior = ~((sh[starts] == first) | (sh[starts] == last))
        ua_parts, ub_parts = [], []
        max_m = int(sizes[interior].max()) if interior.any() else 0
        for y in range(1, max_m):
            mask = interior & (sizes > y)
            if not mask.any():
                break
            base = starts[mask]
            for x in range(y):
                # uid sorted ascending within a group => ua < ub canonical
                ua_parts.append(uid[base + x])
                ub_parts.append(uid[base + y])
        ua = np.concatenate(ua_parts) if ua_parts else np.empty(0, dtype=np.int64)
        ub = np.concatenate(ub_parts) if ub_parts else np.empty(0, dtype=np.int64)
        n_pairs = len(ua)
        return pa.table(
            {
                "ua": pa.array(np.concatenate([ua, sh[bnd_rows]]), type=pa.int64()),
                "ub": pa.array(np.concatenate([ub, uid[bnd_rows]]), type=pa.int64()),
                "_boundary": pa.array(
                    np.r_[np.zeros(n_pairs, bool), np.ones(int(bnd_rows.sum()), bool)]
                ),
            }
        )

    dup = matched.map_batches(dup_only, batch_format="pyarrow")
    s = dup.sort(["shingle", "uid"])
    part = s.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)

    if boundary is not None and boundary.num_rows:
        # boundary postings: (shingle=ua, uid=ub) — group per shingle, distinct
        # uids, emit each bucket's pairs (tiny: <= 2 buckets per block)
        bsh = boundary.column("ua").to_numpy(zero_copy_only=False)
        buid = boundary.column("ub").to_numpy(zero_copy_only=False)
        order = np.lexsort((buid, bsh))
        bsh, buid = bsh[order], buid[order]
        keep = np.r_[True, (bsh[1:] != bsh[:-1]) | (buid[1:] != buid[:-1])]
        bsh, buid = bsh[keep], buid[keep]
        starts = np.flatnonzero(np.r_[True, bsh[1:] != bsh[:-1]])
        ends = np.r_[starts[1:], len(bsh)]
        ua_out, ub_out = [], []
        for st, en in zip(starts, ends):
            u = buid[st:en]
            for x in range(en - st):
                for y in range(x + 1, en - st):
                    ua_out.append(int(u[x]))
                    ub_out.append(int(u[y]))
        if ua_out:
            bt = pa.table(
                {
                    "ua": pa.array(ua_out, type=pa.int64()),
                    "ub": pa.array(ub_out, type=pa.int64()),
                }
            )
            int_refs = int_refs + [ray.put(bt)]
            n_int += bt.num_rows

    pairs = ds_from_refs(int_refs, count=n_int, ua=pa.int64(), ub=pa.int64())
    from .groupagg import sorted_aggregate

    return sorted_aggregate(
        pairs, ["ua", "ub"], {"n_buckets": ("ua", "count")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )


def ensemble_extreme_pairs(
    matched: Dataset, sigs: Dataset, cfg: DedupConfig, *, shingle_partitioned: bool = False
) -> Dataset:
    """Exact complement for the ensemble's banding-blind region: dup-index
    pairs whose size-partition gap is >= 2 (size ratio >= base, possibly
    unbounded), where the pair's jaccard can be arbitrarily small and no
    (b, r) banding over ``num_perm`` permutations reaches 0.99 recall.

    Correctness: a containment-qualified pair shares >= 1 dup-band shingle
    (containment > 0 requires a common dup shingle), so the bounded-df
    inverted index contains every such pair — the prefix-filter principle.
    Cost: the dup-index pass the engine already runs for the default
    strategy, restricted post-hoc to extreme-ratio pairs; the band filter is
    a broadcast lookup (size-gated, join fallback).
    """
    import pyarrow.compute as pc
    import ray

    from ..util import ds_from_refs, fast_count, map_blocks

    pairs = candidate_pairs_dup_index(
        matched, cfg, shingle_partitioned=shingle_partitioned
    )
    base = cfg.lsh_partition_base
    n_sigs = fast_count(sigs)

    if n_sigs > cfg.broadcast_classify_limit:
        # 100-TB path: two hash joins against the slim (uid, partition) table
        slim = sigs.select_columns(["uid", "n_dup_distinct"])

        def to_part(b: pa.Table) -> pa.Table:
            s = b.column("n_dup_distinct").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "uid": b.column("uid"),
                    "part": pa.array(size_partition(s, base), type=pa.int64()),
                }
            )

        parts_ds = slim.map_batches(to_part, batch_format="pyarrow")
        a_side = parts_ds.rename_columns({"uid": "ua", "part": "part_a"})
        b_side = parts_ds.rename_columns({"uid": "ub", "part": "part_b"})
        j = pairs.join(
            a_side, "inner", num_partitions=cfg.join_partitions(), on=("ua",)
        ).join(b_side, "inner", num_partitions=cfg.join_partitions(), on=("ub",))

        def gap_filter(b: pa.Table) -> pa.Table:
            gap = pc.abs(pc.subtract(b.column("part_a"), b.column("part_b")))
            return b.filter(pc.greater_equal(gap, 2)).select(
                ["ua", "ub", "n_buckets"]
            )

        return j.map_batches(gap_filter, batch_format="pyarrow")

    # broadcast path: (uid -> partition) as sorted arrays in plasma
    def block_sizes(b: pa.Table):
        return (
            b.column("uid").to_numpy(zero_copy_only=False),
            b.column("n_dup_distinct").to_numpy(zero_copy_only=False),
        )

    outs = ray.get(map_blocks(block_sizes, sigs.materialize()))
    if outs:
        ids = np.concatenate([o[0] for o in outs])
        sz = np.concatenate([o[1] for o in outs])
        order = np.argsort(ids)  # unique keys: stability moot
        lut_ref = ray.put((ids[order], size_partition(sz[order], base)))
    else:
        z = np.empty(0, dtype=np.int64)
        lut_ref = ray.put((z, z))

    def extreme(b: pa.Table):
        ids, parts = ray.get(lut_ref)
        if b.num_rows == 0 or len(ids) == 0:
            t = b.slice(0, 0)
            return t, 0
        ua = b.column("ua").to_numpy(zero_copy_only=False)
        ub = b.column("ub").to_numpy(zero_copy_only=False)
        pa_ = parts[np.minimum(np.searchsorted(ids, ua), len(ids) - 1)]
        pb_ = parts[np.minimum(np.searchsorted(ids, ub), len(ids) - 1)]
        keep = np.abs(pa_ - pb_) >= 2
        t = b.filter(pa.array(keep))
        return t, t.num_rows

    outs2 = map_blocks(extreme, pairs.materialize(), num_returns=2)
    counts = ray.get([o[1] for o in outs2])
    refs = [o[0] for o, c in zip(outs2, counts) if c]
    return ds_from_refs(
        refs, count=int(sum(counts)),
        ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64(),
    )


def union_distinct_pairs(a: Dataset, b: Dataset) -> Dataset:
    """Distinct (ua, ub) union of two candidate-pair datasets (n_buckets kept
    as max — informational only on the probabilistic path).  Block-ref union
    (no Dataset.union, which poisons downstream groupbys with empty sort
    partitions on this Ray version)."""
    from ..util import block_refs, ds_from_refs, known_count
    from .groupagg import sorted_aggregate

    refs = block_refs(a.materialize()) + block_refs(b.materialize())
    na, nb = known_count(a) or 0, known_count(b) or 0
    merged = ds_from_refs(
        refs, count=(na + nb) or None, ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()
    )
    return sorted_aggregate(
        merged, ["ua", "ub"], {"n_buckets": ("n_buckets", "max")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )


def candidate_pairs(band_rows: Dataset, cfg: DedupConfig) -> Dataset:
    """groupby(band_key) bucket self-join -> distinct canonical (ua < ub) pairs.

    Distinctness across buckets/bands via a second groupby with a native Count
    aggregate (A7; the reference's ``list(set(pairs))`` at ``dedup.py:378``).
    """
    cap = cfg.bucket_cap
    pairs = band_rows.groupby("band_key").map_groups(
        lambda g: _emit_bucket_pairs(g, cap), batch_format="pyarrow"
    ).drop_columns(["truncated"])
    from .groupagg import sorted_aggregate

    return sorted_aggregate(
        pairs, ["ua", "ub"], {"n_buckets": ("ua", "count")},
        empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
    )
