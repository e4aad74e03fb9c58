"""V1 — exact containment verification of candidate pairs (+ dup-set build).

Reference math (``/root/reference/dedup/dedup.py:362-369``):
    common        = |set(dup_kmers_1) & set(dup_kmers_2)|         (distinct)
    containment_1 = common / (len(dup_kmers_1) + 1)
    containment_2 = common / (len(dup_kmers_2) + 1)
    keep pair iff containment_1 > t  OR  containment_2 > t
where ``len(dup_kmers_i)`` counts dup-kmer POSTINGS (one append per mapped
position, ``dedup.py:403-406``), not distinct kmers — reproduced here as
``n_dup_postings`` — and the ``+1`` quirk is kept verbatim.

Canonical pair order is by url (``contig.__lt__`` is name order,
``contig.py:201-202``; pairs stored (smaller, larger), ``dedup.py:372-376``).

The per-doc dup-shingle sets are materialised ONLY for docs that appear in at
least one candidate pair (a semi-join), so the per-group list-building stage
is proportional to candidates, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count

from ..config import DedupConfig


def candidate_uids(cand: Dataset, cfg: DedupConfig) -> Dataset:
    """Distinct uids appearing in any candidate pair -> (uid,).

    Physical forms: per-block np.unique as raw tasks + tiny driver merge when
    the pair table is broadcast-sized (zero Dataset executions — cand is
    already materialised); distributed sort-distinct above the gate.
    """
    import ray

    from ..util import ds_from_refs, fast_count, map_blocks

    if fast_count(cand) <= cfg.broadcast_classify_limit:
        mat = cand.materialize()

        def block_unique(b: pa.Table) -> np.ndarray:
            ua = b.column("ua").to_numpy(zero_copy_only=False)
            ub = b.column("ub").to_numpy(zero_copy_only=False)
            return np.unique(np.concatenate([ua, ub]))

        parts = ray.get(map_blocks(block_unique, mat))
        uids = (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
        )
        refs = (
            [ray.put(pa.table({"uid": pa.array(uids, type=pa.int64())}))]
            if len(uids)
            else []
        )
        return ds_from_refs(refs, count=len(uids), uid=pa.int64())

    def both(batch: pa.Table) -> pa.Table:
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        return pa.table({"uid": pa.array(np.concatenate([ua, ub]), type=pa.int64())})

    flat = cand.map_batches(both, batch_format="pyarrow")
    from .groupagg import sorted_aggregate

    return sorted_aggregate(
        flat, ["uid"], {"_n": ("uid", "count")},
        empty_types=dict(uid=pa.int64(), _n=pa.int64()),
    ).select_columns(["uid"])


def _semi_filter_matched(matched: Dataset, cand_uids: Dataset, cfg: DedupConfig) -> Dataset:
    """matched rows restricted to candidate uids: broadcast searchsorted when
    the uid set is small enough, hash join otherwise (the 100-TB path)."""
    from ..util import fast_count

    n = fast_count(cand_uids)
    if n > cfg.broadcast_classify_limit:
        return matched.join(
            cand_uids, "inner", num_partitions=cfg.join_partitions(), on=("uid",)
        )
    import ray

    tables = ray.get(cand_uids.to_arrow_refs())
    keys = np.sort(
        np.concatenate(
            [
                t.column("uid").to_numpy(zero_copy_only=False)
                for t in tables
                if t.num_rows and t.num_columns
            ]
        )
    ) if any(t.num_rows for t in tables if t.num_columns) else np.empty(0, dtype=np.int64)
    ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        if len(k) == 0:
            return batch.slice(0, 0)
        uids = batch.column("uid").to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(k, uids), len(k) - 1)
        return batch.filter(pa.array(k[idx] == uids))

    return matched.map_batches(filt, batch_format="pyarrow")


def _collect_uids(cand_uids: Dataset) -> np.ndarray:
    """Sorted uid array from a materialised (uid,) dataset — no executions."""
    import ray

    tables = ray.get(cand_uids.materialize().to_arrow_refs())
    parts = [
        t.column("uid").to_numpy(zero_copy_only=False)
        for t in tables
        if t.num_rows and t.num_columns
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)


def _docinfo_annotate(
    lists: Dataset, cand_uids: Dataset, docs: Dataset, cfg: DedupConfig, fields: dict
) -> Dataset:
    """Attach (url, n_chars) per uid to ``lists``.

    Broadcast path (uid set under the gate): slim doc info is gathered by raw
    tasks over the materialised corpus blocks and attached to each lists block
    by searchsorted lookup — zero Dataset executions, zero joins.  Above the
    gate: hash join with the slim corpus projection (the 100-TB path).
    """
    import ray

    from ..util import ds_from_refs, fast_count, known_count, map_blocks

    n = fast_count(cand_uids)
    if n > cfg.broadcast_classify_limit:
        slim_docs = docs.select_columns(["uid", "url", "n_chars"])
        return lists.join(
            slim_docs, "inner", num_partitions=cfg.join_partitions(), on=("uid",)
        )
    keys = _collect_uids(cand_uids)

    def slim(b: pa.Table) -> pa.Table:
        uids = b.column("uid").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            hit = np.zeros(len(uids), dtype=bool)
        else:
            idx = np.minimum(np.searchsorted(keys, uids), len(keys) - 1)
            hit = keys[idx] == uids
        return b.filter(pa.array(hit)).select(["uid", "url", "n_chars"])

    docs_mat = docs.materialize()
    slim_tables = [t for t in ray.get(map_blocks(slim, docs_mat)) if t.num_rows]
    if slim_tables:
        info = pa.concat_tables(slim_tables).combine_chunks()
        iu = info.column("uid").to_numpy(zero_copy_only=False)
        order = np.argsort(iu)  # unique keys: stability moot
        info_ref = ray.put(
            (
                iu[order],
                info.column("url").to_numpy(zero_copy_only=False)[order],
                info.column("n_chars").to_numpy(zero_copy_only=False)[order],
            )
        )
    else:
        info_ref = ray.put(
            (np.empty(0, dtype=np.int64), np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
        )

    def attach(b: pa.Table):
        ku, kurl, kchars = ray.get(info_ref)
        uids = b.column("uid").to_numpy(zero_copy_only=False)
        if len(ku) == 0:
            t = b.slice(0, 0).append_column(
                "url", pa.array([], type=pa.string())
            ).append_column("n_chars", pa.array([], type=pa.int64()))
            return t, 0
        idx = np.minimum(np.searchsorted(ku, uids), len(ku) - 1)
        hit = ku[idx] == uids
        sub = b.filter(pa.array(hit))
        sel = idx[hit]
        t = sub.append_column(
            "url", pa.array(kurl[sel], type=pa.string())
        ).append_column("n_chars", pa.array(kchars[sel], type=pa.int64()))
        return t, t.num_rows

    lists_mat = lists.materialize()
    outs = map_blocks(attach, lists_mat, num_returns=2)
    counts = ray.get([o[1] for o in outs])
    out_refs = [o[0] for o, c in zip(outs, counts) if c]
    out_fields = dict(fields, url=pa.string(), n_chars=pa.int64())
    return ds_from_refs(out_refs, count=int(sum(counts)), **out_fields)


def dup_sets(
    matched: Dataset, cand_uids: Dataset, docs: Dataset, cfg: DedupConfig
) -> Dataset:
    """Per-candidate-doc annotation (M2 analogue, ``dedup.py:396-415``).

    Output: (uid, url, n_chars, dup_shingles:list<uint64>,
             multi_shingles:list<uint64>, n_dup_postings:int64).

    ``multi_shingles`` = every shingle of the doc with corpus df >= 2 — the
    complement (per doc) is the unique (df == 1) set, reconstructed locally at
    annotation/trim time without shipping it through the shuffle.
    """
    lo, hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper
    cand_matched = _semi_filter_matched(matched, cand_uids, cfg)

    def block_sets(batch: pa.Table) -> pa.Table:
        # one sorted block per batch: vectorized per-uid grouping (no
        # per-group map_groups overhead); shingle sets travel as int64-LE
        # binary blobs — pyarrow's acero join rejects list<> payload columns.
        if batch.num_rows == 0:
            return pa.table(
                {
                    "uid": pa.array([], type=pa.int64()),
                    "dup_shingles": pa.array([], type=pa.large_binary()),
                    "multi_shingles": pa.array([], type=pa.large_binary()),
                    "n_dup_postings": pa.array([], type=pa.int64()),
                    "_boundary": pa.array([], type=pa.bool_()),
                }
            )
        uids = batch.column("uid").to_numpy(zero_copy_only=False)
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        df = batch.column("df").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
        ends = np.r_[starts[1:], len(uids)]
        dup_mask = (df >= lo) & (df <= hi)
        out_uid, out_dup, out_multi, out_n = [], [], [], []
        for s, e in zip(starts, ends):
            dm = dup_mask[s:e]
            out_uid.append(int(uids[s]))
            out_dup.append(np.sort(sh[s:e][dm]).tobytes())
            out_multi.append(np.sort(sh[s:e]).tobytes())
            out_n.append(int(tf[s:e][dm].sum()))
        boundary = np.zeros(len(out_uid), dtype=bool)
        boundary[0] = True
        boundary[-1] = True
        return pa.table(
            {
                "uid": pa.array(out_uid, type=pa.int64()),
                "dup_shingles": pa.array(out_dup, type=pa.large_binary()),
                "multi_shingles": pa.array(out_multi, type=pa.large_binary()),
                "n_dup_postings": pa.array(out_n, type=pa.int64()),
                "_boundary": pa.array(boundary),
            }
        )

    import ray

    from ..util import ds_from_refs, split_boundary

    part = cand_matched.sort("uid").map_batches(
        block_sets, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    merged = {}
    if boundary is not None and boundary.num_rows:
        for r in boundary.to_pylist():
            u = r["uid"]
            if u in merged:
                d0, m0, n0 = merged[u]
                d = np.sort(
                    np.concatenate(
                        [np.frombuffer(d0, dtype=np.int64), np.frombuffer(r["dup_shingles"], dtype=np.int64)]
                    )
                ).tobytes()
                m = np.sort(
                    np.concatenate(
                        [np.frombuffer(m0, dtype=np.int64), np.frombuffer(r["multi_shingles"], dtype=np.int64)]
                    )
                ).tobytes()
                merged[u] = (d, m, n0 + r["n_dup_postings"])
            else:
                merged[u] = (r["dup_shingles"], r["multi_shingles"], r["n_dup_postings"])
    if merged:
        bt = pa.table(
            {
                "uid": pa.array(list(merged), type=pa.int64()),
                "dup_shingles": pa.array([v[0] for v in merged.values()], type=pa.large_binary()),
                "multi_shingles": pa.array([v[1] for v in merged.values()], type=pa.large_binary()),
                "n_dup_postings": pa.array([v[2] for v in merged.values()], type=pa.int64()),
            }
        )
        int_refs = int_refs + [ray.put(bt)]
        n_int += bt.num_rows
    fields = dict(
        uid=pa.int64(), dup_shingles=pa.large_binary(),
        multi_shingles=pa.large_binary(), n_dup_postings=pa.int64(),
    )
    lists = ds_from_refs(int_refs, count=n_int, **fields)
    return _docinfo_annotate(lists, cand_uids, docs, cfg, fields)


def verify_pairs(cand: Dataset, sets: Dataset, cfg: DedupConfig) -> Dataset:
    """V1: join pair table with both sides' dup sets, exact containment check.

    Output (canonical url_a < url_b):
      uid_a, uid_b, url_a, url_b, n_chars_a, n_chars_b, common,
      containment_a, containment_b, jaccard,
      n_dup_postings_a, n_dup_postings_b,
      common_high (large_binary: the pair's common outside-band shingles,
      int64-LE — the align stage's exact exclusion set)
    """
    thr = cfg.containment_threshold
    a_side = sets.rename_columns(
        {c: f"{c}_a" for c in sets.schema().names if c != "uid"}
    ).rename_columns({"uid": "ua"})
    b_side = sets.rename_columns(
        {c: f"{c}_b" for c in sets.schema().names if c != "uid"}
    ).rename_columns({"uid": "ub"})
    from ..util import heal

    half = heal(
        cand.join(a_side, "inner", num_partitions=cfg.join_partitions(), on=("ua",)),
        ua=pa.int64(), ub=pa.int64(),
    )
    joined = half.join(b_side, "inner", num_partitions=cfg.join_partitions(), on=("ub",))

    def check(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {
            "uid_a": [], "uid_b": [], "url_a": [], "url_b": [],
            "n_chars_a": [], "n_chars_b": [], "common": [],
            "containment_a": [], "containment_b": [], "jaccard": [],
            "n_dup_postings_a": [], "n_dup_postings_b": [],
        }
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        url_a = batch.column("url_a").to_pylist()
        url_b = batch.column("url_b").to_pylist()
        nc_a = batch.column("n_chars_a").to_numpy(zero_copy_only=False)
        nc_b = batch.column("n_chars_b").to_numpy(zero_copy_only=False)
        dup_a = batch.column("dup_shingles_a").to_pylist()
        dup_b = batch.column("dup_shingles_b").to_pylist()
        np_a = batch.column("n_dup_postings_a").to_numpy(zero_copy_only=False)
        np_b = batch.column("n_dup_postings_b").to_numpy(zero_copy_only=False)
        multi_a = batch.column("multi_shingles_a").to_pylist()
        multi_b = batch.column("multi_shingles_b").to_pylist()
        out["common_high"] = []
        for i in range(n):
            sa = np.frombuffer(dup_a[i], dtype=np.int64)
            sb = np.frombuffer(dup_b[i], dtype=np.int64)
            common = len(np.intersect1d(sa, sb, assume_unique=True))
            c_a = common / (np_a[i] + 1)
            c_b = common / (np_b[i] + 1)
            if not (c_a > thr or c_b > thr):
                continue
            union = len(sa) + len(sb) - common
            jac = common / union if union else 0.0
            # canonical: q = lexicographically smaller url (dedup.py:372-376)
            if url_a[i] < url_b[i]:
                o = (ua[i], ub[i], url_a[i], url_b[i], nc_a[i], nc_b[i],
                     c_a, c_b, sa, sb, np_a[i], np_b[i])
            else:
                o = (ub[i], ua[i], url_b[i], url_a[i], nc_b[i], nc_a[i],
                     c_b, c_a, sb, sa, np_b[i], np_a[i])
            out["uid_a"].append(o[0]); out["uid_b"].append(o[1])
            out["url_a"].append(o[2]); out["url_b"].append(o[3])
            out["n_chars_a"].append(int(o[4])); out["n_chars_b"].append(int(o[5]))
            out["common"].append(common)
            out["containment_a"].append(float(o[6])); out["containment_b"].append(float(o[7]))
            out["jaccard"].append(jac)
            out["n_dup_postings_a"].append(int(o[10])); out["n_dup_postings_b"].append(int(o[11]))
            # the pair's common df>4 shingles (boilerplate commons): the tiny
            # exclusion set that lets the align stage reconstruct the exact
            # common-dup set from texts alone (common-text-shingles have
            # df>=2 by definition; minus these = the df-in-[lo,hi] commons)
            ma = np.frombuffer(multi_a[i], dtype=np.int64)
            mb = np.frombuffer(multi_b[i], dtype=np.int64)
            common_multi = np.intersect1d(ma, mb, assume_unique=True)
            common_dup_set = np.intersect1d(sa, sb, assume_unique=True)
            high = np.setdiff1d(common_multi, common_dup_set, assume_unique=True)
            out["common_high"].append(high.tobytes())
        return pa.table(
            {
                "uid_a": pa.array(out["uid_a"], type=pa.int64()),
                "uid_b": pa.array(out["uid_b"], type=pa.int64()),
                "url_a": pa.array(out["url_a"], type=pa.string()),
                "url_b": pa.array(out["url_b"], type=pa.string()),
                "n_chars_a": pa.array(out["n_chars_a"], type=pa.int64()),
                "n_chars_b": pa.array(out["n_chars_b"], type=pa.int64()),
                "common": pa.array(out["common"], type=pa.int64()),
                "containment_a": pa.array(out["containment_a"], type=pa.float64()),
                "containment_b": pa.array(out["containment_b"], type=pa.float64()),
                "jaccard": pa.array(out["jaccard"], type=pa.float64()),
                "n_dup_postings_a": pa.array(out["n_dup_postings_a"], type=pa.int64()),
                "n_dup_postings_b": pa.array(out["n_dup_postings_b"], type=pa.int64()),
                "common_high": pa.array(out["common_high"], type=pa.large_binary()),
            }
        )

    return joined.map_batches(check, batch_format="pyarrow", batch_size=cfg.verify_batch_size)


def doc_scalars(
    matched: Dataset,
    cand_uids: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    partials: Dataset | None = None,
) -> Dataset:
    """Per-candidate-doc SCALARS for the dup_index verification path:
    (uid, url, n_chars, n_dup_distinct, n_dup_postings).  No blobs — pair
    rows stay tiny regardless of document size.

    ``partials``: per-partition per-uid combiner rows emitted by the fused
    exchange (stages/df.shingle_df_classify with_doc_partials) — when given,
    this stage aggregates the tiny partial table instead of re-scanning the
    full matched posting table (the scan dominates at scale: ~30 GB at 1M
    docs)."""
    import pyarrow.compute as pc

    from .groupagg import hash_sum_aggregate, sorted_aggregate

    lo, hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper
    fields = dict(uid=pa.int64(), n_dup_distinct=pa.int64(), n_dup_postings=pa.int64())
    if partials is not None:
        import os
        import time

        _t = bool(os.environ.get("DEDUP_RAY_TIMING"))
        t0 = time.monotonic()
        # radix hash exchange, not a range sort: partial volume is
        # n_docs x T and grows with parallelism (see doc_stats docstring)
        agg = hash_sum_aggregate(
            partials,
            "uid",
            {"n_dup_distinct": "n_dup_cnt", "n_dup_postings": "n_dup_tf"},
            empty_types=fields,
        )
        # drop docs with no dup-band rows (the matched-scan path never emits
        # them) and restrict to candidate docs
        agg = agg.map_batches(
            lambda b: b.filter(pc.greater(b.column("n_dup_distinct"), 0)),
            batch_format="pyarrow",
        )
        agg = _semi_filter_matched(agg, cand_uids, cfg)
        if _t:
            agg = agg.materialize()
            t1 = time.monotonic()
            print(f"[timing] doc_scalars/agg_filter: {t1 - t0:.2f}s", flush=True)
            t0 = t1
        out = _docinfo_annotate(agg, cand_uids, docs, cfg, fields)
        if _t:
            print(
                f"[timing] doc_scalars/docinfo: {time.monotonic() - t0:.2f}s",
                flush=True,
            )
        return out
    cand_matched = _semi_filter_matched(matched, cand_uids, cfg)

    def dup_rows(batch: pa.Table) -> pa.Table:
        # per-block PARTIAL aggregation (combiner): rows are distinct per
        # (shingle, uid), so the per-uid row count is the distinct-shingle
        # count and partials sum exactly — shrinks the global sort input
        # from one row per dup posting to one row per (block, uid)
        d = batch.column("df")
        band = batch.filter(pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi)))
        uid = band.column("uid").to_numpy(zero_copy_only=False)
        tf = band.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(uid) == 0:
            return pa.table(
                {
                    "uid": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                    "tot": pa.array([], type=pa.int64()),
                }
            )
        order = np.argsort(uid)  # order-invariant aggregation
        us, ts = uid[order], tf[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        ends = np.r_[starts[1:], len(us)]
        return pa.table(
            {
                "uid": pa.array(us[starts], type=pa.int64()),
                "cnt": pa.array(ends - starts, type=pa.int64()),
                "tot": pa.array(np.add.reduceat(ts, starts), type=pa.int64()),
            }
        )

    fields = dict(uid=pa.int64(), n_dup_distinct=pa.int64(), n_dup_postings=pa.int64())
    agg = sorted_aggregate(
        cand_matched.map_batches(dup_rows, batch_format="pyarrow"),
        ["uid"],
        {"n_dup_distinct": ("cnt", "sum"), "n_dup_postings": ("tot", "sum")},
        empty_types=fields,
    )
    return _docinfo_annotate(agg, cand_uids, docs, cfg, fields)


def verify_pairs_scalar(cand: Dataset, scalars: Dataset, cfg: DedupConfig) -> Dataset:
    """V1 for the dup_index strategy: ``n_buckets`` on each candidate pair IS
    |dup_a & dup_b| (each common dup-band shingle emitted the pair exactly
    once before the distinct count), so exact containment needs only per-doc
    scalars — no shingle sets ever travel with a pair.

    Output (canonical url_a < url_b): uid/url/n_chars per side, common,
    containment_a/b, jaccard, n_dup_postings_a/b.
    """
    import ray

    from ..util import fast_count, heal

    thr = cfg.containment_threshold
    if fast_count(scalars) <= cfg.broadcast_classify_limit:
        # broadcast path: the per-candidate-doc scalar table is ray.put once
        # as sorted arrays; each cand batch materialises its two sides by
        # searchsorted lookup — no hash joins, no extra executions.
        tables = [
            t
            for t in ray.get(scalars.materialize().to_arrow_refs())
            if t.num_rows and t.num_columns
        ]
        if tables:
            st = pa.concat_tables(tables).combine_chunks()
            su = st.column("uid").to_numpy(zero_copy_only=False)
            order = np.argsort(su)  # unique keys: stability moot
            lookup_ref = ray.put(
                (
                    su[order],
                    st.column("n_dup_distinct").to_numpy(zero_copy_only=False)[order],
                    st.column("n_dup_postings").to_numpy(zero_copy_only=False)[order],
                    st.column("url").to_numpy(zero_copy_only=False)[order],
                    st.column("n_chars").to_numpy(zero_copy_only=False)[order],
                )
            )
        else:
            e = np.empty(0, dtype=np.int64)
            lookup_ref = ray.put((e, e, e, np.empty(0, dtype=object), e))

        def expand(batch: pa.Table) -> pa.Table:
            ku, knd, knp, kurl, knc = ray.get(lookup_ref)
            ua = batch.column("ua").to_numpy(zero_copy_only=False)
            ub = batch.column("ub").to_numpy(zero_copy_only=False)
            if len(ku) == 0:
                i64, s = pa.int64(), pa.string()
                return pa.table(
                    {
                        "ua": pa.array([], i64), "ub": pa.array([], i64),
                        "n_buckets": pa.array([], i64),
                        "n_dup_distinct_a": pa.array([], i64),
                        "n_dup_postings_a": pa.array([], i64),
                        "url_a": pa.array([], s), "n_chars_a": pa.array([], i64),
                        "n_dup_distinct_b": pa.array([], i64),
                        "n_dup_postings_b": pa.array([], i64),
                        "url_b": pa.array([], s), "n_chars_b": pa.array([], i64),
                    }
                )
            ia = np.minimum(np.searchsorted(ku, ua), len(ku) - 1)
            ib = np.minimum(np.searchsorted(ku, ub), len(ku) - 1)
            hit = (ku[ia] == ua) & (ku[ib] == ub)
            sub = batch.filter(pa.array(hit))
            ia, ib = ia[hit], ib[hit]
            return pa.table(
                {
                    "ua": sub.column("ua"),
                    "ub": sub.column("ub"),
                    "n_buckets": sub.column("n_buckets"),
                    "n_dup_distinct_a": pa.array(knd[ia], type=pa.int64()),
                    "n_dup_postings_a": pa.array(knp[ia], type=pa.int64()),
                    "url_a": pa.array(kurl[ia], type=pa.string()),
                    "n_chars_a": pa.array(knc[ia], type=pa.int64()),
                    "n_dup_distinct_b": pa.array(knd[ib], type=pa.int64()),
                    "n_dup_postings_b": pa.array(knp[ib], type=pa.int64()),
                    "url_b": pa.array(kurl[ib], type=pa.string()),
                    "n_chars_b": pa.array(knc[ib], type=pa.int64()),
                }
            )

        joined = cand.map_batches(expand, batch_format="pyarrow")
    else:
        a_side = scalars.rename_columns(
            {c: f"{c}_a" for c in scalars.schema().names if c != "uid"}
        ).rename_columns({"uid": "ua"})
        b_side = scalars.rename_columns(
            {c: f"{c}_b" for c in scalars.schema().names if c != "uid"}
        ).rename_columns({"uid": "ub"})
        half = heal(
            cand.join(a_side, "inner", num_partitions=cfg.join_partitions(), on=("ua",)),
            ua=pa.int64(), ub=pa.int64(),
        )
        joined = half.join(b_side, "inner", num_partitions=cfg.join_partitions(), on=("ub",))

    def check(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        common = batch.column("n_buckets").to_numpy(zero_copy_only=False).astype(np.float64)
        np_a = batch.column("n_dup_postings_a").to_numpy(zero_copy_only=False)
        np_b = batch.column("n_dup_postings_b").to_numpy(zero_copy_only=False)
        nd_a = batch.column("n_dup_distinct_a").to_numpy(zero_copy_only=False)
        nd_b = batch.column("n_dup_distinct_b").to_numpy(zero_copy_only=False)
        c_a = common / (np_a + 1)
        c_b = common / (np_b + 1)
        keep = (c_a > thr) | (c_b > thr)
        sub = batch.filter(pa.array(keep))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "uid_a": pa.array([], type=pa.int64()),
                    "uid_b": pa.array([], type=pa.int64()),
                    "url_a": pa.array([], type=pa.string()),
                    "url_b": pa.array([], type=pa.string()),
                    "n_chars_a": pa.array([], type=pa.int64()),
                    "n_chars_b": pa.array([], type=pa.int64()),
                    "common": pa.array([], type=pa.int64()),
                    "containment_a": pa.array([], type=pa.float64()),
                    "containment_b": pa.array([], type=pa.float64()),
                    "jaccard": pa.array([], type=pa.float64()),
                    "n_dup_postings_a": pa.array([], type=pa.int64()),
                    "n_dup_postings_b": pa.array([], type=pa.int64()),
                }
            )
        ka = keep
        c_a_k, c_b_k = c_a[ka], c_b[ka]
        common_k = common[ka]
        nd_a_k, nd_b_k = nd_a[ka], nd_b[ka]
        union = nd_a_k + nd_b_k - common_k
        jac = np.where(union > 0, common_k / np.maximum(union, 1), 0.0)
        url_a = sub.column("url_a").to_pylist()
        url_b = sub.column("url_b").to_pylist()
        swap = np.array([ub < ua_ for ua_, ub in zip(url_a, url_b)])

        def pick(col_a, col_b, numpy=False):
            va = sub.column(col_a).to_numpy(zero_copy_only=False)
            vb = sub.column(col_b).to_numpy(zero_copy_only=False)
            return np.where(swap, vb, va), np.where(swap, va, vb)

        ua_o, ub_o = pick("ua", "ub")
        nca, ncb = pick("n_chars_a", "n_chars_b")
        npa, npb = pick("n_dup_postings_a", "n_dup_postings_b")
        urla = [b if s else a for a, b, s in zip(url_a, url_b, swap)]
        urlb = [a if s else b for a, b, s in zip(url_a, url_b, swap)]
        ca_o = np.where(swap, c_b_k, c_a_k)
        cb_o = np.where(swap, c_a_k, c_b_k)
        return pa.table(
            {
                "uid_a": pa.array(ua_o, type=pa.int64()),
                "uid_b": pa.array(ub_o, type=pa.int64()),
                "url_a": pa.array(urla, type=pa.string()),
                "url_b": pa.array(urlb, type=pa.string()),
                "n_chars_a": pa.array(nca, type=pa.int64()),
                "n_chars_b": pa.array(ncb, type=pa.int64()),
                "common": pa.array(common_k.astype(np.int64)),
                "containment_a": pa.array(ca_o, type=pa.float64()),
                "containment_b": pa.array(cb_o, type=pa.float64()),
                "jaccard": pa.array(jac, type=pa.float64()),
                "n_dup_postings_a": pa.array(npa, type=pa.int64()),
                "n_dup_postings_b": pa.array(npb, type=pa.int64()),
            }
        )

    return joined.map_batches(check, batch_format="pyarrow", batch_size=cfg.verify_batch_size)
