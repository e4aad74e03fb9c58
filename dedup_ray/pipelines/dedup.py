"""E6 — the composed near-duplicate detection + clustering pipeline.

Ray-Data re-expression of the reference driver ``Deduplicator.dedup()``
(``/root/reference/dedup/dedup.py:129-187``); see SURVEY.md §7.0 for the
stage-by-stage spine.  Every cross-document intermediate is a Dataset; the
only driver-side materialisations are tiny aggregates (cluster edges under
the union-find limit, the DF histogram).

Materialisation points (``.materialize()``) are deliberate phase barriers on
*small or reused* intermediates (signature rows, candidate pairs, dup sets) —
never on the raw corpus — mirroring the reference's per-phase artifact
checkpoints (``kmer_utilities.py:111,139``) until parquet checkpointing
(state/checkpoint.py) replaces them.
"""

from __future__ import annotations

from ray.data import Dataset

from ..config import DedupConfig
from ..stages.exact import exact_dedup
from ..stages.lsh import candidate_pairs, candidate_pairs_dup_index, make_band_rows
from ..stages.minhash import signatures
from ..stages.cluster import connected_components
from ..stages.verify import candidate_uids, dup_sets, verify_pairs


def _with_schema(ds: Dataset, **fields) -> Dataset:
    """Union with a typed zero-row block so empty intermediates keep a schema
    (a Ray Data plan that produced no blocks loses it, which breaks joins)."""
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({k: pa.array([], type=t) for k, t in fields.items()}))
    return ds.union(empty)


def _empty_result(docs: Dataset) -> dict[str, Dataset]:
    """Typed empty outputs for a zero-row corpus."""
    import pyarrow as pa
    import ray.data as rd

    def empty(**fields):
        return rd.from_arrow(
            pa.table({k: pa.array([], type=t) for k, t in fields.items()})
        )

    i64, s, f64, lb = pa.int64(), pa.string(), pa.float64(), pa.large_binary()
    return {
        "survivors": docs,
        "exact_edges": empty(uid=i64, url=s, winner_url=s, winner_uid=i64),
        "matched": empty(shingle=i64, uid=i64, tf=pa.int32(), df=i64),
        "candidates": empty(ua=i64, ub=i64, n_buckets=i64),
        "dup_sets": empty(
            uid=i64, dup_shingles=lb, multi_shingles=lb, n_dup_postings=i64,
            url=s, n_chars=i64,
        ),
        "verified": empty(
            uid_a=i64, uid_b=i64, url_a=s, url_b=s, n_chars_a=i64, n_chars_b=i64,
            common=i64, containment_a=f64, containment_b=f64, jaccard=f64,
            n_dup_postings_a=i64, n_dup_postings_b=i64, common_high=lb,
        ),
        "clusters": empty(uid=i64, cluster_id=i64),
        "decisions": empty(
            loser_uid=i64, loser_url=s, winner_uid=i64, winner_url=s,
            start=i64, end=i64, kind=s, qstart=i64, qend=i64, tstart=i64,
            tend=i64, direction=s, score=f64,
        ),
        "output": empty(
            url=s, text_kept=pa.large_string(), kept=pa.bool_(),
            removed_spans=pa.list_(
                pa.struct([("start", i64), ("end", i64)])
            ),
            cluster_id=i64, removed_dup=i64, total_dup=i64,
            removed_ndup=i64, total_ndup=i64,
            ratio_dup=f64, ratio_ndup=f64, ratio_dnd=f64,
        ),
    }


def near_dedup_pipeline(
    docs: Dataset, cfg: DedupConfig, *, through: str = "output", ckpt=None
) -> dict[str, Dataset]:
    """docs: (uid, url, [warc_ts, lang,] text, n_chars, text_hash).

    Returns the intermediate + result datasets keyed by stage name.
    through="verified" stops after V1+clustering (skips span/trim/output).
    ckpt: optional state.checkpoint.CheckpointManager — every phase barrier
    is then persisted as partitioned Parquet and reruns resume from the last
    valid phase (north_rule resumability).
    """
    import os
    import time

    import pyarrow as pa

    from ..util import fast_count, heal, known_count

    if cfg.tokenizer == "word" and through != "verified":
        # Word-gram posting positions are gram indices, but the span/chain/
        # trim stages past "verified" measure in CHARACTER coordinates
        # (find_spans, decide_pair buffers) — mixing the units would produce
        # silently wrong trim decisions, so the combination is rejected.
        raise ValueError(
            "tokenizer='word' is only supported through='verified' "
            "(span/trim stages operate in char coordinates)"
        )

    _timing = bool(os.environ.get("DEDUP_RAY_TIMING"))
    _last = [time.perf_counter()]

    def tick(name):
        if _timing:
            now = time.perf_counter()
            print(f"[timing] {name}: {now - _last[0]:.2f}s", flush=True)
            _last[0] = now

    def bar(name, ds, fields):
        """Phase barrier: checkpointed parquet (resume) or in-memory heal.
        Datasets already built from healed block refs (known row count) pass
        straight through — no extra execution."""
        if ckpt is not None:
            return ckpt.get_or_compute(name, lambda: ds, fields)
        if known_count(ds) is not None:
            return ds
        return heal(ds, **fields)

    # Materialise the extracted corpus ONCE — read+extract would otherwise
    # re-execute inside every consumer (count, exact sort, shingling) — and
    # re-chunk to ~cfg.exchange_block_bytes blocks: parquet reads leave either
    # hundreds of sub-MB blocks (fixed costs dominate downstream sorts) or a
    # few huge ones (the exchange map's working set then blows past cache and
    # runs at a fraction of the rows/s — measured 6x on this host, see
    # BENCH/BASELINE.md round 4).
    from ..util import rebalance_bytes

    try:
        import ray as _r

        _cpus = int(_r.cluster_resources().get("CPU", 8))
    except Exception:
        _cpus = 8
    from ..stages.registry import apply_stages

    docs = apply_stages(docs, cfg, "docs")
    docs = docs.materialize()
    if fast_count(docs) == 0:
        return _empty_result(docs)
    docs = rebalance_bytes(
        docs, cfg.exchange_block_bytes, count=fast_count(docs),
        parallelism_floor=max(2 * _cpus, 16),
    )
    tick("extract_materialize")

    # E5 fast path: exact duplicates never reach shingling.  survivors and
    # edges are lazy maps over one materialised sorted pass — survivors is
    # checkpointed (it is the reread point for several stages); edges stay
    # lazy unless checkpointing.
    survivors, exact_edges = exact_dedup(docs, cfg)
    # survivors inherit the exact-sort's output granularity — re-chunk to the
    # exchange block size before the shingle fan-out
    survivors = rebalance_bytes(
        survivors.materialize(), cfg.exchange_block_bytes,
        count=known_count(survivors), parallelism_floor=max(2 * _cpus, 16),
    )
    survivors = bar(
        "survivors", survivors,
        dict(uid=pa.int64(), url=pa.string(), text=pa.large_string(),
             n_chars=pa.int64(), text_hash=pa.string()),
    )
    exact_edges = bar(
        "exact_edges", exact_edges,
        dict(uid=pa.int64(), url=pa.string(), winner_url=pa.string(),
             winner_uid=pa.int64()),
    )
    tick("exact_dedup")

    # A1 + A4/A5: shingle -> DF table (the wide exchange) -> per-posting df
    # classification.  Both paths run the fused raw-task hash exchange (one
    # shingling pass, no Dataset sort — stages/df.py shingle_df_classify);
    # checkpointed runs additionally persist the two outputs as the
    # ``df_multi`` / ``matched`` parquet phases (same names as before, so
    # older checkpoints still resume).
    import pyarrow as pa
    import ray.data as rd

    from ..stages.df import shingle_df_classify

    empties = _empty_result(docs)
    doc_partials = None  # per-uid combiner rows from the fused exchange
    pair_raw = None  # fused dup-band pair rows (dup_index strategy only)
    if ckpt is None:
        fuse_pairs = cfg.candidate_strategy != "minhash_lsh"
        outs = shingle_df_classify(
            survivors, cfg, with_doc_partials=True, with_pair_partials=fuse_pairs
        )
        if fuse_pairs:
            multi, matched, doc_partials, pair_raw = outs
        else:
            multi, matched, doc_partials = outs
        tick("df_table")
        if fast_count(multi) == 0:
            matched = empties["matched"].materialize()
        tick("classify_matched")
    else:
        # one fused computation feeds both phases; the thunk caches so a
        # resume that still has df_multi but lost matched recomputes once
        _fused: dict = {}

        def _fused_df():
            if not _fused:
                _fused["multi"], _fused["matched"] = shingle_df_classify(
                    survivors, cfg
                )
            return _fused

        multi = ckpt.get_or_compute(
            "df_multi", lambda: _fused_df()["multi"],
            dict(shingle=pa.int64(), df=pa.int64()),
        )
        tick("df_table")
        if fast_count(multi) == 0:
            matched = empties["matched"].materialize()
        else:
            matched = ckpt.get_or_compute(
                "matched", lambda: _fused_df()["matched"],
                dict(shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64()),
            )
        tick("classify_matched")

    # Candidate generation (J4/A7): exact dup-shingle inverted index (default)
    # or MinHash banding (T1 + T2).
    sigs = None
    pair_fields = dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64())
    if fast_count(matched) == 0:
        cand = empties["candidates"].materialize()
    elif cfg.candidate_strategy == "minhash_lsh":
        from ..stages.lsh import ensemble_extreme_pairs, union_distinct_pairs

        sigs = signatures(matched, cfg)
        band_cand = candidate_pairs(make_band_rows(sigs, cfg), cfg)
        if cfg.lsh_ensemble:
            # containment calibration: size-partition-tagged banding covers
            # bounded-ratio pairs; the exact dup-index complement closes the
            # partition-gap>=2 region where banding's S-curve is blind
            extreme = ensemble_extreme_pairs(
                matched, sigs, cfg, shingle_partitioned=ckpt is None
            )
            band_cand = union_distinct_pairs(band_cand, extreme)
        cand = bar("candidates", band_cand, pair_fields)
    elif pair_raw is not None:
        # fused path: pair rows were emitted inside the exchange reduce;
        # only the distinct + n_buckets aggregation remains
        from ..stages.groupagg import sorted_aggregate
        from ..util import fast_count as _fc

        if _fc(pair_raw) == 0:
            cand = empties["candidates"].materialize()
        else:
            cand = bar(
                "candidates",
                sorted_aggregate(
                    pair_raw, ["ua", "ub"], {"n_buckets": ("ua", "count")},
                    empty_types=dict(ua=pa.int64(), ub=pa.int64(), n_buckets=pa.int64()),
                ),
                pair_fields,
            )
    else:
        cand = bar(
            "candidates",
            candidate_pairs_dup_index(matched, cfg, shingle_partitioned=ckpt is None),
            pair_fields,
        )
    tick("candidates")

    # V1 exact containment verification.  Two physical forms:
    #   * dup_index strategy: n_buckets on a candidate pair IS the distinct
    #     common-dup-shingle count, so verification joins only per-doc
    #     SCALARS — no shingle-set blobs ever travel with a pair (the blob
    #     form is O(pairs x doc_size) in the object store);
    #   * minhash_lsh strategy: banding gives no common counts, so the
    #     blob-based verification (dup_sets + set intersection) runs.
    scalar_v1 = cfg.candidate_strategy != "minhash_lsh"
    high_ref = None
    if scalar_v1 and fast_count(cand) > 0:
        # Broadcast exclusion set for align-time common-dup reconstruction:
        # every shingle OUTSIDE the dup band [lo, hi] (df > hi boilerplate
        # commons AND df in [2, lo) below-band commons — both must be
        # subtracted from the common-text-shingle set).  Size-gated: above
        # broadcast_high_limit rows the driver-side array is unbounded, so
        # fall back to the blob path (per-pair common_high, bounded per pair).
        import numpy as np
        import pyarrow.compute as pc
        import ray as _ray

        from ..util import map_blocks

        _lo, _hi = cfg.duplicate_df_lower, cfg.duplicate_df_upper

        def _outside_band(b):
            t = b.filter(
                pc.or_(pc.greater(b.column("df"), _hi), pc.less(b.column("df"), _lo))
            ).select(["shingle"])
            return t, t.num_rows

        outs = map_blocks(_outside_band, multi.materialize(), num_returns=2)
        counts = _ray.get([o[1] for o in outs])
        if sum(counts) > cfg.broadcast_high_limit:
            scalar_v1 = False
        else:
            tables = _ray.get([o[0] for o, c in zip(outs, counts) if c])
            parts = [t.column("shingle").to_numpy(zero_copy_only=False) for t in tables]
            high_arr = (
                np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
            )
            high_ref = _ray.put(high_arr)
        tick("high_exclusion_set")
    verified_fields = dict(
        uid_a=pa.int64(), uid_b=pa.int64(), url_a=pa.string(),
        url_b=pa.string(), n_chars_a=pa.int64(), n_chars_b=pa.int64(),
        common=pa.int64(), containment_a=pa.float64(),
        containment_b=pa.float64(), jaccard=pa.float64(),
        n_dup_postings_a=pa.int64(), n_dup_postings_b=pa.int64(),
    )
    sets_fields = dict(
        uid=pa.int64(), dup_shingles=pa.large_binary(),
        multi_shingles=pa.large_binary(), n_dup_postings=pa.int64(),
        url=pa.string(), n_chars=pa.int64(),
    )
    sets = empties["dup_sets"]
    if fast_count(cand) == 0:
        verified = empties["verified"].materialize()
    elif scalar_v1:
        from ..stages.verify import doc_scalars, verify_pairs_scalar

        cu = candidate_uids(cand, cfg)
        tick("candidate_uids")
        scalars = doc_scalars(matched, cu, survivors, cfg, partials=doc_partials)
        tick("doc_scalars")
        verified = bar("verified", verify_pairs_scalar(cand, scalars, cfg), verified_fields)
        tick("verified")
    else:
        cu = candidate_uids(cand, cfg)
        sets = bar("dup_sets", dup_sets(matched, cu, survivors, cfg), sets_fields)
        verified_fields_b = dict(verified_fields, common_high=pa.large_binary())
        verified = bar("verified", verify_pairs(cand, sets, cfg), verified_fields_b)

    # A10: clusters over verified + exact edges — edge projection via raw
    # tasks over the materialised pair/edge blocks (no executions).
    from ..stages.cluster import components_from_sources

    clusters = components_from_sources(
        [(verified, "uid_a", "uid_b"), (exact_edges, "uid", "winner_uid")], cfg
    )
    tick("clusters")

    if through == "verified":
        return {
            "survivors": survivors, "exact_edges": exact_edges, "matched": matched,
            "candidates": cand, "dup_sets": sets, "verified": verified,
            "clusters": clusters,
        }

    # V3+V2+D1: span discovery + chaining + decisions over verified pairs.
    from ..stages.align import decisions as make_decisions
    from ..stages.align import merge_decisions
    from ..stages.output import assemble_output, doc_stats

    dec_fields = dict(
        loser_uid=pa.int64(), loser_url=pa.string(), winner_uid=pa.int64(),
        winner_url=pa.string(), start=pa.int64(), end=pa.int64(), kind=pa.string(),
        qstart=pa.int64(), qend=pa.int64(), tstart=pa.int64(), tend=pa.int64(),
        direction=pa.string(), score=pa.float64(),
    )
    if fast_count(verified) == 0:
        dec = empties_align()
        merged = empties_merge()
    else:
        dec = bar(
            "decisions",
            make_decisions(verified, survivors, cfg, high_ref=high_ref),
            dec_fields,
        )
        tick("decisions")
        merged = (
            merge_decisions(dec, cfg) if fast_count(dec) > 0 else empties_merge()
        )
        tick("merge_decisions")

    # Loser-doc mini shingle-sets for output stats (scalar path never built
    # the full blob sets; only docs WITH trim intervals need them).
    if scalar_v1 and fast_count(merged) > 0:
        sets = dup_sets(matched, merged, survivors, cfg)
        tick("loser_sets")

    # M5 + stats + clusters -> final output table.
    stats = doc_stats(matched, cfg, partials=doc_partials)
    tick("doc_stats")
    clusters = bar("clusters", clusters, dict(uid=pa.int64(), cluster_id=pa.int64()))
    output = assemble_output(survivors, merged, stats, sets, clusters, exact_edges, cfg)
    output = apply_stages(output, cfg, "output")
    tick("assemble_output")
    if ckpt is not None:
        out_fields = dict(
            url=pa.string(), text_kept=pa.large_string(), kept=pa.bool_(),
            removed_spans=pa.list_(
                pa.struct([("start", pa.int64()), ("end", pa.int64())])
            ),
            cluster_id=pa.int64(), removed_dup=pa.int64(), total_dup=pa.int64(),
            removed_ndup=pa.int64(), total_ndup=pa.int64(),
            ratio_dup=pa.float64(), ratio_ndup=pa.float64(), ratio_dnd=pa.float64(),
        )
        output = ckpt.get_or_compute("output", lambda: output, out_fields)
        ckpt.write_metrics()

    from ..stages.align import dual_orientation_alignments

    out = {
        "survivors": survivors,
        "exact_edges": exact_edges,
        "matched": matched,
        "candidates": cand,
        "dup_sets": sets,
        "verified": verified,
        "decisions": dec,
        "alignments": dual_orientation_alignments(dec),
        "clusters": clusters,
        "output": output,
    }
    if sigs is not None:
        out["signatures"] = sigs
    return out


def empties_align():
    from ..util import empty_dataset
    import pyarrow as pa

    return empty_dataset(
        loser_uid=pa.int64(), loser_url=pa.string(), winner_uid=pa.int64(),
        winner_url=pa.string(), start=pa.int64(), end=pa.int64(), kind=pa.string(),
        qstart=pa.int64(), qend=pa.int64(), tstart=pa.int64(), tend=pa.int64(),
        direction=pa.string(), score=pa.float64(),
    ).materialize()


def empties_merge():
    from ..util import empty_dataset
    import pyarrow as pa

    return empty_dataset(uid=pa.int64(), intervals=pa.large_binary()).materialize()
