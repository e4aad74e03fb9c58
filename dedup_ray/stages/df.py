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

    tables = ray.get(multi.to_arrow_refs())
    big = pa.concat_tables(t for t in tables if t.num_rows and t.num_columns)
    keys = big.column("shingle").to_numpy(zero_copy_only=False)
    dfs = big.column("df").to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], dfs[order]))

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


def shingle_df_classify(survivors: Dataset, cfg: DedupConfig):
    """Fused A1+A4: ONE shingling pass over the materialised survivor blocks,
    a B x P raw-task hash exchange on the shingle for the DF aggregate, and
    broadcast classification of the retained per-block posting tables.

    Returns (multi, matched) as materialised ref-datasets.

    Why not ``Dataset.sort``: the DF table needs grouping, not global order.
    Measured on this node, the sort's sample+exchange+merge pipeline scaled
    only ~1.6x from 8->32 cpus at ~100M rows, while a single-round hash
    exchange (partition by ``shingle % P``, acero ``group_by`` per partition)
    is one map + one reduce with B x P mid-size objects and scales with
    cores; it is also what the exchange looks like on a multi-node cluster.
    Classification reuses the SAME materialised posting blocks — the sort
    path re-shingled the whole corpus a second time.

    Falls back to the Dataset-sort + join path when the df>=2 table exceeds
    the broadcast gate (the 100-TB path keeps working).
    """
    import ray

    from ..util import block_refs, ds_from_refs
    from .shingle import shingle_pairs_batch

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    P = max(8, min(cfg.num_partitions, 2 * cpus))
    refs = block_refs(survivors.materialize())
    B = len(refs)
    if B == 0:
        empty_multi = ds_from_refs([], count=0, shingle=pa.int64(), df=pa.int64())
        empty_matched = ds_from_refs(
            [], count=0, shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64()
        )
        return empty_multi, empty_matched

    @ray.remote(num_returns=1 + P)
    def shingle_split(block: pa.Table):
        # rows are distinct per (shingle, uid), so df == global row count per
        # shingle: the map side only mask-splits the shingle column by
        # partition (NO per-block sort/unique — large concurrent numpy sorts
        # are memory-bandwidth-bound and anti-scale on a shared node; the
        # only sorts left run P-wide in the acero reduce)
        import numpy as np

        pairs = shingle_pairs_batch(block, cfg=cfg)
        sh = pairs.column("shingle").to_numpy(zero_copy_only=False)
        part = sh % P
        outs = [pairs]
        for p in range(P):
            outs.append(
                pa.table({"shingle": pa.array(sh[part == p], type=pa.int64())})
            )
        return tuple(outs)

    outs = [shingle_split.remote(r) for r in refs]
    pairs_refs = [o[0] for o in outs]

    @ray.remote(num_returns=2)
    def reduce(*parts):
        t = pa.concat_tables([p for p in parts if p.num_rows])
        if t.num_rows == 0:
            m = pa.table(
                {"shingle": pa.array([], type=pa.int64()), "df": pa.array([], type=pa.int64())}
            )
            return m, 0
        gt = t.group_by("shingle", use_threads=False).aggregate([("shingle", "count")])
        g = pa.table(
            {"shingle": gt.column("shingle"), "df": gt.column("shingle_count").cast(pa.int64())}
        )
        m = g.filter(pc.greater_equal(g.column("df"), 2))
        return m, m.num_rows

    red = [reduce.remote(*[outs[b][1 + p] for b in range(B)]) for p in range(P)]
    m_counts = ray.get([r[1] for r in red])
    n_multi = int(sum(m_counts))
    multi_refs = [r[0] for r, c in zip(red, m_counts) if c]
    multi = ds_from_refs(
        multi_refs, count=n_multi, shingle=pa.int64(), df=pa.int64()
    )

    if n_multi > cfg.broadcast_classify_limit:
        # 100-TB fallback: distributed join classification of a fresh
        # shingle pass (posting blocks would not all fit hot in plasma there
        # anyway)
        pairs_ds = ds_from_refs(
            pairs_refs, shingle=pa.int64(), uid=pa.int64(), tf=pa.int32()
        )
        matched = pairs_ds.join(
            multi, "inner", num_partitions=cfg.join_partitions(), on=("shingle",)
        )
        from ..util import heal

        matched = heal(
            matched, shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64()
        )
        return multi, matched

    import numpy as np

    tables = ray.get(multi_refs)
    if tables:
        big = pa.concat_tables(tables).combine_chunks()
        keys = big.column("shingle").to_numpy(zero_copy_only=False)
        dfs = big.column("df").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        lookup_ref = ray.put((keys[order], dfs[order]))
    else:
        e = np.empty(0, dtype=np.int64)
        lookup_ref = ray.put((e, e))

    @ray.remote(num_returns=2)
    def classify_blk(pairs_t: pa.Table):
        keys, dfs = ray.get(lookup_ref)
        sh = pairs_t.column("shingle").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            sub = pairs_t.slice(0, 0).append_column("df", pa.array([], type=pa.int64()))
            return sub, 0
        import numpy as np

        idx = np.minimum(np.searchsorted(keys, sh), len(keys) - 1)
        hit = keys[idx] == sh
        sub = pairs_t.filter(pa.array(hit))
        sub = sub.append_column("df", pa.array(dfs[idx[hit]], type=pa.int64()))
        return sub, sub.num_rows

    c_outs = [classify_blk.remote(r) for r in pairs_refs]
    c_counts = ray.get([o[1] for o in c_outs])
    matched = ds_from_refs(
        [o[0] for o, c in zip(c_outs, c_counts) if c],
        count=int(sum(c_counts)),
        shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64(),
    )
    return multi, matched


def filter_dup_band(matched_batch, lo: int, hi: int):
    d = matched_batch.column("df")
    return matched_batch.filter(
        pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
    )
