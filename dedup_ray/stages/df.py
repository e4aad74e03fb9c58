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


def filter_dup_band(matched_batch, lo: int, hi: int):
    d = matched_batch.column("df")
    return matched_batch.filter(
        pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
    )
