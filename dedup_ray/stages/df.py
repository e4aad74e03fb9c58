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

    partials = pairs.map_batches(df_partials_batch, batch_format="pyarrow")
    return sorted_aggregate(partials, ["shingle"], {"df": ("n", "sum")})


def df_multi(df: Dataset, cfg: DedupConfig) -> Dataset:
    """Shingles with df >= 2 (everything the classification join needs)."""
    return df.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("df"), 2)),
        batch_format="pyarrow",
    )


def df_histogram(df: Dataset) -> Dataset:
    """(df, n_shingles) count-of-counts (A3) — tiny; safe to take_all()."""
    return df.groupby("df").aggregate(Count(alias_name="n_shingles"))


def classify_pairs(pairs: Dataset, multi: Dataset, cfg: DedupConfig) -> Dataset:
    """Join doc-side (shingle, uid, tf) with the df>=2 table (A4/A5).

    Output (uid, shingle, tf, df) — one row per (doc, shingle with df>=2).
    Shingles absent from the join are unique (df == 1) and are reconstructed
    locally at annotation time.
    """
    return pairs.join(
        multi, "inner", num_partitions=cfg.join_partitions(), on=("shingle",)
    )


def filter_dup_band(matched_batch, lo: int, hi: int):
    d = matched_batch.column("df")
    return matched_batch.filter(
        pc.and_(pc.greater_equal(d, lo), pc.less_equal(d, hi))
    )
