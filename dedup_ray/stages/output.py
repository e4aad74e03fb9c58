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
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..config import DedupConfig
from ..hashing import shingle_hashes
from .trim import EPS, trim_text


def doc_stats(matched: Dataset, cfg: DedupConfig) -> Dataset:
    """Per-doc posting counts from the classified shingle rows:
    (uid, n_multi_postings, n_dup_postings)."""
    import pyarrow.compute as pc

    from .groupagg import sorted_aggregate

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


def _assemble_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    k = cfg.shingle_k
    n = batch.num_rows
    names = batch.column_names
    has = lambda c: c in names
    texts = batch.column("text").to_pylist()
    out = {
        "url": batch.column("url").to_pylist(),
        "text_kept": [], "kept": [], "removed_spans": [], "cluster_id": [],
        "removed_dup": [], "total_dup": [], "removed_ndup": [], "total_ndup": [],
    }
    for i in range(n):
        text = texts[i]
        n_chars = len(text)
        n_post = max(0, n_chars - k + 1)
        n_multi = batch.column("n_multi_postings")[i].as_py() or 0
        n_dup = batch.column("n_dup_postings")[i].as_py() or 0
        n_uniq = n_post - n_multi
        iv_blob = batch.column("intervals")[i].as_py() if has("intervals") else None
        if iv_blob:
            flat = np.frombuffer(iv_blob, dtype=np.int64)
            intervals = [(int(flat[2 * j]), int(flat[2 * j + 1])) for j in range(len(flat) // 2)]
            # positions recomputed locally from the doc's classified sets
            dup_blob = batch.column("dup_shingles")[i].as_py()
            multi_blob = batch.column("multi_shingles")[i].as_py()
            h = shingle_hashes(text, k)
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
        else:
            intervals = []
            kept_text, stats = text, [0, n_dup, 0, n_uniq]
        cid = batch.column("cluster_id")[i].as_py() if has("cluster_id") else None
        uid = batch.column("uid")[i].as_py()
        out["text_kept"].append(kept_text)
        out["kept"].append(kept_text != "")
        out["removed_spans"].append([{"start": s, "end": e} for s, e in intervals])
        out["cluster_id"].append(cid if cid is not None else uid)
        out["removed_dup"].append(stats[0])
        out["total_dup"].append(stats[1])
        out["removed_ndup"].append(stats[2])
        out["total_ndup"].append(stats[3])
    return _stats_table(out)


def _stats_table(out: dict) -> pa.Table:
    rd_ = np.array(out["removed_dup"], dtype=np.float64)
    td = np.array(out["total_dup"], dtype=np.float64)
    rn = np.array(out["removed_ndup"], dtype=np.float64)
    tn = np.array(out["total_ndup"], dtype=np.float64)
    cols = {"url": pa.array(out["url"], type=pa.string())}
    cols.update(
        {
            "text_kept": pa.array(out["text_kept"], type=pa.large_string()),
            "kept": pa.array(out["kept"], type=pa.bool_()),
            "removed_spans": pa.array(
                out["removed_spans"],
                type=pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())])),
            ),
            "cluster_id": pa.array(out["cluster_id"], type=pa.int64()),
            "removed_dup": pa.array(np.array(out["removed_dup"], dtype=np.int64)),
            "total_dup": pa.array(np.array(out["total_dup"], dtype=np.int64)),
            "removed_ndup": pa.array(np.array(out["removed_ndup"], dtype=np.int64)),
            "total_ndup": pa.array(np.array(out["total_ndup"], dtype=np.int64)),
            "ratio_dup": pa.array(rd_ / (td + EPS)),
            "ratio_ndup": pa.array(rn / (tn + EPS)),
            "ratio_dnd": pa.array(rd_ / (rn + EPS)),
        }
    )
    return pa.table(cols)


def assemble_output(
    survivors: Dataset,
    merged_intervals: Dataset,
    stats: Dataset,
    sets: Dataset,
    clusters: Dataset,
    exact_edges: Dataset,
    cfg: DedupConfig,
) -> Dataset:
    """Left-join everything per doc, apply trim, append exact-loser rows."""
    from ..util import heal

    npart = cfg.join_partitions()
    ds = survivors
    for right, fields in (
        (merged_intervals, dict(uid=pa.int64(), intervals=pa.large_binary())),
        (stats, dict(uid=pa.int64(), n_multi_postings=pa.int64(), n_dup_postings=pa.int64())),
        (
            sets.select_columns(["uid", "dup_shingles", "multi_shingles"]),
            dict(uid=pa.int64(), dup_shingles=pa.large_binary(), multi_shingles=pa.large_binary()),
        ),
        (clusters, dict(uid=pa.int64(), cluster_id=pa.int64())),
    ):
        right = heal(right, **fields)
        if right.count() == 0:
            # left_outer join against an empty side breaks (no schema per
            # partition) — synthesize the null columns instead
            null_cols = [c for c in fields if c != "uid"]

            def add_nulls(batch: pa.Table, null_cols=null_cols, fields=fields) -> pa.Table:
                for c in null_cols:
                    batch = batch.append_column(
                        c, pa.nulls(batch.num_rows, type=fields[c])
                    )
                return batch

            ds = ds.map_batches(add_nulls, batch_format="pyarrow")
        else:
            ds = heal(
                ds.join(right, "left_outer", num_partitions=npart, on=("uid",)),
                uid=pa.int64(),
            )

    main = ds.map_batches(
        lambda b: _assemble_batch(b, cfg), batch_format="pyarrow", batch_size=256
    )

    main = main.materialize()

    # exact losers: full removal with the byte-identical winner's stats and
    # cluster — one slim join against the assembled winner rows.
    edges = heal(
        exact_edges, uid=pa.int64(), url=pa.string(),
        winner_url=pa.string(), winner_uid=pa.int64(),
    )
    if edges.count() == 0:
        return main

    def main_slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "winner_url": batch.column("url"),
                "w_dup": batch.column("total_dup"),
                "w_ndup": batch.column("total_ndup"),
                "w_cluster": batch.column("cluster_id"),
            }
        )

    slim = heal(
        main.map_batches(main_slim, batch_format="pyarrow"),
        winner_url=pa.string(), w_dup=pa.int64(), w_ndup=pa.int64(), w_cluster=pa.int64(),
    )
    joined = heal(
        edges.join(slim, "inner", num_partitions=npart, on=("winner_url",)),
        uid=pa.int64(),
    )

    def loser_rows(batch: pa.Table) -> pa.Table:
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

    losers = joined.map_batches(loser_rows, batch_format="pyarrow")
    return main.union(losers)
