"""Driver-facing query implementations over the testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / pyarrow Table;
``ORACLE_SQL`` holds the DuckDB-equivalent SQL for every SQL-expressible
query (names and column aliases MUST match — the driver hash-compares values
after sorting columns by name).  Non-SQL-expressible pipelines (MinHash
verification, clustering, fingerprints) are registered without oracle SQL and
get the driver's rows-only check.

Float policy: any floating-point output column is produced by a SINGLE IEEE
double operation on exactly the same integers in both engines (e.g. one
division) so values match bitwise; everything else is integer/string.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..stages.extract import docs_from_text_batch


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


_READ_CACHE: dict = {}
# Don't pin giant tables in the object store just to save re-reads: above
# this on-disk size the memo returns the streaming read instead.
_READ_MAT_LIMIT = 8 << 30


def _read_mat(sf_dir: str, table: str, columns=None):
    """Memoised MATERIALISED read, keyed per Ray job + (dir, table, columns).

    The driver runs all registered queries back-to-back in one session;
    most re-read the same small projection of the same table, and every
    re-read is a full executor spin-up (~0.3-1 s).  One materialisation
    serves them all; blocks live in plasma (zero-copy to every consumer).
    Tables larger than ``_READ_MAT_LIMIT`` on disk stay streaming."""
    import os

    import ray

    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (job, sf_dir, table, tuple(columns) if columns else None)
    if key not in _READ_CACHE:
        ds = _read(sf_dir, table, columns)
        try:
            big = os.path.getsize(f"{sf_dir}/{table}.parquet") > _READ_MAT_LIMIT
        except OSError:
            big = False
        _READ_CACHE[key] = ds if big else ds.materialize()
    return _READ_CACHE[key]


_PIPE_CACHE: dict = {}


def _pipeline_verified(sf_dir: str, cfg: DedupConfig) -> dict:
    """Memoised ``through="verified"`` flagship run.  Several queries share
    the identical (sf_dir, cfg) pipeline and the driver runs them
    back-to-back in one session; the results are materialised ref-datasets,
    so reuse is safe while the Ray session (job id in the key) lives."""
    import ray

    from .dedup import near_dedup_pipeline

    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (job, sf_dir, cfg)
    if key not in _PIPE_CACHE:
        _PIPE_CACHE[key] = near_dedup_pipeline(
            documents_as_docs(sf_dir), cfg, through="verified"
        )
    return _PIPE_CACHE[key]


def documents_as_docs(sf_dir: str):
    """documents table -> the engine's doc schema (url := doc://<id>, 8-digit
    zero-padded so lexicographic url order == numeric doc_id order)."""
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def adapt(batch: pa.Table) -> pa.Table:
        # fully vectorised url construction (this is every query's shared
        # ingest path — no to_pylist / per-row formatting here)
        padded = pc.utf8_lpad(pc.cast(batch.column("doc_id"), pa.string()), 8, "0")
        urls = pc.binary_join_element_wise(pa.scalar("doc://"), padded, "")
        t = pa.table(
            {
                "url": urls.combine_chunks().cast(pa.string())
                if isinstance(urls, pa.ChunkedArray)
                else urls.cast(pa.string()),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )
        return docs_from_text_batch(t)

    return ds.map_batches(adapt, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SQL-checkable queries
# --------------------------------------------------------------------------


def q_exact_dup_groups(sf_dir: str):
    """E5 analogue over documents: keeper id + copy count per distinct text.

    Groups by a 128-bit content hash (hashing.hash_hex128, the same
    collision-safe key the E5 stage uses) so the aggregation exchange ships
    32-byte keys instead of full document texts (~40x fewer shuffle bytes);
    values identical to grouping by the text itself."""
    from ..hashing import hash_hex128
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pa.array(hash_hex128(batch.column("text").to_pylist())),
                "doc_id": batch.column("doc_id"),
            }
        )

    out = sorted_aggregate(
        ds.map_batches(key, batch_format="pyarrow"),
        ["h"],
        {"keeper_id": ("doc_id", "min"), "n_copies": ("doc_id", "count")},
        empty_types=dict(h=pa.string(), keeper_id=pa.int64(), n_copies=pa.int64()),
    )
    return out.select_columns(["keeper_id", "n_copies"])


def q_token_counts(sf_dir: str):
    """Whitespace token count per doc (split on single space, like DuckDB
    string_split)."""
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        # n_tokens = spaces + 1 (split(" ") semantics), one vectorised kernel
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.add(
                    pc.count_substring(batch.column("text"), " "), 1
                ).cast(pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_lang_stats(sf_dir: str):
    """Per-language doc count + char sum.  |langs| is tiny, so this is
    per-block partials as raw tasks + a driver merge — the combiner +
    final-merge shape that holds at 100 TB (the merge input is
    O(blocks x langs) rows, never O(docs)).  Streaming fallback for
    unmaterialised (large) reads."""
    import ray
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["lang", "n_chars"])
    if not isinstance(ds, MaterializedDataset):
        from ray.data.aggregate import Count, Sum

        return ds.groupby("lang").aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")
        )

    def part(b: pa.Table):
        langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        ul, inv = np.unique(langs, return_inverse=True)
        return ul, np.bincount(inv), np.bincount(inv, weights=nch).astype(np.int64)

    acc: dict = {}
    for ul, cnt, tot in ray.get(map_blocks(part, ds)):
        for l, c, t in zip(ul, cnt, tot):
            a = acc.setdefault(l, [0, 0])
            a[0] += int(c)
            a[1] += int(t)
    langs = sorted(acc)
    return pa.table(
        {
            "lang": pa.array(langs, type=pa.string()),
            "n_docs": pa.array([acc[l][0] for l in langs], type=pa.int64()),
            "total_chars": pa.array([acc[l][1] for l in langs], type=pa.int64()),
        }
    )


def q_top_docs(sf_dir: str):
    """Top-100 docs by (n_chars desc, doc_id asc): per-block top-k as raw
    tasks + one driver merge of blocks x 100 rows — no global Dataset.sort
    (top-k never needs one).  Streaming fallback for unmaterialised reads."""
    import ray
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "n_chars"])
    if not isinstance(ds, MaterializedDataset):
        return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(100)

    def topk(b: pa.Table):
        n = b.column("n_chars").to_numpy(zero_copy_only=False)
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -n))[:100]
        return d[order], n[order]

    parts = ray.get(map_blocks(topk, ds))
    if not parts:
        e = np.empty(0, dtype=np.int64)
        d, n = e, e
    else:
        d = np.concatenate([p[0] for p in parts])
        n = np.concatenate([p[1] for p in parts])
    order = np.lexsort((d, -n))[:100]
    return pa.table(
        {
            "doc_id": pa.array(d[order], type=pa.int64()),
            "n_chars": pa.array(n[order], type=pa.int64()),
        }
    )


def _word_ngrams(text: str, n: int = 3) -> list[str]:
    w = text.split(" ")
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def _distinct_gram_rows(batch: pa.Table, n: int = 3) -> pa.Table:
    """Vectorised DISTINCT (word-n-gram, doc_id) rows for a batch: one
    split_pattern, one zero-copy flatten, one n-ary shifted-slice
    binary_join_element_wise (doc-edge windows masked out), one Arrow
    hash-distinct.  Equals {set(_word_ngrams(t, n)) x doc} per doc."""
    empty = pa.table(
        {"g": pa.array([], type=pa.string()), "doc_id": pa.array([], type=pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    ws = pc.split_pattern(batch.column("text"), " ")
    la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
    flat = la.flatten()
    offs = la.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    total = len(flat)
    if total < n:
        return empty
    wcount = offs[1:] - offs[:-1]
    doc_of = np.repeat(np.arange(len(wcount)), wcount)
    m = total - n + 1
    joined = pc.binary_join_element_wise(*[flat.slice(j, m) for j in range(n)], " ")
    keep = doc_of[:m] == doc_of[n - 1 :]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "g": joined.filter(pa.array(keep)),
            "doc_id": pa.array(ids[doc_of[:m][keep]], type=pa.int64()),
        }
    )
    return t.group_by(["g", "doc_id"]).aggregate([])


def q_shingle_df_histogram(sf_dir: str):
    """A1+A3 analogue with SQL-expressible word-3-gram shingles:
    df -> number of distinct shingles with that df."""
    from ray.data.aggregate import Count, Sum

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    grams = _distinct_gram_rows

    from ..stages.groupagg import sorted_aggregate

    distinct = ds.map_batches(grams, batch_format="pyarrow")
    df = sorted_aggregate(distinct, ["g"], {"df": ("doc_id", "count")})
    return sorted_aggregate(df, ["df"], {"n_shingles": ("df", "count")})


def q_ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.1,
    df_cap: int = 50,
    *,
    _broadcast_row_gate: int | None = None,
):
    """Exact word-3-gram Jaccard similarity join over the df<=cap gram space:
    pairs sharing a non-hot shingle, jaccard >= threshold.  The df cap bounds
    the self-join fan-out (a gram with df=d emits O(d^2) join rows — hot
    boilerplate grams would dominate and straggle at scale); the cap is
    mirrored in the oracle SQL.

    Scale shape (no ungated broadcasts): hot grams are classified IN PLACE by
    :func:`annotate_bucket_size` (one sorted exchange attaches each gram row's
    global df; rows above the cap are filtered, never collected) — on a web
    corpus "grams with df>cap" is an unbounded set, so it must not transit the
    driver.  The per-doc size table is broadcast only under the standard
    row+byte gate; above it, sizes attach to the pair table via two
    distributed hash joins (both paths parity-tested)."""
    import ray

    from ..stages.bucketjoin import annotate_bucket_size, pairs_by_key
    from ..stages.groupagg import sorted_aggregate
    from ..util import empty_dataset, heal, map_blocks

    cfg = DedupConfig()
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    distinct = heal(
        ds.map_batches(_distinct_gram_rows, batch_format="pyarrow"),
        g=pa.string(), doc_id=pa.int64(),
    ).materialize()

    out_fields = dict(
        doc_a=pa.int64(), doc_b=pa.int64(), common=pa.int64(), jaccard=pa.float64()
    )
    if distinct.count() == 0:
        return empty_dataset(**out_fields)

    # df-cap in place: one sorted exchange attaches each row's global gram df
    marked = annotate_bucket_size(distinct, "g", out_col="_df")
    capped = heal(
        marked.map_batches(
            lambda b: b.filter(
                pc.less_equal(b.column("_df"), df_cap)
            ).drop_columns(["_df"]),
            batch_format="pyarrow",
        ),
        g=pa.string(), doc_id=pa.int64(),
    ).materialize()

    # per-doc capped-gram counts (doc_id -> n distinct kept grams)
    sizes = sorted_aggregate(
        capped, ["doc_id"], {"n_g": ("g", "count")},
        empty_types=dict(doc_id=pa.int64(), n_g=pa.int64()),
    ).materialize()
    n_docs = sizes.count()
    size_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, sizes)))

    # shared-gram pairs + common counts: sorted-bucket emission (one sort +
    # one distinct — no hash self-join; the df cap bounds every bucket)
    common = pairs_by_key(capped, "g", "doc_id", bucket_cap=df_cap)

    if n_docs <= row_gate and size_bytes <= cfg.broadcast_bytes_limit:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("doc_id").to_numpy(zero_copy_only=False),
                    b.column("n_g").to_numpy(zero_copy_only=False),
                ),
                sizes,
            )
        )
        s_ids = (
            np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        )
        s_n = (
            np.concatenate([p[1] for p in parts]).astype(np.int64)
            if parts
            else np.empty(0, np.int64)
        )
        order = np.argsort(s_ids, kind="stable")
        sizes_ref = ray.put((s_ids[order], s_n[order]))

        def jac(batch: pa.Table) -> pa.Table:
            ids, nsz = ray.get(sizes_ref)
            da = batch.column("ua").to_numpy(zero_copy_only=False)
            db = batch.column("ub").to_numpy(zero_copy_only=False)
            c = batch.column("n_buckets").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if len(ids) == 0:
                na = nb = np.zeros(len(da), dtype=np.int64)
            else:
                na = nsz[np.minimum(np.searchsorted(ids, da), len(ids) - 1)]
                nb = nsz[np.minimum(np.searchsorted(ids, db), len(ids) - 1)]
            j = c / (na + nb - c)  # single IEEE division — bitwise match with SQL
            keep = j >= threshold
            return pa.table(
                {
                    "doc_a": pa.array(da[keep], type=pa.int64()),
                    "doc_b": pa.array(db[keep], type=pa.int64()),
                    "common": pa.array(c[keep].astype(np.int64)),
                    "jaccard": pa.array(j[keep], type=pa.float64()),
                }
            )

        return common.map_batches(jac, batch_format="pyarrow")

    # 100-TB path: attach na/nb via two distributed hash joins (pair rows are
    # bounded by the df cap; the size table never transits the driver)
    a_sizes = sizes.map_batches(
        lambda b: pa.table({"ua": b.column("doc_id"), "_na": b.column("n_g")}),
        batch_format="pyarrow",
    )
    b_sizes = sizes.map_batches(
        lambda b: pa.table({"ub": b.column("doc_id"), "_nb": b.column("n_g")}),
        batch_format="pyarrow",
    )
    nparts = cfg.join_partitions()
    joined = common.join(a_sizes, "inner", num_partitions=nparts, on=("ua",)).join(
        b_sizes, "inner", num_partitions=nparts, on=("ub",)
    )

    def jac_joined(batch: pa.Table) -> pa.Table:
        da = batch.column("ua").to_numpy(zero_copy_only=False)
        db = batch.column("ub").to_numpy(zero_copy_only=False)
        c = batch.column("n_buckets").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        na = batch.column("_na").to_numpy(zero_copy_only=False)
        nb = batch.column("_nb").to_numpy(zero_copy_only=False)
        j = c / (na + nb - c)  # same single IEEE division as the gated path
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep], type=pa.int64()),
                "doc_b": pa.array(db[keep], type=pa.int64()),
                "common": pa.array(c[keep].astype(np.int64)),
                "jaccard": pa.array(j[keep], type=pa.float64()),
            }
        )

    return heal(
        joined.map_batches(jac_joined, batch_format="pyarrow"), **out_fields
    )


def q_containment_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    df_cap: int = 50,
    *,
    _broadcast_row_gate: int | None = None,
    _raw: bool = False,
):
    """Asymmetric CONTAINMENT join over word-token sets — the reference's
    core pair decision re-expressed as a standalone oracle-faced operator:
    the reference scores a candidate pair by |common homo-dup kmers| /
    |smaller side| and keeps it above 0.9 (/root/reference/dedup/dedup.py
    pair decision; stages/decide.py keeps the quirk in the flagship).  Here:
    pairs with max-direction containment |A∩B| / min(|A|, |B|) >= threshold
    over the df<=cap token space (the cap bounds the self-join fan-out and
    is mirrored in the SQL, exactly like q_ngram_jaccard_pairs).

    Physical shape: annotate_bucket_size df attach -> in-place cap filter ->
    sorted-bucket pair emission (common counts ride the aggregation) ->
    per-doc capped-set sizes attached under the standard row+byte broadcast
    gate with the two-hash-join 100-TB fallback."""
    import ray

    from ..stages.bucketjoin import annotate_bucket_size, pairs_by_key
    from ..stages.groupagg import sorted_aggregate
    from ..util import empty_dataset, heal, map_blocks

    cfg = DedupConfig()
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    distinct = heal(
        ds.map_batches(
            lambda b: _distinct_token_rows(b).drop_columns(["_n"]),
            batch_format="pyarrow",
        ),
        doc_id=pa.int64(), tok=pa.string(),
    ).materialize()

    if _raw:
        out_fields = dict(
            doc_a=pa.int64(), doc_b=pa.int64(), common=pa.int64(),
            na=pa.int64(), nb=pa.int64(),
        )
    else:
        out_fields = dict(
            doc_a=pa.int64(), doc_b=pa.int64(), common=pa.int64(),
            containment=pa.float64(),
        )
    if distinct.count() == 0:
        return empty_dataset(**out_fields)

    marked = annotate_bucket_size(distinct, "tok", out_col="_df")
    capped = heal(
        marked.map_batches(
            lambda b: b.filter(
                pc.less_equal(b.column("_df"), df_cap)
            ).drop_columns(["_df"]),
            batch_format="pyarrow",
        ),
        doc_id=pa.int64(), tok=pa.string(),
    ).materialize()

    sizes = sorted_aggregate(
        capped, ["doc_id"], {"n_t": ("tok", "count")},
        empty_types=dict(doc_id=pa.int64(), n_t=pa.int64()),
    ).materialize()
    n_docs = sizes.count()
    size_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, sizes)))

    common = pairs_by_key(capped, "tok", "doc_id", bucket_cap=df_cap)

    def _score(da, db, c, na, nb):
        if _raw:  # unthresholded candidates + sizes, for q_jaccard_knn
            return pa.table(
                {
                    "doc_a": pa.array(da, type=pa.int64()),
                    "doc_b": pa.array(db, type=pa.int64()),
                    "common": pa.array(c.astype(np.int64)),
                    "na": pa.array(np.asarray(na, dtype=np.int64)),
                    "nb": pa.array(np.asarray(nb, dtype=np.int64)),
                }
            )
        cont = c / np.minimum(na, nb)  # single IEEE divide — SQL-exact
        keep = cont >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep], type=pa.int64()),
                "doc_b": pa.array(db[keep], type=pa.int64()),
                "common": pa.array(c[keep].astype(np.int64)),
                "containment": pa.array(cont[keep], type=pa.float64()),
            }
        )

    if n_docs <= row_gate and size_bytes <= cfg.broadcast_bytes_limit:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("doc_id").to_numpy(zero_copy_only=False),
                    b.column("n_t").to_numpy(zero_copy_only=False),
                ),
                sizes,
            )
        )
        s_ids = (
            np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        )
        s_n = (
            np.concatenate([p[1] for p in parts]).astype(np.int64)
            if parts
            else np.empty(0, np.int64)
        )
        order = np.argsort(s_ids, kind="stable")
        sizes_ref = ray.put((s_ids[order], s_n[order]))

        def score(batch: pa.Table) -> pa.Table:
            ids, nsz = ray.get(sizes_ref)
            da = batch.column("ua").to_numpy(zero_copy_only=False)
            db = batch.column("ub").to_numpy(zero_copy_only=False)
            c = batch.column("n_buckets").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if len(ids) == 0:
                na = nb = np.ones(len(da), dtype=np.int64)
            else:
                na = nsz[np.minimum(np.searchsorted(ids, da), len(ids) - 1)]
                nb = nsz[np.minimum(np.searchsorted(ids, db), len(ids) - 1)]
            return _score(da, db, c, na, nb)

        return common.map_batches(score, batch_format="pyarrow")

    a_sizes = sizes.map_batches(
        lambda b: pa.table({"ua": b.column("doc_id"), "_na": b.column("n_t")}),
        batch_format="pyarrow",
    )
    b_sizes = sizes.map_batches(
        lambda b: pa.table({"ub": b.column("doc_id"), "_nb": b.column("n_t")}),
        batch_format="pyarrow",
    )
    nparts = cfg.join_partitions()
    joined = common.join(a_sizes, "inner", num_partitions=nparts, on=("ua",)).join(
        b_sizes, "inner", num_partitions=nparts, on=("ub",)
    )

    def score_joined(batch: pa.Table) -> pa.Table:
        return _score(
            batch.column("ua").to_numpy(zero_copy_only=False),
            batch.column("ub").to_numpy(zero_copy_only=False),
            batch.column("n_buckets").to_numpy(zero_copy_only=False).astype(np.float64),
            batch.column("_na").to_numpy(zero_copy_only=False),
            batch.column("_nb").to_numpy(zero_copy_only=False),
        )

    return heal(
        joined.map_batches(score_joined, batch_format="pyarrow"), **out_fields
    )


def q_jaccard_knn(sf_dir: str, k: int = 3, df_cap: int = 50):
    """Text-side k-nearest-neighbours by token Jaccard: each doc's top-k
    most-similar docs among its df<=cap candidate pairs — the lexical
    sibling of the embedding ANN operators (ann_topk / ann_ivf_topk), the
    query a curation pipeline runs to audit 'what is this doc's closest
    duplicate'.

    Physical shape: the q_containment_pairs candidate machinery in raw mode
    (pairs + both capped-set sizes, no threshold), jaccard per pair, rows
    mirrored to both directions, ONE range sort by doc + per-block
    vectorised rank (ties: jaccard DESC, neighbour ASC) with the standard
    <=2-docs-per-block-edge driver heal (the events_rank shape)."""
    import ray

    from ..util import ds_from_refs, split_boundary

    raw = q_containment_pairs(sf_dir, df_cap=df_cap, _raw=True)

    def mirror(b: pa.Table) -> pa.Table:
        da = b.column("doc_a").to_numpy(zero_copy_only=False)
        db = b.column("doc_b").to_numpy(zero_copy_only=False)
        c = b.column("common").to_numpy(zero_copy_only=False).astype(np.float64)
        na = b.column("na").to_numpy(zero_copy_only=False)
        nb = b.column("nb").to_numpy(zero_copy_only=False)
        j = c / (na + nb - c)  # single IEEE divide — SQL-exact
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([da, db])),
                "neighbor_id": pa.array(np.concatenate([db, da])),
                "common": pa.array(
                    np.concatenate([c, c]).astype(np.int64)
                ),
                "jaccard": pa.array(np.concatenate([j, j]), type=pa.float64()),
            }
        )

    s = raw.map_batches(mirror, batch_format="pyarrow").sort("doc_id")

    def _rank(d, nbr, c, j):
        order = np.lexsort((nbr, -j, d))
        d, nbr, c, j = d[order], nbr[order], c[order], j[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        base = np.repeat(starts, np.diff(np.r_[starts, len(d)]))
        rnk = np.arange(len(d), dtype=np.int64) - base + 1
        keep = rnk <= k
        return d[keep], nbr[keep], c[keep], j[keep], rnk[keep]

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "common": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
                "rnk": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nbr = batch.column("neighbor_id").to_numpy(zero_copy_only=False)
        c = batch.column("common").to_numpy(zero_copy_only=False)
        j = batch.column("jaccard").to_numpy(zero_copy_only=False)
        bnd = (d == d[0]) | (d == d[-1])
        inner = ~bnd
        rd, rn, rc, rj, rr = _rank(d[inner], nbr[inner], c[inner], j[inner])
        n_b = int(bnd.sum())
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([rd, d[bnd]])),
                "neighbor_id": pa.array(np.concatenate([rn, nbr[bnd]])),
                "common": pa.array(np.concatenate([rc, c[bnd]])),
                "jaccard": pa.array(
                    np.concatenate([rj, j[bnd]]), type=pa.float64()
                ),
                "rnk": pa.array(
                    np.concatenate([rr, np.zeros(n_b, dtype=np.int64)])
                ),
                "_boundary": pa.array(
                    np.r_[np.zeros(len(rd), bool), np.ones(n_b, bool)]
                ),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    extra = 0
    if boundary is not None and boundary.num_rows:
        rd, rn, rc, rj, rr = _rank(
            boundary.column("doc_id").to_numpy(zero_copy_only=False),
            boundary.column("neighbor_id").to_numpy(zero_copy_only=False),
            boundary.column("common").to_numpy(zero_copy_only=False),
            boundary.column("jaccard").to_numpy(zero_copy_only=False),
        )
        healed = pa.table(
            {
                "doc_id": pa.array(rd),
                "neighbor_id": pa.array(rn),
                "common": pa.array(rc),
                "jaccard": pa.array(rj, type=pa.float64()),
                "rnk": pa.array(rr),
            }
        )
        if healed.num_rows:
            int_refs.append(ray.put(healed))
            extra = healed.num_rows
    return ds_from_refs(
        int_refs, count=n_int + extra,
        doc_id=pa.int64(), neighbor_id=pa.int64(), common=pa.int64(),
        jaccard=pa.float64(), rnk=pa.int64(),
    ).sort(["doc_id", "rnk"])


def q_minhash_recall_report(sf_dir: str):
    """Corpus-level banding QUALITY report — the north-rule dup-pair-recall
    criterion as a measurable operator: exact word-3-gram Jaccard pairs
    (q_ngram_jaccard_pairs, the green truth definition) vs the MinHash-LSH
    banding candidates (q_minhash_band_pairs, same gram space), reduced to
    ONE row: (n_true, n_candidates, n_hit, recall, prec).

    Physical shape: both pair sets tagged and unioned, ONE sorted-sum
    exchange per (doc_a, doc_b), then per-block counter partials merged on
    the driver (O(blocks) scalars — pair sets never land on the driver)."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    truth = q_ngram_jaccard_pairs(sf_dir)
    band = q_minhash_band_pairs(sf_dir)

    def tag(t_val: int, c_val: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    "doc_a": b.column("doc_a"),
                    "doc_b": b.column("doc_b"),
                    "t": pa.array(np.full(n, t_val, np.int64)),
                    "c": pa.array(np.full(n, c_val, np.int64)),
                }
            )

        return fn

    rows = truth.map_batches(tag(1, 0), batch_format="pyarrow").union(
        band.map_batches(tag(0, 1), batch_format="pyarrow")
    )
    agg = sorted_aggregate(
        rows, ["doc_a", "doc_b"], {"t": ("t", "sum"), "c": ("c", "sum")},
        empty_types=dict(
            doc_a=pa.int64(), doc_b=pa.int64(), t=pa.int64(), c=pa.int64()
        ),
    ).materialize()

    def counters(b: pa.Table):
        t = b.column("t").to_numpy(zero_copy_only=False) > 0
        c = b.column("c").to_numpy(zero_copy_only=False) > 0
        return int(t.sum()), int(c.sum()), int((t & c).sum())

    parts = ray.get(map_blocks(counters, agg))
    n_true = sum(p[0] for p in parts)
    n_cand = sum(p[1] for p in parts)
    n_hit = sum(p[2] for p in parts)
    recall = float(n_hit) / n_true if n_true else 0.0
    prec = float(n_hit) / n_cand if n_cand else 0.0
    return pa.table(
        {
            "n_true": pa.array([n_true], pa.int64()),
            "n_candidates": pa.array([n_cand], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "recall": pa.array([recall], pa.float64()),
            "prec": pa.array([prec], pa.float64()),
        }
    )


def q_inverted_index(sf_dir: str, df_cap: int = 400):
    """Distributed inverted-index CONSTRUCTION: one row per df<=cap word
    token with its document frequency and ordered posting list — the index-
    build operator class (search/retrieval prep) next to the pair-join uses
    of the same postings.  The posting list is emitted as a comma-joined
    STRING so the value hash is representation-stable across Arrow/pandas/
    DuckDB (a list column stringifies differently per system).

    Physical shape: distinct (doc, tok) rows -> annotate_bucket_size df
    attach + in-place cap filter (hot tokens never transit anywhere) -> ONE
    sort by (tok, doc_id) -> per-block vectorised list build; block-edge
    tokens ship their rows to the O(blocks) driver heal (setsim's
    contract)."""
    import ray

    from ..stages.bucketjoin import annotate_bucket_size
    from ..util import ds_from_refs, empty_dataset, heal, split_boundary

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    fields = dict(tok=pa.string(), df=pa.int64(), postings=pa.string())

    distinct = heal(
        ds.map_batches(
            lambda b: _distinct_token_rows(b).drop_columns(["_n"]),
            batch_format="pyarrow",
        ),
        doc_id=pa.int64(), tok=pa.string(),
    ).materialize()
    if distinct.count() == 0:
        return empty_dataset(**fields)

    marked = annotate_bucket_size(distinct, "tok", out_col="_df")
    capped = marked.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("_df"), df_cap)),
        batch_format="pyarrow",
    )
    s = capped.sort(["tok", "doc_id"])

    def _build(toks: np.ndarray, docs: np.ndarray) -> pa.Table:
        """(tok, df, postings) for rows already sorted by (tok, doc)."""
        if len(toks) == 0:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        ends = np.r_[starts[1:], len(toks)]
        out_t, out_d, out_p = [], [], []
        for st, en in zip(starts.tolist(), ends.tolist()):
            out_t.append(toks[st])
            out_d.append(en - st)
            out_p.append(",".join(map(str, docs[st:en].tolist())))
        return pa.table(
            {
                "tok": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_d, type=pa.int64()),
                "postings": pa.array(out_p, type=pa.string()),
            }
        )

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "postings": pa.array([], pa.string()),
                "_doc": pa.array([], pa.int64()),
                "_boundary": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        toks = np.asarray(batch.column("tok").to_pylist(), dtype=object)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bnd = (toks == toks[0]) | (toks == toks[-1])
        built = _build(toks[~bnd], docs[~bnd])
        n_b = int(bnd.sum())
        return pa.table(
            {
                "tok": pa.concat_arrays(
                    [
                        built.column("tok").combine_chunks(),
                        pa.array(toks[bnd].tolist(), type=pa.string()),
                    ]
                ),
                "df": pa.array(
                    np.r_[
                        built.column("df").to_numpy(zero_copy_only=False)
                        if built.num_rows
                        else np.empty(0, np.int64),
                        np.zeros(n_b, np.int64),
                    ]
                ),
                "postings": pa.concat_arrays(
                    [
                        built.column("postings").combine_chunks(),
                        pa.array([""] * n_b, type=pa.string()),
                    ]
                ),
                "_doc": pa.array(
                    np.r_[
                        np.zeros(built.num_rows, np.int64), docs[bnd]
                    ]
                ),
                "_boundary": pa.array(
                    np.r_[np.zeros(built.num_rows, bool), np.ones(n_b, bool)]
                ),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    drop_aux = ray.remote(lambda t: t.select(["tok", "df", "postings"]))
    int_refs = [drop_aux.remote(r) for r in int_refs]
    extra = 0
    if boundary is not None and boundary.num_rows:
        order = pc.sort_indices(
            boundary,
            sort_keys=[("tok", "ascending"), ("_doc", "ascending")],
        )
        b = boundary.take(order)
        healed = _build(
            np.asarray(b.column("tok").to_pylist(), dtype=object),
            b.column("_doc").to_numpy(zero_copy_only=False),
        )
        if healed.num_rows:
            int_refs.append(ray.put(healed))
            extra = healed.num_rows
    return ds_from_refs(int_refs, count=n_int + extra, **fields)


def q_weighted_jaccard_pairs(
    sf_dir: str, threshold: float = 0.3, df_cap: int = 50
):
    """Weighted (multiset/bag) Jaccard join: sum-min over sum-max of token
    FREQUENCIES — the tf-aware sibling of the set-Jaccard joins, the
    similarity a curation pipeline wants when repetition matters (a doc
    that repeats a template 50x is not 0.99-similar to one mentioning it
    once).  Identity used on both sides: sum_max = N_a + N_b - sum_min
    where N is the doc's total token count, so only sum_min needs the
    per-pair merge.

    Physical shape: candidates exactly as q_containment_pairs (distinct
    df<=cap tokens, sorted-bucket emission); verification recomputes both
    tf vectors from the pair texts inside map_batches (setsim's
    factorise-to-int-codes trick, one sorted-merge min-sum per pair) —
    verify cost scales with CANDIDATES, never corpus size."""
    from ..stages.bucketjoin import annotate_bucket_size, pairs_by_key
    from ..util import empty_dataset, heal

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    distinct = heal(
        ds.map_batches(
            lambda b: _distinct_token_rows(b).drop_columns(["_n"]),
            batch_format="pyarrow",
        ),
        doc_id=pa.int64(), tok=pa.string(),
    ).materialize()

    out_fields = dict(
        doc_a=pa.int64(), doc_b=pa.int64(), common=pa.int64(),
        wjaccard=pa.float64(),
    )
    if distinct.count() == 0:
        return empty_dataset(**out_fields)

    marked = annotate_bucket_size(distinct, "tok", out_col="_df")
    capped = heal(
        marked.map_batches(
            lambda b: b.filter(
                pc.less_equal(b.column("_df"), df_cap)
            ).drop_columns(["_df"]),
            batch_format="pyarrow",
        ),
        doc_id=pa.int64(), tok=pa.string(),
    ).materialize()
    cand = pairs_by_key(capped, "tok", "doc_id", bucket_cap=df_cap)
    with_texts = _pairs_with_texts(cand, ds)

    def verify(batch: pa.Table) -> pa.Table:
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        uids = np.concatenate([ua, ub])
        _, first = np.unique(uids, return_index=True)
        texts = pa.concat_arrays(
            [
                batch.column("text_a").combine_chunks(),
                batch.column("text_b").combine_chunks(),
            ]
        ).take(pa.array(first))
        tl = pc.split_pattern(texts, " ")
        flat = tl.flatten().to_numpy(zero_copy_only=False)
        offs = tl.offsets.to_numpy().astype(np.int64)
        _, inv = np.unique(flat, return_inverse=True)
        tfs: dict = {}
        totals: dict = {}
        for i, p in enumerate(first):
            seg = inv[offs[i] : offs[i + 1]]
            codes, cnt = np.unique(seg, return_counts=True)
            tfs[int(uids[p])] = (codes, cnt.astype(np.int64))
            totals[int(uids[p])] = int(len(seg))
        out_a, out_b, out_c, out_j = [], [], [], []
        for a, b_ in zip(ua.tolist(), ub.tolist()):
            ca, fa = tfs[a]
            cb, fb = tfs[b_]
            ia = np.searchsorted(ca, cb)
            ok = (ia < len(ca)) & (ca[np.minimum(ia, len(ca) - 1)] == cb)
            msum = float(np.minimum(fa[ia[ok]], fb[ok]).sum())
            j = msum / (totals[a] + totals[b_] - msum)  # one IEEE divide
            if j >= threshold:
                out_a.append(a)
                out_b.append(b_)
                out_c.append(int(msum))
                out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "common": pa.array(out_c, type=pa.int64()),
                "wjaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return with_texts.map_batches(verify, batch_format="pyarrow").sort(
        ["doc_a", "doc_b"]
    )


def q_events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session-window aggregate (gaps-and-islands): a user's new session
    starts when the gap since their previous event exceeds ``gap_minutes``.
    Ray Data has no native session windows; physical shape = ONE range sort
    by (user_id, ts) + per-block vectorised sessionisation for interior
    users + a tiny driver heal for the <=2 users spanning each block edge
    (their raw events travel as flagged rows).  Deterministic under ts ties:
    a tied row's gap is 0, so tie order never moves a session boundary."""
    import ray

    from ..util import ds_from_refs, split_boundary

    gap = gap_minutes * 60_000_000
    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts"])

    def to_micros(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.int64()),
            }
        )

    s = ds.map_batches(to_micros, batch_format="pyarrow").sort(["user_id", "ts"])

    def _sessionize(u: np.ndarray, t: np.ndarray):
        """(user_id, session_start, n_events) arrays from (user,ts)-sorted rows."""
        if len(u) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        brk = np.r_[True, (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap)]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.r_[starts, len(u)])
        return u[starts], t[starts], sizes.astype(np.int64)

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        bnd = (u == u[0]) | (u == u[-1])
        su, st, sn = _sessionize(u[~bnd], t[~bnd])
        n_i, n_b = len(su), int(bnd.sum())
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([su, u[bnd]])),
                "ts": pa.array(np.concatenate([st, t[bnd]])),
                "n_events": pa.array(
                    np.concatenate([sn, np.ones(n_b, dtype=np.int64)])
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        bu = boundary.column("user_id").to_numpy(zero_copy_only=False)
        bt = boundary.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((bt, bu))
        su, st, sn = _sessionize(bu[order], bt[order])
        ref = ray.put(
            pa.table(
                {
                    "user_id": pa.array(su),
                    "ts": pa.array(st),
                    "n_events": pa.array(sn),
                }
            )
        )
        int_refs = int_refs + [ref]
        n_int += len(su)
    out = ds_from_refs(
        int_refs, count=n_int,
        user_id=pa.int64(), ts=pa.int64(), n_events=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "session_start": batch.column("ts").cast(pa.timestamp("us")),
                "n_events": batch.column("n_events"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_asof_join(sf_dir: str):
    """As-of join — each 'purchase' event matched to the same user's most
    recent 'signup' at or before it (inner semantics, DuckDB ASOF JOIN as
    the oracle).  Ray Data lacks as-of joins; physical shape = filter+tag
    both sides, ONE range sort by (user_id, ts, kind) with signups ordered
    before purchases at equal ts, per-block vectorised forward fill of the
    last signup index for interior users, boundary-user driver heal."""
    import ray

    from ..util import ds_from_refs, split_boundary

    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "signup"), pc.equal(et, "purchase"))
        sub = batch.filter(keep)
        kind = pc.cast(pc.equal(sub.column("event_type"), "purchase"), pa.int8())
        return pa.table(
            {
                "user_id": sub.column("user_id"),
                "ts": sub.column("ts").cast(pa.int64()),
                "kind": kind,
            }
        )

    s = ds.map_batches(tag, batch_format="pyarrow").sort(["user_id", "ts", "kind"])

    def _asof(u: np.ndarray, t: np.ndarray, k: np.ndarray):
        """(user_id, purchase_ts, signup_ts) from (u,ts,kind)-sorted rows."""
        if len(u) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        idx = np.arange(len(u))
        fill = np.maximum.accumulate(np.where(k == 0, idx, -1))
        ok = (k == 1) & (fill >= 0)
        ok[ok] &= u[fill[ok]] == u[ok]  # fill must not cross a user boundary
        return u[ok], t[ok], t[fill[ok]]

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "signup_ts": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        k = batch.column("kind").to_numpy(zero_copy_only=False)
        bnd = (u == u[0]) | (u == u[-1])
        ju, jt, js = _asof(u[~bnd], t[~bnd], k[~bnd])
        n_i, n_b = len(ju), int(bnd.sum())
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([ju, u[bnd]])),
                "ts": pa.array(np.concatenate([jt, t[bnd]])),
                "signup_ts": pa.array(
                    np.concatenate([js, np.zeros(n_b, dtype=np.int64)])
                ),
                "kind": pa.array(
                    np.concatenate([np.zeros(n_i, dtype=np.int8), k[bnd]])
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        bu = boundary.column("user_id").to_numpy(zero_copy_only=False)
        bt = boundary.column("ts").to_numpy(zero_copy_only=False)
        bk = boundary.column("kind").to_numpy(zero_copy_only=False)
        order = np.lexsort((bk, bt, bu))
        ju, jt, js = _asof(bu[order], bt[order], bk[order])
        ref = ray.put(
            pa.table(
                {
                    "user_id": pa.array(ju),
                    "ts": pa.array(jt),
                    "signup_ts": pa.array(js),
                    "kind": pa.array(np.zeros(len(ju), dtype=np.int8)),
                }
            )
        )
        int_refs = int_refs + [ref]
        n_int += len(ju)
    out = ds_from_refs(
        int_refs, count=n_int, user_id=pa.int64(), ts=pa.int64(),
        signup_ts=pa.int64(), kind=pa.int8(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "purchase_ts": batch.column("ts").cast(pa.timestamp("us")),
                "signup_ts": batch.column("signup_ts").cast(pa.timestamp("us")),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_events_range_join(sf_dir: str, window_minutes: int = 5):
    """Range join — pairs of a user's events at most ``window_minutes``
    apart, ordered (earlier, later) with event_id breaking ts ties.  Ray
    Data lacks range joins; physical shape = ONE range sort by (user_id,
    ts, event_id), then per block a fully vectorised two-pointer emission:
    per-user timestamps are lifted onto a single strictly-increasing int64
    axis (segment offsets) so one ``searchsorted`` finds every row's window
    end, and the ragged (i, j) enumeration is repeat/cumsum arithmetic.
    Boundary users heal on the driver with the same kernel."""
    import ray

    from ..util import ds_from_refs, split_boundary

    W = window_minutes * 60_000_000
    ds = _read_mat(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    s = ds.map_batches(prep, batch_format="pyarrow").sort(
        ["user_id", "ts", "event_id"]
    )

    def _pairs(u: np.ndarray, t: np.ndarray, eid: np.ndarray):
        n = len(u)
        if n == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        seg = np.cumsum(np.r_[0, (u[1:] != u[:-1]).astype(np.int64)])
        base = t - t.min()
        span = int(base.max()) + W + 1
        # lift every user onto one strictly increasing axis; int64 headroom
        # guard (corpora with absurd ts ranges fall back to per-user slices)
        if seg[-1] + 1 > (2**62) // max(span, 1):
            ua, ub = [], []
            starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
            for st, en in zip(starts, np.r_[starts[1:], n]):
                a, b = _pairs(u[st:en] * 0, t[st:en], eid[st:en])
                ua.append(a)
                ub.append(b)
            return np.concatenate(ua), np.concatenate(ub)
        adj = base + seg * span
        ends = np.searchsorted(adj, adj + W, side="right")
        counts = ends - np.arange(n) - 1
        tot = int(counts.sum())
        if tot == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        i_rep = np.repeat(np.arange(n), counts)
        off = np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        j = i_rep + 1 + off
        return eid[i_rep], eid[j]

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "_aux": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        bnd = (u == u[0]) | (u == u[-1])
        pa_, pb_ = _pairs(u[~bnd], t[~bnd], eid[~bnd])
        n_i, n_b = len(pa_), int(bnd.sum())
        # boundary rows carry (user_id in id_a, event_id in id_b, ts in _aux)
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([pa_, u[bnd]])),
                "id_b": pa.array(np.concatenate([pb_, eid[bnd]])),
                "_aux": pa.array(
                    np.concatenate([np.zeros(n_i, dtype=np.int64), t[bnd]])
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        bu = boundary.column("id_a").to_numpy(zero_copy_only=False)
        be = boundary.column("id_b").to_numpy(zero_copy_only=False)
        bt = boundary.column("_aux").to_numpy(zero_copy_only=False)
        order = np.lexsort((be, bt, bu))
        pa_, pb_ = _pairs(bu[order], bt[order], be[order])
        ref = ray.put(
            pa.table(
                {
                    "id_a": pa.array(pa_),
                    "id_b": pa.array(pb_),
                    "_aux": pa.array(np.zeros(len(pa_), dtype=np.int64)),
                }
            )
        )
        int_refs = int_refs + [ref]
        n_int += len(pa_)
    out = ds_from_refs(
        int_refs, count=n_int, id_a=pa.int64(), id_b=pa.int64(), _aux=pa.int64()
    )
    return out.map_batches(
        lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
    )


def q_near_dup_pairs_oracle(sf_dir: str):
    """The FLAGSHIP pipeline (exact dedup -> DF band [2,4] -> dup-index
    candidates -> scalar V1 containment > 0.2) under the word-3-gram
    tokenizer, whose shingles are exactly DuckDB ``string_split`` grams — so
    the whole verified-pair math is SQL-oracle-checkable end to end."""

    cfg = DedupConfig(
        num_partitions=16, tokenizer="word", word_ngram=3,
        min_doc_len=10, end_buffer=50, alignment_max_gap=50,
    )
    r = _pipeline_verified(sf_dir, cfg)
    return r["verified"].select_columns(
        ["url_a", "url_b", "common", "n_dup_postings_a", "n_dup_postings_b"]
    )


def q_top_docs_per_source(sf_dir: str, k: int = 5):
    """Per-group top-k (K-family): the k longest docs of every source,
    deterministic tie-break by doc_id.  Distributed shape: per-block partial
    top-k per source (mergeable — the global top-k of a group is within the
    union of per-block top-ks), tiny driver merge over <= n_sources x k x
    n_blocks rows.  No shuffle of the table.

    Partitioning assumption: group cardinality (n_sources) is small enough
    that the partial-top-k union fits on the driver; at huge group
    cardinality the merge becomes one sorted_aggregate-style shuffle of the
    (already k-per-group-per-block-bounded) partials instead."""
    import ray

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        src = np.asarray(b.column("source").to_pylist(), dtype=object)
        order = np.lexsort((ids, -nch, src))  # (source asc, n_chars desc, id)
        s_s, i_s, n_s = src[order], ids[order], nch[order]
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        ends = np.r_[starts[1:], len(s_s)]
        keep = np.concatenate(
            [np.arange(a, min(a + k, e)) for a, e in zip(starts, ends)]
        ) if len(starts) else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "source": pa.array(s_s[keep].tolist(), type=pa.string()),
                "doc_id": pa.array(i_s[keep], type=pa.int64()),
                "n_chars": pa.array(n_s[keep], type=pa.int64()),
            }
        )

    parts = [t for t in ray.get(map_blocks(partial, ds)) if t.num_rows]
    if not parts:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
            }
        )
    m = pa.concat_tables(parts)
    src = np.asarray(m.column("source").to_pylist(), dtype=object)
    ids = m.column("doc_id").to_numpy(zero_copy_only=False)
    nch = m.column("n_chars").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -nch, src))
    s_s, i_s, n_s = src[order], ids[order], nch[order]
    starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
    ends = np.r_[starts[1:], len(s_s)]
    keep = np.concatenate(
        [np.arange(a, min(a + k, e)) for a, e in zip(starts, ends)]
    )
    rnk = np.concatenate(
        [np.arange(1, min(k, e - a) + 1) for a, e in zip(starts, ends)]
    )
    return pa.table(
        {
            "source": pa.array(s_s[keep].tolist(), type=pa.string()),
            "doc_id": pa.array(i_s[keep], type=pa.int64()),
            "n_chars": pa.array(n_s[keep], type=pa.int64()),
            "rnk": pa.array(rnk, type=pa.int64()),
        }
    )


def q_chars_quantiles_per_lang(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)):
    """EXACT distributed per-group quantiles (discrete, lower-rank
    definition: value at 1-based rank floor((n-1)*q)+1 in ascending order) —
    no sampling, no t-digest approximation, and NO global Dataset.sort.

    n_chars is a bounded-cardinality integer, so the scale shape is a
    counting histogram: per-block acero partial counts of (lang, n_chars)
    (the combiner — shrinks the data to langs x distinct-lengths before any
    shuffle) -> one small sorted aggregation -> driver rank-select over the
    per-lang cumulative counts.  Rank-exact by construction; the oracle
    mirrors the rank definition verbatim with row_number()."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        gt = b.group_by(["lang", "n_chars"], use_threads=False).aggregate(
            [("n_chars", "count")]
        )
        return pa.table(
            {
                "lang": gt.column("lang"),
                "n_chars": gt.column("n_chars"),
                "cnt": gt.column("n_chars_count").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")
    hist = sorted_aggregate(
        partials, ["lang", "n_chars"], {"cnt": ("cnt", "sum")},
        empty_types=dict(lang=pa.string(), n_chars=pa.int64(), cnt=pa.int64()),
    )
    # the histogram is tiny (langs x distinct lengths): rank-select on driver
    tables = [
        t
        for t in ray.get(hist.materialize().to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    rows = []
    if tables:
        t = pa.concat_tables(tables)
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        vals = t.column("n_chars").to_numpy(zero_copy_only=False)
        cnts = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, langs))
        langs, vals, cnts = langs[order], vals[order], cnts[order]
        starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]])
        ends = np.r_[starts[1:], len(langs)]
        for a, e in zip(starts, ends):
            cum = np.cumsum(cnts[a:e])
            n = int(cum[-1])
            for q in qs:
                rank = int(np.floor((n - 1) * q)) + 1
                i = int(np.searchsorted(cum, rank, side="left"))
                rows.append((langs[a], q, int(vals[a + i])))
    rows.sort()
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], type=pa.string()),
            "q": pa.array([r[1] for r in rows], type=pa.float64()),
            "n_chars_q": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def q_source_overlap(sf_dir: str, *, _broadcast_row_gate: int | None = None):
    """Cross-source contamination matrix — a training-data-pipeline staple:
    how many near-duplicate pairs exist between each (unordered) pair of
    corpus sources.  Composes the flagship oracle pipeline (the memoised
    word-3-gram verified pairs) with a broadcast doc->source lookup and one
    tiny sorted aggregation; DuckDB reproduces it from the identical
    near-pair CTE joined back to documents."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    pairs = q_near_dup_pairs_oracle(sf_dir)

    src = _read_mat(sf_dir, "documents", columns=["doc_id", "source"])
    cfg = DedupConfig()
    n_docs = src.count()  # materialised: metadata only
    src_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, src)))

    def pair_doc_ids(batch: pa.Table) -> pa.Table:
        # urls are doc://%08d — the numeric suffix IS the doc_id
        da = np.array(
            [int(u[-8:]) for u in batch.column("url_a").to_pylist()], dtype=np.int64
        )
        db = np.array(
            [int(u[-8:]) for u in batch.column("url_b").to_pylist()], dtype=np.int64
        )
        return pa.table(
            {"da": pa.array(da, type=pa.int64()), "db": pa.array(db, type=pa.int64())}
        )

    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    if n_docs <= row_gate and src_bytes <= cfg.broadcast_bytes_limit:
        # broadcast LUT (row- AND byte-gated like every other broadcast)
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("doc_id").to_numpy(zero_copy_only=False),
                    np.asarray(b.column("source").to_pylist(), dtype=object),
                ),
                src,
            )
        )
        ids = (
            np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        )
        srcs = (
            np.concatenate([p[1] for p in parts])
            if parts
            else np.empty(0, dtype=object)
        )
        order = np.argsort(ids, kind="stable")
        lut_ref = ray.put((ids[order], srcs[order]))

        def annotate(batch: pa.Table) -> pa.Table:
            ids_s, src_s = ray.get(lut_ref)
            t = pair_doc_ids(batch)
            da = t.column("da").to_numpy(zero_copy_only=False)
            db = t.column("db").to_numpy(zero_copy_only=False)
            if len(ids_s) == 0 or len(da) == 0:
                s = pa.array([], type=pa.string())
                return pa.table({"source_a": s, "source_b": s})
            sa = src_s[np.searchsorted(ids_s, da)]
            sb = src_s[np.searchsorted(ids_s, db)]
            lo = np.minimum(sa, sb)
            hi = np.maximum(sa, sb)
            return pa.table(
                {
                    "source_a": pa.array(lo.tolist(), type=pa.string()),
                    "source_b": pa.array(hi.tolist(), type=pa.string()),
                }
            )

        keyed = pairs.map_batches(annotate, batch_format="pyarrow")
    else:
        # 100-TB path: hash-join the (tiny) pair table against the slim docs
        # projection on each side, then canonicalise the source pair
        ids_ds = pairs.map_batches(pair_doc_ids, batch_format="pyarrow")
        a_side = src.map_batches(
            lambda b: pa.table({"da": b.column("doc_id"), "src_a": b.column("source")}),
            batch_format="pyarrow",
        )
        b_side = src.map_batches(
            lambda b: pa.table({"db": b.column("doc_id"), "src_b": b.column("source")}),
            batch_format="pyarrow",
        )
        joined = ids_ds.join(
            a_side, "inner", num_partitions=cfg.join_partitions(), on=("da",)
        ).join(b_side, "inner", num_partitions=cfg.join_partitions(), on=("db",))

        def canon(batch: pa.Table) -> pa.Table:
            sa = np.asarray(batch.column("src_a").to_pylist(), dtype=object)
            sb = np.asarray(batch.column("src_b").to_pylist(), dtype=object)
            if len(sa) == 0:
                s = pa.array([], type=pa.string())
                return pa.table({"source_a": s, "source_b": s})
            return pa.table(
                {
                    "source_a": pa.array(np.minimum(sa, sb).tolist(), type=pa.string()),
                    "source_b": pa.array(np.maximum(sa, sb).tolist(), type=pa.string()),
                }
            )

        keyed = joined.map_batches(canon, batch_format="pyarrow")
    return sorted_aggregate(
        keyed, ["source_a", "source_b"], {"n_pairs": ("source_a", "count")},
        empty_types=dict(
            source_a=pa.string(), source_b=pa.string(), n_pairs=pa.int64()
        ),
    )


def q_multimodal_bytes(sf_dir: str):
    """The SQL-checkable slice of the multimodal feature extraction: payload
    byte counts through the same actor-pool extractor (features themselves
    are model outputs, rows-only)."""
    from ..functions.multimodal import extract_features

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array([t.encode() for t in texts], type=pa.large_binary()),
            }
        )

    feats = extract_features(ds.map_batches(to_payload, batch_format="pyarrow"))
    return feats.select_columns(["doc_id", "n_bytes"])


def q_events_hourly(sf_dir: str):
    """Streaming-shaped analogue: tumbling 1h window per user (count +
    distinct event types).  Batch semantics (SURVEY.md §2.9).

    Vectorized: window as int64 epoch-micros (floor to hour), n_events via
    one sorted aggregation, n_types via distinct-(user,window,type) rows
    then a second count — no per-group Python."""
    from ..stages.groupagg import sorted_aggregate
    from ..util import heal

    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    HOUR = 3_600_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // HOUR) * HOUR
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "w": pa.array(w, type=pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    rows = ds.map_batches(add_window, batch_format="pyarrow")
    # one sort of the full event table (per-(user, window, type) counts),
    # then a second tiny aggregate over the distinct triples computes BOTH
    # outputs — n_events = sum of per-type counts, n_types = triple count —
    # replacing the previous two full-table sorts + hash join (4+ executions)
    per_type = sorted_aggregate(
        rows, ["user_id", "w", "event_type"], {"cnt": ("w", "count")}
    )
    joined = sorted_aggregate(
        per_type,
        ["user_id", "w"],
        {"n_events": ("cnt", "sum"), "n_types": ("cnt", "count")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_start": batch.column("w").cast(pa.timestamp("us")),
                "n_events": batch.column("n_events"),
                "n_types": batch.column("n_types"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Brute-force cosine top-k over the embeddings table: queries = vec_id <
    n_queries (scale path: per-batch partial top-k against a broadcast query
    matrix, merged on the driver — the query side is small by construction)."""
    import ray

    ds = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    q_ids = np.array([r["vec_id"] for r in qt])
    q_mat = np.array([r["embedding"] for r in qt], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_ref = ray.put((q_ids, q_mat, q_norm))

    # plain tasks, not an actor pool: the only "state" is a ray.get of the
    # broadcast ref (a zero-copy plasma read per task); actor startup costs
    # seconds and dominated this query's wall time on small inputs.
    def partial_topk(batch: pa.Table) -> pa.Table:
        from ..functions.embed import _emb_matrix

        q_ids, q_mat, q_norm = ray.get(q_ref)
        ids, emb = _emb_matrix(batch)  # zero-copy list-values view
        norms = np.linalg.norm(emb, axis=1)
        sims = (emb @ q_mat.T) / (norms[:, None] * q_norm[None, :])
        out_q, out_n, out_s = [], [], []
        for j, q in enumerate(q_ids):
            s = sims[:, j].copy()
            s[ids == q] = -np.inf
            top = np.argsort(-s, kind="stable")[: k]
            out_q.extend([q] * len(top))
            out_n.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    t = partials.take_all()  # tiny: n_queries * k per block
    rows = {}
    for r in t:
        rows.setdefault(r["query_id"], []).append((r["sim"], r["neighbor_id"]))
    out_q, out_n, out_r = [], [], []
    for q, lst in rows.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, n) in enumerate(lst[:k], 1):
            out_q.append(q)
            out_n.append(n)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rnk": pa.array(out_r, type=pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# Rows-only pipelines (non-SQL-expressible)
# --------------------------------------------------------------------------


def q_near_dup_pairs(sf_dir: str):
    """Flagship near-dedup (char-17 shingles, DF band, containment 0.2) over
    the documents table; verified pair rows."""

    cfg = DedupConfig(num_partitions=16, min_doc_len=10, end_buffer=50, alignment_max_gap=50)
    r = _pipeline_verified(sf_dir, cfg)
    return r["verified"].select_columns(
        ["url_a", "url_b", "common", "n_dup_postings_a", "n_dup_postings_b"]
    )


def q_near_dup_clusters(sf_dir: str):
    """Flagship A10 clustering (char-17 config) with components relabelled
    by their minimum url — the same canonical labels DuckDB's recursive
    min-label CC produces, which turns the production clustering stage
    (stages/cluster.py, uid-space union-find / label propagation) into an
    oracle-green row.  The relabel is fully distributed: one hash join
    attaches urls (uid = hash(url), ingest-computed), one sorted aggregate
    takes each component's min url, one join broadcasts it back."""
    from ..stages.groupagg import sorted_aggregate

    cfg = DedupConfig(num_partitions=16, min_doc_len=10, end_buffer=50, alignment_max_gap=50)
    r = _pipeline_verified(sf_dir, cfg)
    clusters = r["clusters"]  # (uid, cluster_id) — production output

    m = documents_as_docs(sf_dir).map_batches(
        lambda b: pa.table({"uid": b.column("uid"), "url": b.column("url")}),
        batch_format="pyarrow",
    )
    nparts = cfg.join_partitions()
    withurl = clusters.join(m, "inner", num_partitions=nparts, on=("uid",))
    roots = sorted_aggregate(
        withurl.select_columns(["cluster_id", "url"]),
        ["cluster_id"],
        {"cluster_url": ("url", "min")},
        empty_types=dict(cluster_id=pa.int64(), cluster_url=pa.string()),
    )
    out = withurl.select_columns(["cluster_id", "url"]).join(
        roots, "inner", num_partitions=nparts, on=("cluster_id",)
    )
    return out.select_columns(["url", "cluster_url"])


def q_near_dup_clusters_oracle(sf_dir: str):
    """Flagship A10 under the word-3-gram oracle config: connected components
    over the verified near-dup pairs PLUS the exact-dup edges, relabelled by
    the component's minimum url (lexicographic == numeric doc order for the
    zero-padded ``doc://`` urls) so DuckDB's recursive min-label propagation
    reproduces the table exactly.  Oracle-checks the whole flagship chain
    end-to-end: exact dedup -> DF band -> candidates -> V1 -> clustering."""
    import ray

    from ..util import map_blocks

    cfg = DedupConfig(
        num_partitions=16, tokenizer="word", word_ngram=3,
        min_doc_len=10, end_buffer=50, alignment_max_gap=50,
    )
    r = _pipeline_verified(sf_dir, cfg)

    def vedges(b: pa.Table):
        return (
            b.column("url_a").to_numpy(zero_copy_only=False),
            b.column("url_b").to_numpy(zero_copy_only=False),
        )

    def eedges(b: pa.Table):
        return (
            b.column("url").to_numpy(zero_copy_only=False),
            b.column("winner_url").to_numpy(zero_copy_only=False),
        )

    parts = ray.get(
        map_blocks(vedges, r["verified"]) + map_blocks(eedges, r["exact_edges"])
    )
    parts = [p for p in parts if len(p[0])]
    empty = pa.table(
        {"url": pa.array([], pa.string()), "cluster_url": pa.array([], pa.string())}
    )
    if not parts:
        return empty
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    # np.unique sorts, so index order == lexicographic url order; the
    # union-find keeps the smaller root, so each root IS the min url.
    urls, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(urls))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ia.tolist(), ib.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(urls))])
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "cluster_url": pa.array(urls[roots], type=pa.string()),
        }
    )


def q_doc_stats_oracle(sf_dir: str):
    """S5/A6 under the word-3-gram oracle config: per-survivor posting sums
    from the REAL classified-postings table (doc_stats operator), plus the
    total gram count, keyed by url — everything SQL can recompute."""
    import ray

    from ..stages.output import doc_stats
    from ..util import map_blocks

    cfg = DedupConfig(
        num_partitions=16, tokenizer="word", word_ngram=3,
        min_doc_len=10, end_buffer=50, alignment_max_gap=50,
    )
    r = _pipeline_verified(sf_dir, cfg)
    stats = doc_stats(r["matched"], cfg)

    def cols(b: pa.Table):
        return (
            b.column("uid").to_numpy(zero_copy_only=False),
            b.column("n_multi_postings").to_numpy(zero_copy_only=False),
            b.column("n_dup_postings").to_numpy(zero_copy_only=False),
        )

    parts = [p for p in ray.get(map_blocks(cols, stats)) if len(p[0])]
    if parts:
        uids = np.concatenate([p[0] for p in parts])
        order = np.argsort(uids, kind="stable")
        lut = (
            uids[order],
            np.concatenate([p[1] for p in parts])[order],
            np.concatenate([p[2] for p in parts])[order],
        )
    else:
        z = np.empty(0, dtype=np.int64)
        lut = (z, z, z)
    lut_ref = ray.put(lut)
    n = cfg.word_ngram

    def annotate(batch: pa.Table) -> pa.Table:
        keys, nm, nd = ray.get(lut_ref)
        # n_words = spaces + 1, vectorised; postings = max(words - (n-1), 0)
        n_words = (
            pc.count_substring(batch.column("text"), " ")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            + 1
        )
        n_post = np.maximum(n_words - (n - 1), 0)
        u = batch.column("uid").to_numpy(zero_copy_only=False)
        if len(keys):
            idx = np.minimum(np.searchsorted(keys, u), len(keys) - 1)
            hit = keys[idx] == u
            multi = np.where(hit, nm[idx], 0)
            dup = np.where(hit, nd[idx], 0)
        else:
            multi = dup = np.zeros(len(u), dtype=np.int64)
        return pa.table(
            {
                "url": batch.column("url"),
                "n_postings": pa.array(n_post),
                "n_multi_postings": pa.array(multi.astype(np.int64)),
                "n_dup_postings": pa.array(dup.astype(np.int64)),
            }
        )

    return r["survivors"].map_batches(annotate, batch_format="pyarrow")


def q_minhash_signatures(sf_dir: str):
    """T1 as a standalone operator: 16-perm MinHash over each doc's full
    shingle set (df band disabled so every shingle participates).  Keyed by
    uid := doc_id so the DuckDB face (sqlhash.minhash_signatures_select,
    which replays the rolling-hash + splitmix permutations bitwise) needs no
    join back through the engine's blake2b url ids."""
    from ..stages.df import classify_pairs, df_multi, df_table
    from ..stages.minhash import signatures
    from ..stages.shingle import make_shingle_pairs
    from ..util import heal

    cfg = DedupConfig(num_perm=16, num_partitions=16, duplicate_df_lower=1,
                      duplicate_df_upper=1 << 62)
    base = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def adapt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uid": batch.column("doc_id").cast(pa.int64()),
                "text": batch.column("text").cast(pa.large_string()),
            }
        )

    docs = base.map_batches(adapt, batch_format="pyarrow")
    pairs = make_shingle_pairs(docs, cfg)

    # df band disabled: annotate ALL shingles with df (including df==1)
    from ..stages.groupagg import sorted_aggregate
    from ..stages.shingle import df_partials_batch

    df = sorted_aggregate(
        pairs.map_batches(df_partials_batch, batch_format="pyarrow"),
        ["shingle"],
        {"df": ("n", "sum")},
        empty_types=dict(shingle=pa.int64(), df=pa.int64()),
    )
    matched = heal(
        classify_pairs(pairs, df, cfg),
        shingle=pa.int64(), uid=pa.int64(), tf=pa.int32(), df=pa.int64(),
    )
    return signatures(matched, cfg)


def q_simhash(sf_dir: str):
    from ..functions.simhash import simhash_docs

    return simhash_docs(documents_as_docs(sf_dir), k=5)


def q_fingerprints(sf_dir: str):
    from ..functions.text import fingerprint_docs

    return fingerprint_docs(documents_as_docs(sf_dir), window=16)


def q_fingerprints_oracle(sf_dir: str, w: int = 4):
    """Winnowing document fingerprints with an oracle-computable gram hash:
    md5 hex of each word-3-gram (hashlib.md5 == DuckDB md5), window-min over
    every full window of ``w`` consecutive grams, distinct per doc.  Ties
    need no breaking because only the distinct (doc_id, fp) set is emitted.

    Oracle fixture, not the scale path: per-gram ``hashlib.md5`` is the
    DuckDB contract; production fingerprints use the vectorized winnowing
    over splitmix hashes (``functions/text.py``)."""
    import hashlib

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d_out: list = []
        f_out: list = []
        for i, t in zip(ids, texts):
            wds = t.split(" ")
            grams = [" ".join(wds[j : j + 3]) for j in range(len(wds) - 2)]
            if len(grams) < w:
                continue
            hs = np.array(
                [hashlib.md5(g.encode()).hexdigest() for g in grams]
            )
            m = hs[: len(hs) - w + 1].copy()
            for s in range(1, w):
                nxt = hs[s : s + len(m)]
                np.copyto(m, nxt, where=nxt < m)
            fps = np.unique(m)
            d_out.extend([i] * len(fps))
            f_out.extend(fps.tolist())
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "fp": pa.array(f_out, type=pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


_MD5_MH_CACHE: dict = {}


def _md5_minhash_table(sf_dir: str, n_perm: int = 8):
    """One row per doc: (doc_id, '|'-joined md5 minhash per permutation).

    Oracle FIXTURE, not the scale path: per-gram ``hashlib.md5`` is the
    contract with DuckDB's ``md5()`` — the production minhash is the
    vectorized splitmix family (``stages/minhash.py``).  Memoised and
    materialised per Ray job so the md5 pass runs once per session even
    when both the signature and the banding oracle queries consume it."""
    import hashlib

    import ray

    try:
        job = ray.get_runtime_context().get_job_id()
    except Exception:
        job = None
    key = (job, sf_dir, n_perm)
    if key in _MD5_MH_CACHE:
        return _MD5_MH_CACHE[key]

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d_out: list = []
        s_out: list = []
        for i, t in zip(ids, texts):
            wds = t.split(" ")
            grams = {
                " ".join(wds[j : j + 3]) for j in range(len(wds) - 2)
            }
            if not grams:
                continue
            d_out.append(i)
            s_out.append(
                "|".join(
                    min(
                        hashlib.md5(f"{p}|".encode() + g.encode()).hexdigest()
                        for g in grams
                    )
                    for p in range(n_perm)
                )
            )
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "sig": pa.array(s_out, type=pa.string()),
            }
        )

    _MD5_MH_CACHE[key] = ds.map_batches(sig, batch_format="pyarrow").materialize()
    return _MD5_MH_CACHE[key]


def q_minhash_oracle(sf_dir: str, n_perm: int = 8):
    """T1 with an oracle-computable hash family: per permutation p, the
    signature is min over the doc's word-3-grams of md5(p || '|' || gram) —
    pure min-over-hashed-set semantics DuckDB reproduces verbatim.

    Oracle fixture, not the scale path (see :func:`_md5_minhash_table`)."""

    sigs = _md5_minhash_table(sf_dir, n_perm)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        joined = batch.column("sig").to_pylist()
        d_out: list = []
        p_out: list = []
        h_out: list = []
        for i, s in zip(ids, joined):
            for p, h in enumerate(s.split("|")):
                d_out.append(i)
                p_out.append(p)
                h_out.append(h)
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "perm": pa.array(p_out, type=pa.int64()),
                "minhash": pa.array(h_out, type=pa.string()),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def q_simhash_oracle(sf_dir: str, bits: int = 60):
    """SimHash with an oracle-computable token hash: 60-bit value from the
    md5 hex prefix (int(hex[:15], 16) == DuckDB ('0x'||substr(md5,1,15))::
    BIGINT), one vote per token occurrence, bit set iff the vote sum is
    positive.  Emitted as (doc_id, bit, bit_val) rows so SQL needs no 64-bit
    sign gymnastics.

    Oracle fixture, not the scale path: per-token ``hashlib.md5`` is the
    DuckDB contract; production simhash is vectorized
    (``functions/simhash.py``)."""
    import hashlib

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    shifts = np.arange(bits, dtype=np.int64)

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d_out: list = []
        b_out: list = []
        v_out: list = []
        for i, t in zip(ids, texts):
            toks = t.split(" ")
            if not toks:
                continue
            hv = np.array(
                [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in toks],
                dtype=np.int64,
            )
            votes = (((hv[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
            d_out.extend([i] * bits)
            b_out.extend(shifts.tolist())
            v_out.extend((votes > 0).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "bit": pa.array(b_out, type=pa.int64()),
                "bit_val": pa.array(v_out, type=pa.int64()),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    from ..functions.text import lang_id_docs

    return lang_id_docs(_read_mat(sf_dir, "documents", columns=["doc_id", "text", "lang"]))


def q_quality(sf_dir: str):
    from ..functions.text import quality_docs

    return quality_docs(_read_mat(sf_dir, "documents", columns=["doc_id", "text"]))


def q_bpe_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer counts (letter runs | digit runs | single other
    symbols — the GPT-2 pre-tokenizer shape without lookahead), vectorised
    over one codepoint array per batch; DuckDB reproduces the count with
    regexp_extract_all over the identical RE2 pattern."""
    from ..functions.text import bpe_token_count_docs

    return bpe_token_count_docs(
        _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    )


# per-language sampling rates for q_stratified_sample; the ORACLE_SQL CASE
# is generated from this dict so the two sides cannot drift.  Unlisted
# languages use _SAMPLE_DEFAULT_RATE.
SAMPLE_RATES = {"de": 0.5, "en": 0.15, "es": 0.4, "fr": 0.3}
_SAMPLE_DEFAULT_RATE = 0.25


def _rate_hex(rate: float) -> str:
    """First-6-hex-chars threshold for a Bernoulli rate: a doc is kept iff
    substr(md5(doc_id), 1, 6) < this string.  Lowercase-hex string order ==
    numeric order, so BOTH sides compare strings — no integer parsing."""
    return format(int(rate * 16**6), "06x")


_TWO63 = 9223372036854775808.0  # 2^63, exact as a double


def _rate_thr63(rate: float) -> int:
    """Integer threshold for a Bernoulli rate over the 63-bit splitmix key
    space: keep iff splitmix63(doc_id) < floor(rate * 2^63) — ONE IEEE
    multiply + floor, embedded as an integer literal in the SQL face so no
    float is ever replayed."""
    import math

    return int(math.floor(rate * _TWO63))


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language Bernoulli sampling (corpus mixing): keep a
    doc iff splitmix64(doc_id) masked to 63 bits falls below the language's
    rate threshold.  Hash-keyed sampling is reproducible across runs and
    machines and needs no shuffle, state, or RNG coordination — the standard
    web-pipeline downsampling shape.  PRODUCTION path: the key is the
    engine's vectorised splitmix64 finalizer (hashing.splitmix64 — no
    per-row Python hashing anywhere), and the DuckDB face replays it bitwise
    via sqlhash.sm64_ctes, so the production sample itself is
    driver-certifiable; the md5-keyed variant survives as
    q_stratified_sample_oracle (fixture)."""
    from ..hashing import MASK63, splitmix64

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "lang"])
    langs = sorted(SAMPLE_RATES)
    thr_np = np.array(
        [_rate_thr63(SAMPLE_RATES[l]) for l in langs]
        + [_rate_thr63(_SAMPLE_DEFAULT_RATE)],
        dtype=np.int64,
    )
    lang_arr = pa.array(langs, type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = (splitmix64(ids.astype(np.uint64)) & MASK63).astype(np.int64)
        idx = (
            pc.index_in(batch.column("lang"), value_set=lang_arr)
            .fill_null(len(langs))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array(h < thr_np[idx]))

    return ds.map_batches(fn, batch_format="pyarrow")


def q_stratified_sample_oracle(sf_dir: str):
    """md5-keyed fixture twin of q_stratified_sample (``hashlib.md5`` is the
    contract with DuckDB's ``md5()``): same rates, same semantics, per-row
    Python hashing — kept ONLY as an independent second face of the sampling
    math, never the scale path."""
    import hashlib

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "lang"])
    thr = {l: _rate_hex(r) for l, r in SAMPLE_RATES.items()}
    default = _rate_hex(_SAMPLE_DEFAULT_RATE)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest()[:6] < thr.get(l, default)
            for i, l in zip(ids, langs)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def q_token_budget_select(sf_dir: str):
    """Quality-ordered token-budget selection: rank docs by mean token
    length (desc, doc_id tie-break) and keep the prefix whose running token
    total stays within 25% of the corpus total — the budget-bounded corpus
    selection step a training-data pipeline ends with.  Built on
    stages.scan.ordered_prefix_scan (range-partitioned distributed scan:
    per-partition sort + cumsum; the driver sees only P splitters and P
    partition totals, never rows)."""
    import pyarrow.compute as pc

    from ..stages.scan import ordered_prefix_scan

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def feat(batch: pa.Table) -> pa.Table:
        t = batch.column("text")
        nt = (
            pc.count_substring(t, " ").cast(pa.int64()).to_numpy(zero_copy_only=False)
            + 1
        )
        nc = (
            pc.utf8_length(t).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(nt),
                "s": pa.array(nc / nt),
            }
        )

    feats = ds.map_batches(feat, batch_format="pyarrow")
    scanned, total = ordered_prefix_scan(
        feats, ["s", "doc_id"], "n_tokens",
        descending=[True, False], cum_col="cum_tokens",
    )
    budget = int(0.25 * total)  # 0.25 is exact in binary: floor == int()
    return scanned.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("cum_tokens"), budget)).select(
            ["doc_id", "n_tokens", "cum_tokens"]
        ),
        batch_format="pyarrow",
    )


def q_minhash_lsh_pairs(sf_dir: str):
    """The probabilistic MinHash-LSH candidate path (T1+T2+J4) end-to-end
    over documents: verified pairs found via banding (rows-only — the
    banding pre-filter is probabilistic by design)."""

    cfg = DedupConfig(
        num_partitions=16, min_doc_len=10, end_buffer=50, alignment_max_gap=50,
        candidate_strategy="minhash_lsh",
    )
    r = _pipeline_verified(sf_dir, cfg)
    return r["verified"].select_columns(["url_a", "url_b", "common"])


def q_simhash_candidates(sf_dir: str):
    """SimHash rotated-prefix candidate pairs (Manku et al. style)."""
    from ..functions.simhash import hamming_candidates, simhash_docs

    sims = simhash_docs(documents_as_docs(sf_dir), k=5)
    return hamming_candidates(sims, prefix_bits=16)


def q_embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs (brute-force baseline; see
    functions.embed.ivf_topk for the bucketed scale path)."""
    from ..functions.embed import cosine_dup_pairs

    return cosine_dup_pairs(_read_mat(sf_dir, "embeddings"), threshold=threshold)


def q_embedding_lsh_pairs(sf_dir: str, threshold: float = 0.4):
    """Hyperplane-LSH bucketed embedding near-dup pairs (the 100-TB scale
    path: bucket shuffle + per-bucket pair emission + exact verification of
    candidates only; recall < 1 by design, rows-only)."""
    from ..functions.embed import hyperplane_lsh_pairs

    return hyperplane_lsh_pairs(
        _read_mat(sf_dir, "embeddings"), threshold=threshold, n_tables=16, n_bits=5
    )


# One source of truth for the Rademacher-LSH oracle configuration: the Ray
# call AND the SQL registration both read these, so a fixture-dimension or
# cap change desynchronises loudly (shape error) instead of silently.
_ELSH_ORACLE = dict(n_tables=16, n_bits=5, dim=64, quant=1024, bucket_cap=1024)


def q_embedding_lsh_pairs_oracle(sf_dir: str, threshold: float = 0.4):
    """Oracle-checkable face of hyperplane LSH: splitmix64-derived ±1
    (Rademacher) plane entries over integer-quantised vectors make every
    projection exact int64 arithmetic, so DuckDB replays the bucket
    assignment — and therefore the full candidate set — bitwise
    (pipelines/sqlhash.rademacher_lsh_select), then verifies candidates with
    the same cosine threshold as the green embedding_dup_pairs oracle.  The
    gaussian-plane production variant stays registered as
    embedding_lsh_pairs (rows-only).  dim/quant/bucket_cap come from
    _ELSH_ORACLE, the same constants the SQL face is generated from."""
    from ..functions.embed import hyperplane_lsh_pairs

    return hyperplane_lsh_pairs(
        _read_mat(sf_dir, "embeddings"), threshold=threshold,
        plane_kind="rademacher", **_ELSH_ORACLE,
    )


def q_ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate ANN (rows-only; approximate by design)."""
    from ..functions.embed import ivf_topk

    return ivf_topk(_read_mat(sf_dir, "embeddings"), n_queries=10, k=5)


def q_multimodal_features(sf_dir: str):
    """Binary-payload feature extraction plumbing (deterministic fake
    decoder; real codecs are stubbed — functions.multimodal)."""
    from ..functions.multimodal import extract_features

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array([t.encode() for t in texts], type=pa.large_binary()),
            }
        )

    return extract_features(ds.map_batches(to_payload, batch_format="pyarrow"))


def q_multimodal_features_oracle(sf_dir: str):
    """Decode-arithmetic face of the binary feature-extraction stage (the
    fake-decoder q_multimodal_features stays rows-only — blake2b has no SQL
    replay): deterministic P6 payloads with doc-varying dims (the
    multimodal_decode_meta construction), STRICT header-parsing decode, and
    an INTEGER feature vector — width/height/channels from the parsed
    header, px_sum/px_min/px_max over the decoded bytes, mean_px as ONE
    double division, and an 8-bin histogram with exact integer bin edges
    (bin = byte >> 5).  DuckDB recomputes every feature from the text bytes
    via to_hex surgery, so a header-parse, pixel-offset or binning bug
    breaks the value hash."""
    from ..functions.multimodal import decode_ppm

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        cols: dict[str, list] = {
            k: []
            for k in ("width", "height", "channels", "px_sum", "px_min",
                      "px_max", "mean_px")
        }
        bins = [[] for _ in range(8)]
        for i, t in zip(ids.tolist(), texts):
            w = 4 + i % 5
            h = 3 + i % 4
            header = f"P6\n{w} {h}\n255\n".encode()
            payload = header + t.encode()[: w * h * 3].ljust(w * h * 3, b"\0")
            px, dw, dh, dch = decode_ppm(payload)
            px = np.asarray(px, dtype=np.int64)
            npx = dw * dh * dch
            cols["width"].append(dw)
            cols["height"].append(dh)
            cols["channels"].append(dch)
            cols["px_sum"].append(int(px.sum()))
            cols["px_min"].append(int(px.min()))
            cols["px_max"].append(int(px.max()))
            cols["mean_px"].append(np.float64(px.sum()) / np.float64(npx))
            hist = np.bincount(px >> 5, minlength=8)
            for b in range(8):
                bins[b].append(int(hist[b]))
        out = {"doc_id": pa.array(ids, type=pa.int64())}
        for k in ("width", "height", "channels", "px_sum", "px_min", "px_max"):
            out[k] = pa.array(cols[k], type=pa.int64())
        out["mean_px"] = pa.array(cols["mean_px"], type=pa.float64())
        for b in range(8):
            out[f"b{b}"] = pa.array(bins[b], type=pa.int64())
        return pa.table(out)

    return ds.map_batches(
        feats, batch_format="pyarrow", batch_size=64
    ).sort("doc_id")


def q_multimodal_decode(sf_dir: str):
    """REAL pure-python decode path (strict): deterministic P6 PPM payloads
    generated from each doc's text bytes, decoded by the actor-pool extractor
    into (doc_id, n_bytes, features) with width/height/channel + pixel-stat
    features.  Rows-only (feature vectors are model outputs)."""
    from ..functions.multimodal import extract_features

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    W, H = 8, 6

    def to_ppm(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        header = f"P6\n{W} {H}\n255\n".encode()
        payloads = [
            header + t.encode()[: W * H * 3].ljust(W * H * 3, b"\0") for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return extract_features(
        ds.map_batches(to_ppm, batch_format="pyarrow"), decoder="strict"
    )


class _PpmDecodeMeta:
    """Actor stage for q_multimodal_decode_meta: build a doc-varying P6 PPM
    payload from the text bytes, run the REAL strict decoder, and emit the
    SQL-recomputable scalars (header dims must come from parsing the payload,
    not from the generator)."""

    def __init__(self):
        from ..functions.multimodal import decode_ppm

        self._decode = decode_ppm

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n_bytes, widths, heights, chans, sums = [], [], [], [], []
        for i, t in zip(ids.tolist(), texts):
            w = 4 + i % 5
            h = 3 + i % 4
            header = f"P6\n{w} {h}\n255\n".encode()
            payload = header + t.encode()[: w * h * 3].ljust(w * h * 3, b"\0")
            px, dw, dh, dch = self._decode(payload)
            n_bytes.append(len(payload))
            widths.append(dw)
            heights.append(dh)
            chans.append(dch)
            sums.append(int(px.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
                "channels": pa.array(chans, type=pa.int64()),
                "px_sum": pa.array(sums, type=pa.int64()),
            }
        )


def q_multimodal_decode_meta(sf_dir: str):
    """SQL-checkable face of the strict PPM decoder: per-doc payloads with
    doc-varying dimensions (w = 4 + id%5, h = 3 + id%4); width/height/
    channels come from the decoder PARSING the header, n_bytes/px_sum from
    the decoded byte stream — DuckDB recomputes all five from the text bytes
    (to_hex surgery), so a header-parse or pixel-offset bug breaks the hash.
    """
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        _PpmDecodeMeta, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    ).sort("doc_id")


def q_exact_substring_spans(
    sf_dir: str, min_len: int = 40, k: int = 16, bucket_cap: int = 64,
    *, _sorted: bool = True,
):
    """Suffix-array exact-substring duplicate spans — the ExactSubstr
    construction of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), re-expressing the reference's minimap2
    homologous-interval discovery (/root/reference/dedup/dedup.py:437) for
    web text.  Rows-only (maximal-common-substring spans are not
    SQL-expressible at reasonable cost); exactness is pinned by
    tests/test_substr.py against brute force.

    Shape: winnowing fingerprints (window = min_len - k + 1 => any shared
    verbatim substring of length >= min_len shares a selected fingerprint,
    so candidate recall is 1.0 up to the hot-bucket cap) -> sorted-bucket
    candidate pairs -> per-pair suffix-array span verification (exact, all
    numpy) inside map_batches.  Texts are broadcast under the byte gate and
    attached via two hash joins above it (the align-stage pattern).
    """
    import ray

    from ..hashing import shingle_hashes
    from ..stages.bucketjoin import pairs_by_key
    from ..stages.substr import common_substring_spans, winnow_fingerprints
    from ..util import heal, map_blocks

    window = min_len - k + 1
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        f_parts, d_parts = [], []
        for i, t in zip(ids, texts):
            sel = winnow_fingerprints(shingle_hashes(t, k), window)
            if len(sel) == 0:
                continue
            f_parts.append(sel)
            d_parts.append(np.full(len(sel), i, dtype=np.int64))
        f = np.concatenate(f_parts) if f_parts else np.empty(0, dtype=np.int64)
        d = np.concatenate(d_parts) if d_parts else np.empty(0, dtype=np.int64)
        return pa.table({"fp": pa.array(f), "doc_id": pa.array(d)})

    fp_ds = heal(
        docs.map_batches(fps, batch_format="pyarrow"), fp=pa.int64(), doc_id=pa.int64()
    )
    pairs = pairs_by_key(fp_ds, "fp", "doc_id", bucket_cap=bucket_cap)

    with_texts = _pairs_with_texts(pairs, docs)

    def spans(batch: pa.Table) -> pa.Table:
        from ..stages.spans import sort_state
        from ..stages.substr import seeded_common_spans

        da_out, db_out, sd_out, st_out, en_out = [], [], [], [], []
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # per-batch doc cache: a doc appears in many candidate pairs; its
        # k-gram hashes + sort state are computed once
        cache: dict = {}

        def doc_state(uid, text):
            if uid not in cache:
                h = shingle_hashes(text, k)
                cache[uid] = (h, sort_state(h))
            return cache[uid]

        for i in range(len(ua)):
            # fast path: strict diagonal runs over the pair's few shared
            # k-grams (char-verified); SA only for degenerate repetition or
            # a (collision-caused) failed verification — identical output
            res = None
            if min_len >= k:  # seeds are k-grams: can't see shorter spans
                h_a, pre_a = doc_state(ua[i], ta[i])
                h_b, pre_b = doc_state(ub[i], tb[i])
                res = seeded_common_spans(
                    ta[i], tb[i], min_len, k, h_a, h_b, pre_a, pre_b
                )
            if res is None:
                res = common_substring_spans(ta[i], tb[i], min_len)
            asp, bsp = res
            for doc, sp in ((ua[i], asp), (ub[i], bsp)):
                m = len(sp)
                if not m:
                    continue
                da_out.append(np.full(m, ua[i], dtype=np.int64))
                db_out.append(np.full(m, ub[i], dtype=np.int64))
                sd_out.append(np.full(m, doc, dtype=np.int64))
                st_out.append(sp[:, 0])
                en_out.append(sp[:, 1])

        def cat(parts):
            return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)

        return pa.table(
            {
                "doc_a": pa.array(cat(da_out)),
                "doc_b": pa.array(cat(db_out)),
                "span_doc": pa.array(cat(sd_out)),
                "start": pa.array(cat(st_out)),
                "end": pa.array(cat(en_out)),
            }
        )

    out = heal(
        with_texts.map_batches(spans, batch_format="pyarrow"),
        doc_a=pa.int64(), doc_b=pa.int64(), span_doc=pa.int64(),
        start=pa.int64(), end=pa.int64(),
    )
    if not _sorted:  # consumers that re-aggregate (dup_span_coverage)
        return out
    return out.sort(["doc_a", "doc_b", "span_doc", "start"])


def _attach_pair_texts(batch: pa.Table, texts_ref) -> pa.Table:
    import ray

    ids_s, texts_s = ray.get(texts_ref)
    ua = batch.column("ua").to_numpy(zero_copy_only=False)
    ub = batch.column("ub").to_numpy(zero_copy_only=False)
    if len(ids_s) == 0 or len(ua) == 0:
        return pa.table(
            {
                "ua": pa.array([], type=pa.int64()),
                "ub": pa.array([], type=pa.int64()),
                "text_a": pa.array([], type=pa.string()),
                "text_b": pa.array([], type=pa.string()),
            }
        )
    return pa.table(
        {
            "ua": pa.array(ua),
            "ub": pa.array(ub),
            "text_a": pa.array(texts_s[np.searchsorted(ids_s, ua)]),
            "text_b": pa.array(texts_s[np.searchsorted(ids_s, ub)]),
        }
    )


def _pairs_with_texts(pairs, docs):
    """Attach ``text_a``/``text_b`` to (ua, ub) pair rows.  Broadcast
    (sorted ids + texts, one plasma object) below ``broadcast_text_bytes``;
    two distributed hash joins above it — the flagship align-stage policy
    (pipelines/dedup.py).  ``docs`` must be a materialised (doc_id, text)
    dataset; extra pair columns are dropped."""
    import ray

    from ..util import map_blocks

    cfg = DedupConfig()
    pairs = pairs.map_batches(
        lambda b: b.select(["ua", "ub"]), batch_format="pyarrow"
    )
    total_bytes = sum(
        ray.get(map_blocks(lambda b: b.column("text").nbytes, docs))
    )
    if total_bytes <= cfg.broadcast_text_bytes:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("doc_id").to_numpy(zero_copy_only=False),
                    b.column("text").to_pylist(),
                ),
                docs,
            )
        )
        ids_all = (
            np.concatenate([p[0] for p in parts])
            if parts
            else np.empty(0, dtype=np.int64)
        )
        texts_all = np.array(sum((p[1] for p in parts), []), dtype=object)
        order = np.argsort(ids_all, kind="stable")
        texts_ref = ray.put((ids_all[order], texts_all[order]))
        return pairs.map_batches(
            lambda b: _attach_pair_texts(b, texts_ref), batch_format="pyarrow"
        )
    a_side = docs.map_batches(
        lambda b: pa.table({"ua": b.column("doc_id"), "text_a": b.column("text")}),
        batch_format="pyarrow",
    )
    b_side = docs.map_batches(
        lambda b: pa.table({"ub": b.column("doc_id"), "text_b": b.column("text")}),
        batch_format="pyarrow",
    )
    half = pairs.join(a_side, "inner", num_partitions=cfg.join_partitions(), on=("ua",))
    return half.join(b_side, "inner", num_partitions=cfg.join_partitions(), on=("ub",))


def _apply_interval_blob(text: str, blob: bytes):
    """Remove the (possibly overlapping, unsorted) [start, end) int64-LE
    interval pairs in ``blob`` from ``text``; returns (kept, n_removed,
    n_spans after merging)."""
    from ..stages.substr import _merge_intervals

    flat = np.frombuffer(blob, dtype=np.int64)
    ms, me = _merge_intervals(flat[0::2].copy(), flat[1::2].copy())
    parts, prev = [], 0
    for a, b in zip(ms.tolist(), me.tolist()):
        parts.append(text[prev:a])
        prev = b
    parts.append(text[prev:])
    return "".join(parts), int((me - ms).sum()), len(ms)


def q_exact_substring_spans_oracle(
    sf_dir: str, min_len: int = 40, k: int = 16, bucket_cap: int = 4096
):
    """Oracle-checkable face of the suffix-array SPAN operator itself (not
    just its pair projection): each side's merged [start, end)
    maximal-common-substring spans equal the union of matched min_len-gram
    windows — a common substring of length L >= min_len contributes exactly
    the L - min_len + 1 gram starts that tile it, so the interval union is
    identical.  DuckDB reproduces that with a winnow-fingerprint candidate
    CTE (sqlhash.winnow_candidates_ctes — the bitwise SQL face of the
    pairs_by_key bucket cap) composed with a char-gram join + the classic
    cumulative-max interval-merge window, turning the whole
    winnow -> bucket -> per-pair suffix-array path into a value-hashed
    CORRECTNESS row.  The cap here is large-but-FINITE (4096, vs the
    production query's 64): recall stays 1.0 on any corpus whose hottest
    winnow fingerprint is shared by <= 4096 docs, while a boilerplate-heavy
    corpus can no longer blow up O(d^2) — and because the SQL face mirrors
    the cap exactly, correctness holds regardless."""
    return q_exact_substring_spans(
        sf_dir, min_len=min_len, k=k, bucket_cap=bucket_cap
    )


_COVER_BIG = np.int64(1) << 40  # > any text length; segment offset for cummax


def _coverage_kernel(doc, start, end, ln):
    """(doc_ids, n_chars, covered) for span/sentinel rows sorted by
    (doc, start): per doc, n_chars = max(ln) and covered = the length of the
    interval union of its [start, end) span rows (start >= 0), computed with
    one global cummax after lifting each doc's intervals onto a disjoint
    offset (no per-doc Python loop)."""
    if len(doc) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    uniq, idx = np.unique(doc, return_inverse=True)
    # idx * _COVER_BIG must fit int64: 2^23 docs x 2^40 offset = 2^63.
    # A single sorted block holding >8.4M distinct docs would overflow the
    # segment lift silently; blocks are byte-capped far below that, so this
    # is an invariant assert, not a reachable path.
    assert len(uniq) < (1 << 23), (
        f"coverage kernel block holds {len(uniq)} distinct docs; "
        "segment offset would overflow int64"
    )
    n_chars = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(n_chars, idx, ln)
    sp = start >= 0
    covered = np.zeros(len(uniq), dtype=np.int64)
    if sp.any():
        si = start[sp] + idx[sp] * _COVER_BIG
        ei = end[sp] + idx[sp] * _COVER_BIG
        prev = np.r_[np.int64(-1), np.maximum.accumulate(ei)[:-1]]
        contrib = np.maximum(ei - np.maximum(si, prev), 0)
        np.add.at(covered, idx[sp], contrib)
    return uniq, n_chars, covered


def q_dup_span_coverage(
    sf_dir: str, min_len: int = 40, k: int = 16, bucket_cap: int = 64
):
    """Per-doc duplicated-text fraction — the headline corpus-health metric
    of the ExactSubstr paper (Lee et al. 2022, Table 2: 'fraction of tokens
    in a duplicate substring'): for every doc, the share of its characters
    covered by some verbatim >= min_len-char substring that also appears in
    another CANDIDATE doc (candidates = pairs sharing a winnow fingerprint
    whose bucket holds <= bucket_cap docs — the production hot-key guard,
    mirrored bitwise in the DuckDB face via sqlhash.winnow_candidates_ctes,
    so a boilerplate mega-bucket degrades recall instead of going O(m^2)).

    Shape: the capped winnow->bucket->SA span pipeline
    (q_exact_substring_spans), projected to
    (doc, start, end) rows, UNIONed with one zero-span sentinel row per doc
    carrying its char length — lengths travel as data, so no join — then ONE
    sort by (doc, start) and a per-block vectorised interval-union sweep
    (segment-offset cummax trick), block-edge docs healed on the driver
    (O(blocks) docs; a doc's span count is bounded by len/min_len)."""
    import ray

    from ..util import ds_from_refs, split_boundary

    spans = q_exact_substring_spans(
        sf_dir, min_len=min_len, k=k, bucket_cap=bucket_cap, _sorted=False
    )
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def span_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("span_doc"),
                "start": b.column("start"),
                "end": b.column("end"),
                "len": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )

    def sentinel_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        lens = pc.utf8_length(b.column("text")).cast(pa.int64())
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "start": pa.array(np.full(n, -1, dtype=np.int64)),
                "end": pa.array(np.full(n, -1, dtype=np.int64)),
                "len": lens,
            }
        )

    rows = spans.map_batches(span_rows, batch_format="pyarrow").union(
        docs.map_batches(sentinel_rows, batch_format="pyarrow")
    )
    s = rows.sort(["doc_id", "start"])

    _coverage = _coverage_kernel

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "start": pa.array([], type=pa.int64()),
                "end": pa.array([], type=pa.int64()),
                "len": pa.array([], type=pa.int64()),
                "covered": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bnd = (doc == doc[0]) | (doc == doc[-1])
        inner = ~bnd
        start = batch.column("start").to_numpy(zero_copy_only=False)
        end = batch.column("end").to_numpy(zero_copy_only=False)
        ln = batch.column("len").to_numpy(zero_copy_only=False)
        uniq, n_chars, covered = _coverage(
            doc[inner], start[inner], end[inner], ln[inner]
        )
        bt = batch.filter(pa.array(bnd))
        return pa.table(
            {
                "doc_id": pa.array(np.r_[uniq, bt.column("doc_id").to_numpy(zero_copy_only=False)]),
                "start": pa.array(np.r_[np.full(len(uniq), -1, np.int64), bt.column("start").to_numpy(zero_copy_only=False)]),
                "end": pa.array(np.r_[np.full(len(uniq), -1, np.int64), bt.column("end").to_numpy(zero_copy_only=False)]),
                "len": pa.array(np.r_[n_chars, bt.column("len").to_numpy(zero_copy_only=False)]),
                "covered": pa.array(np.r_[covered, np.zeros(bt.num_rows, np.int64)]),
                "_boundary": pa.array(np.r_[np.zeros(len(uniq), bool), np.ones(bt.num_rows, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)

    def finish(t: pa.Table) -> pa.Table:
        nc = t.column("len").to_numpy(zero_copy_only=False).astype(np.float64)
        cv = t.column("covered").to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.where(nc > 0, cv / np.where(nc > 0, nc, 1.0), 0.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": t.column("len"),
                "covered": t.column("covered"),
                "coverage": pa.array(frac, type=pa.float64()),
            }
        )

    fin = ray.remote(finish)
    out_refs = [fin.remote(r) for r in int_refs]
    extra = 0
    if boundary is not None and boundary.num_rows:
        order = pc.sort_indices(
            boundary,
            sort_keys=[("doc_id", "ascending"), ("start", "ascending")],
        )
        b = boundary.take(order)
        uniq, n_chars, covered = _coverage(
            b.column("doc_id").to_numpy(zero_copy_only=False),
            b.column("start").to_numpy(zero_copy_only=False),
            b.column("end").to_numpy(zero_copy_only=False),
            b.column("len").to_numpy(zero_copy_only=False),
        )
        healed = finish(
            pa.table(
                {
                    "doc_id": pa.array(uniq),
                    "start": pa.array(np.full(len(uniq), -1, np.int64)),
                    "end": pa.array(np.full(len(uniq), -1, np.int64)),
                    "len": pa.array(n_chars),
                    "covered": pa.array(covered),
                }
            )
        )
        if healed.num_rows:
            out_refs.append(ray.put(healed))
            extra = healed.num_rows
    return ds_from_refs(
        out_refs, count=n_int + extra,
        doc_id=pa.int64(), n_chars=pa.int64(), covered=pa.int64(),
        coverage=pa.float64(),
    ).sort("doc_id")


def q_exact_substring_dedup(
    sf_dir: str, min_len: int = 40, k: int = 16, bucket_cap: int = 64
):
    """ExactSubstr dedup APPLICATION (Lee et al. 2022): remove every verbatim
    duplicated span (>= min_len chars) from the higher-id doc of each
    candidate pair (the lower id is the keeper, mirroring exact-dedup
    min-keeper semantics), and emit the cleaned corpus.

    Output: (doc_id, text_kept, n_removed, n_spans) for every document —
    unaffected docs pass through with n_removed = 0.

    Physical shape: loser spans -> ``merge_decisions`` (one sort + per-block
    blob grouping + raw-task boundary heal — the flagship D2 operator) ->
    gated broadcast of the per-loser blob table (row- AND byte-gated like
    every other broadcast), with a left-outer hash-join fallback above the
    gates.  Span volume is proportional to duplicated content, so nothing
    data-proportional ever lands on the driver.

    DuckDB oracle: a position of the higher-id doc is removed iff its
    min_len-char-gram occurs in a lower-id CANDIDATE partner (candidates =
    pairs sharing a winnow fingerprint whose bucket holds <= bucket_cap docs;
    a maximal shared substring >= min_len is exactly the union of its
    matching min_len-gram windows), so the capped candidate stage
    (sqlhash.winnow_candidates_ctes), removal set, merged islands and string
    surgery are all SQL-expressible — the production hot-key guard stays ON
    and is mirrored bitwise in the oracle.
    """
    import ray

    from ..stages.align import merge_decisions
    from ..util import fast_count, map_blocks

    cfg = DedupConfig()
    spans = q_exact_substring_spans(
        sf_dir, min_len=min_len, k=k, bucket_cap=bucket_cap
    )
    # loser side: the span rows belonging to doc_b (doc_a < doc_b canonical)
    def loser_rows(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("span_doc"), b.column("doc_b")))
        return pa.table(
            {
                "loser_uid": f.column("span_doc"),
                "start": f.column("start"),
                "end": f.column("end"),
            }
        )

    losers = spans.map_batches(loser_rows, batch_format="pyarrow")
    merged = merge_decisions(losers, cfg)  # (uid, intervals blob), distributed
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    n_merged = fast_count(merged)
    mat = merged.materialize()
    blob_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, mat))) if n_merged else 0
    if n_merged <= cfg.broadcast_classify_limit and blob_bytes <= cfg.broadcast_bytes_limit:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("uid").to_numpy(zero_copy_only=False),
                    b.column("intervals").to_pylist(),
                ),
                mat,
            )
        )
        if parts:
            ids_all = np.concatenate([p[0] for p in parts])
            blobs_all = np.array(sum((p[1] for p in parts), []), dtype=object)
            order = np.argsort(ids_all, kind="stable")
            lk_ref = ray.put((ids_all[order], blobs_all[order]))
        else:
            lk_ref = ray.put((np.empty(0, dtype=np.int64), np.empty(0, dtype=object)))

        def remove(batch: pa.Table) -> pa.Table:
            s_ids, blobs = ray.get(lk_ref)
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            kept, n_removed, n_spans = [], [], []
            if len(s_ids):
                pos = np.minimum(np.searchsorted(s_ids, d), len(s_ids) - 1)
                hit = s_ids[pos] == d
            else:
                hit = np.zeros(len(d), dtype=bool)
            for i, t in enumerate(texts):
                if not hit[i]:
                    kept.append(t)
                    n_removed.append(0)
                    n_spans.append(0)
                    continue
                kt, nr, ns = _apply_interval_blob(t, blobs[pos[i]])
                kept.append(kt)
                n_removed.append(nr)
                n_spans.append(ns)
            return pa.table(
                {
                    "doc_id": pa.array(d),
                    "text_kept": pa.array(kept, type=pa.string()),
                    "n_removed": pa.array(n_removed, type=pa.int64()),
                    "n_spans": pa.array(n_spans, type=pa.int64()),
                }
            )

        cleaned = docs.map_batches(remove, batch_format="pyarrow")
    else:
        # 100-TB path: left-outer hash join (unaffected docs pass through
        # with a null blob)
        side = mat.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("uid"), "intervals": b.column("intervals")}
            ),
            batch_format="pyarrow",
        )
        joined = docs.join(
            side, "left_outer", num_partitions=cfg.join_partitions(), on=("doc_id",)
        )

        def remove_joined(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            blobs = batch.column("intervals").to_pylist()
            kept, n_removed, n_spans = [], [], []
            for t, blob in zip(texts, blobs):
                if not blob:
                    kept.append(t)
                    n_removed.append(0)
                    n_spans.append(0)
                    continue
                kt, nr, ns = _apply_interval_blob(t, blob)
                kept.append(kt)
                n_removed.append(nr)
                n_spans.append(ns)
            return pa.table(
                {
                    "doc_id": pa.array(d),
                    "text_kept": pa.array(kept, type=pa.string()),
                    "n_removed": pa.array(n_removed, type=pa.int64()),
                    "n_spans": pa.array(n_spans, type=pa.int64()),
                }
            )

        cleaned = joined.map_batches(remove_joined, batch_format="pyarrow")
    return cleaned.sort("doc_id")


def q_shared_prefix_pairs(sf_dir: str, prefix_len: int = 64, bucket_cap: int = 256):
    """Pairs of docs (>= prefix_len chars) whose first ``prefix_len``
    characters are identical — an oracle-checkable member of the
    exact-substring family (prefix-anchored), exercising the sorted-bucket
    pair machinery on a string key.

    ``bucket_cap`` bounds the per-prefix pair fan-out: a hot boilerplate
    prefix shared by m > cap docs emits NO pairs (O(m^2) would straggle one
    bucket forever at web scale — the reference's counter-saturation insight,
    kmer_utilities.py:108 ``-cs255``).  The DuckDB oracle mirrors the cap
    with a prefix-frequency CTE, so the row stays exactly comparable."""
    from ..stages.bucketjoin import pairs_by_key
    from ..util import heal

    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def pref(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.greater_equal(batch.column("n_chars"), prefix_len))
        return pa.table(
            {
                "prefix": pc.utf8_slice_codeunits(
                    sub.column("text"), 0, prefix_len
                ).cast(pa.string()),
                "doc_id": sub.column("doc_id"),
            }
        )

    keyed = heal(
        docs.map_batches(pref, batch_format="pyarrow"),
        prefix=pa.string(), doc_id=pa.int64(),
    )
    pairs = pairs_by_key(keyed, "prefix", "doc_id", bucket_cap=bucket_cap)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b.column("ua"), "doc_b": b.column("ub")})

    return pairs.map_batches(rename, batch_format="pyarrow").sort(["doc_a", "doc_b"])


def q_edit_distance_pairs(
    sf_dir: str,
    prefix_len: int = 32,
    bucket_cap: int = 256,
    max_dist: int = 64,
):
    """Edit-distance verified near-dup pairs: prefix-blocked candidates
    (same capped blocking as q_shared_prefix_pairs) verified with EXACT
    byte-level Levenshtein distance — the character-level member of the
    verify family (the flagship verifies with common-kmer containment,
    stages/verify.py; the reference's analogue is dedup.py:362-369).

    ``dist`` is DuckDB-``levenshtein()``-exact (byte-level, see
    functions/editdist.py); ``sim = 1.0 - dist / max(byte_len_a,
    byte_len_b)`` with both IEEE ops mirrored in the oracle SQL.  The
    per-pair DP cost is bounded by the blocking cap — never an all-pairs
    scan."""
    from ..functions.editdist import levenshtein_bytes
    from ..stages.bucketjoin import pairs_by_key
    from ..util import heal

    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def pref(batch: pa.Table) -> pa.Table:
        sub = batch.filter(
            pc.greater_equal(pc.utf8_length(batch.column("text")), prefix_len)
        )
        return pa.table(
            {
                "prefix": pc.utf8_slice_codeunits(
                    sub.column("text"), 0, prefix_len
                ).cast(pa.string()),
                "doc_id": sub.column("doc_id"),
            }
        )

    keyed = heal(
        docs.map_batches(pref, batch_format="pyarrow"),
        prefix=pa.string(), doc_id=pa.int64(),
    )
    pairs = pairs_by_key(keyed, "prefix", "doc_id", bucket_cap=bucket_cap)
    with_texts = _pairs_with_texts(pairs, docs)

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_d, out_s = [], [], [], []
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        for a, b_, sa, sb in zip(ua.tolist(), ub.tolist(), ta, tb):
            ea, eb = sa.encode("utf-8"), sb.encode("utf-8")
            d = levenshtein_bytes(ea, eb)
            if d > max_dist:
                continue
            out_a.append(a)
            out_b.append(b_)
            out_d.append(d)
            # single IEEE divide + subtract — bitwise match with the SQL
            out_s.append(1.0 - d / float(max(len(ea), len(eb))))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "dist": pa.array(out_d, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    return with_texts.map_batches(verify, batch_format="pyarrow").sort(
        ["doc_a", "doc_b"]
    )


def _distinct_token_rows(batch: pa.Table) -> pa.Table:
    """Vectorised DISTINCT (doc_id, word-token) rows for a batch — the
    1-gram sibling of _distinct_gram_rows (one split, one zero-copy flatten,
    one Arrow hash-distinct).  Empty tokens from consecutive separators are
    kept, matching SQL ``unnest(string_split(text, ' '))``.  Also attaches
    ``_n`` = the doc's distinct-token count: each doc's text is one input
    row, so the count is exact block-locally and saves downstream consumers
    (stages/setsim.prefix_rows) a whole sorted exchange."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "tok": pa.array([], type=pa.string()),
            "_n": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    ws = pc.split_pattern(batch.column("text"), " ")
    la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
    flat = la.flatten()
    offs = la.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    wcount = offs[1:] - offs[:-1]
    doc_of = np.repeat(
        batch.column("doc_id").to_numpy(zero_copy_only=False), wcount
    )
    t = pa.table(
        {"doc_id": pa.array(doc_of, type=pa.int64()), "tok": flat.cast(pa.string())}
    )
    t = t.group_by(["doc_id", "tok"]).aggregate([])
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    _, inv, cnt = np.unique(d, return_inverse=True, return_counts=True)
    return t.append_column("_n", pa.array(cnt[inv], type=pa.int64()))


def q_setsim_prefix_pairs(
    sf_dir: str, threshold: float = 0.6, prefix_df_cap: int = 100
):
    """Set-similarity join with a PREFIX FILTER (AllPairs / SSJoin —
    Bayardo, Ma & Srikant, WWW 2007): exact word-token Jaccard pairs at
    ``threshold``, with candidates from the lossless df-ordered token
    prefix instead of a df-capped full token join (q_ngram_jaccard_pairs)
    or a probabilistic MinHash band join (stages/lsh.py).  Recall is 1.0
    by the prefix property up to the ``prefix_df_cap`` hot-prefix-token
    guard, which the oracle SQL mirrors with a prefix-frequency CTE.

    Physical shape: stages/setsim.prefix_rows (one df-annotation exchange
    — the per-doc token count is block-local at tokenisation time —
    + one sort + block-local rank) -> sorted-bucket pair emission
    (pairs_by_key, buckets bounded by the cap) -> per-candidate exact
    verify that recomputes both token sets from the attached texts
    (gated broadcast / hash-join fallback).  Verify cost is proportional
    to CANDIDATES, never to corpus size — the AllPairs contract."""
    from ..stages.bucketjoin import pairs_by_key
    from ..stages.setsim import prefix_rows
    from ..util import heal

    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    toks = heal(
        docs.map_batches(_distinct_token_rows, batch_format="pyarrow"),
        doc_id=pa.int64(), tok=pa.string(), _n=pa.int64(),
    )
    pref = prefix_rows(toks, threshold)
    cand = pairs_by_key(pref, "tok", "doc_id", bucket_cap=prefix_df_cap)
    with_texts = _pairs_with_texts(cand, docs)

    def verify(batch: pa.Table) -> pa.Table:
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        # tokenise each distinct doc ONCE per batch, then factorise every
        # token to an int code so the per-pair intersection runs over
        # sorted int64 arrays instead of object-string arrays
        uids = np.concatenate([ua, ub])
        _, first = np.unique(uids, return_index=True)
        texts = pa.concat_arrays(
            [
                batch.column("text_a").combine_chunks(),
                batch.column("text_b").combine_chunks(),
            ]
        ).take(pa.array(first))
        tl = pc.split_pattern(texts, " ")
        flat = tl.flatten().to_numpy(zero_copy_only=False)
        offs = tl.offsets.to_numpy().astype(np.int64)
        _, inv = np.unique(flat, return_inverse=True)
        codes = {
            int(uids[p]): np.unique(inv[offs[i] : offs[i + 1]])
            for i, p in enumerate(first)
        }
        out_a, out_b, out_c, out_j = [], [], [], []
        for a, b_ in zip(ua.tolist(), ub.tolist()):
            xs, ys = codes[a], codes[b_]
            c = float(len(np.intersect1d(xs, ys, assume_unique=True)))
            j = c / (len(xs) + len(ys) - c)  # one IEEE divide — SQL-exact
            if j >= threshold:
                out_a.append(a)
                out_b.append(b_)
                out_c.append(int(c))
                out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "common": pa.array(out_c, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return with_texts.map_batches(verify, batch_format="pyarrow").sort(
        ["doc_a", "doc_b"]
    )


def q_exact_substring_pairs(sf_dir: str, min_len: int = 40, k: int = 16):
    """Oracle-checkable face of the suffix-array ExactSubstr operator: the
    distinct doc pairs sharing ANY verbatim substring of length >= min_len.
    A pair shares a >=min_len substring iff it shares a min_len-char-gram, so
    DuckDB can reproduce the set with a substr() self-join — turning the
    whole winnow->bucket->SA-verify path (stages/substr.py) into a green
    CORRECTNESS row.  bucket_cap is uncapped here so recall is exactly 1.0
    (the production spans query keeps the hot-bucket guard)."""
    from ..stages.groupagg import sorted_aggregate

    spans = q_exact_substring_spans(
        sf_dir, min_len=min_len, k=k, bucket_cap=1 << 30
    )
    pairs = sorted_aggregate(
        spans.map_batches(
            lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        ),
        ["doc_a", "doc_b"],
        {"_n": ("doc_a", "count")},
        empty_types=dict(doc_a=pa.int64(), doc_b=pa.int64(), _n=pa.int64()),
    )
    return pairs.map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )


def _md5_simhash_sigs(sf_dir: str, bits: int = 60):
    """(doc_id, sig) — the md5-token simhash of q_simhash_oracle assembled
    into one int64 value per doc (bits < 63, so no sign gymnastics)."""
    import hashlib

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    shifts = np.arange(bits, dtype=np.int64)

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d_out: list = []
        s_out: list = []
        for i, t in zip(ids, texts):
            toks = t.split(" ")
            hv = np.array(
                [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in toks],
                dtype=np.int64,
            )
            votes = (((hv[:, None] >> shifts) & 1) * 2 - 1).sum(axis=0)
            d_out.append(i)
            s_out.append(int(((votes > 0).astype(np.int64) << shifts).sum()))
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "sig": pa.array(s_out, type=pa.int64()),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def q_simhash_hamming_pairs(sf_dir: str, maxk: int = 3, bits: int = 60):
    """SimHash near-dup pairs with exact Hamming verification — the full
    Manku et al. path (block candidates -> exact filter) over the
    oracle-computable md5-token simhash.  60 bits in 4 blocks of 15: any
    pair at Hamming distance <= 3 agrees on at least one whole block
    (pigeonhole), so block-bucket candidates have recall exactly 1.0 and the
    bit_count filter makes the result identical to the brute-force oracle.

    Scale shape: block keys shuffle via the sorted-bucket pair machinery
    (one sort, no hash join); the sig side is broadcast (8 bytes/doc) below
    the classify gate — above it this becomes the align-stage pair join."""
    import ray

    from ..stages.bucketjoin import pairs_by_key
    from ..util import heal, map_blocks

    n_blocks = 4
    width = bits // n_blocks  # 15
    sigs = _md5_simhash_sigs(sf_dir, bits=bits).materialize()

    def block_keys(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = batch.column("sig").to_numpy(zero_copy_only=False)
        keys, ids = [], []
        for blk in range(n_blocks):
            keys.append(
                (np.int64(blk) << np.int64(width))
                | ((s >> np.int64(width * blk)) & np.int64((1 << width) - 1))
            )
            ids.append(d)
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), type=pa.int64()),
            }
        )

    keyed = heal(
        sigs.map_batches(block_keys, batch_format="pyarrow"),
        bkey=pa.int64(), doc_id=pa.int64(),
    )
    pairs = pairs_by_key(keyed, "bkey", "doc_id")

    parts = ray.get(
        map_blocks(
            lambda b: (
                b.column("doc_id").to_numpy(zero_copy_only=False),
                b.column("sig").to_numpy(zero_copy_only=False),
            ),
            sigs,
        )
    )
    ids_all = (
        np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    )
    sig_all = (
        np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    )
    order = np.argsort(ids_all, kind="stable")
    lut_ref = ray.put((ids_all[order], sig_all[order]))

    def verify(batch: pa.Table) -> pa.Table:
        ids_s, sig_s = ray.get(lut_ref)
        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        if len(ua) == 0 or len(ids_s) == 0:
            e = pa.array([], type=pa.int64())
            return pa.table({"doc_a": e, "doc_b": e, "hamming": e})
        sa = sig_s[np.searchsorted(ids_s, ua)].astype(np.uint64)
        sb = sig_s[np.searchsorted(ids_s, ub)].astype(np.uint64)
        x = np.bitwise_xor(sa, sb)
        # numpy 1.26 has no bit_count ufunc: popcount via per-byte unpack
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= maxk
        return pa.table(
            {
                "doc_a": pa.array(ua[keep], type=pa.int64()),
                "doc_b": pa.array(ub[keep], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


def q_minhash_band_pairs(sf_dir: str, n_perm: int = 8, band_size: int = 4):
    """MinHash-LSH banding (T2) with an oracle-computable hash family: the
    md5 minhash of q_minhash_oracle grouped into bands of ``band_size``
    permutations; emitted pairs are docs sharing >= 1 full band signature,
    with n_bands = how many.  DuckDB reproduces the banding verbatim
    (string_agg over ordered perms == the '|'-joined Python signature), so
    the LSH bucket-pair shuffle itself gets a green CORRECTNESS row.

    Oracle fixture, not the scale path: reuses the memoised per-doc md5
    signature table (:func:`_md5_minhash_table`) so the md5 pass is shared
    with ``q_minhash_oracle`` instead of recomputed."""
    from ..stages.bucketjoin import pairs_by_key
    from ..util import heal

    sigs = _md5_minhash_table(sf_dir, n_perm)
    n_bands = n_perm // band_size

    def band_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        joined = batch.column("sig").to_pylist()
        k_out: list = []
        d_out: list = []
        for i, s in zip(ids, joined):
            mh = s.split("|")
            for b in range(n_bands):
                k_out.append(
                    f"{b}#" + "|".join(mh[b * band_size : (b + 1) * band_size])
                )
                d_out.append(i)
        return pa.table(
            {
                "band_sig": pa.array(k_out, type=pa.string()),
                "doc_id": pa.array(d_out, type=pa.int64()),
            }
        )

    keyed = heal(
        sigs.map_batches(band_keys, batch_format="pyarrow"),
        band_sig=pa.string(), doc_id=pa.int64(),
    )
    pairs = pairs_by_key(keyed, "band_sig", "doc_id")

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": b.column("ua"),
                "doc_b": b.column("ub"),
                "n_bands": b.column("n_buckets"),
            }
        )

    return pairs.map_batches(rename, batch_format="pyarrow")


def q_df_spectrum_band(sf_dir: str):
    """T5 spectrum-fit band derivation over the char-shingle DF histogram
    (optional path; config band is the default)."""
    from ..stages.df import df_table
    from ..stages.groupagg import sorted_aggregate
    from ..stages.shingle import make_shingle_pairs
    from ..stages.spectrum import df_band_from_histogram

    cfg = DedupConfig(num_partitions=16)
    docs = documents_as_docs(sf_dir)
    df = df_table(make_shingle_pairs(docs, cfg), cfg)
    hist = sorted_aggregate(df, ["df"], {"n_shingles": ("df", "count")}).take_all()
    band = df_band_from_histogram(hist, min_depth=1, max_depth=50)
    return pa.table(
        {
            "dup_lower": pa.array([band[0]], type=pa.int64()),
            "dup_upper": pa.array([band[1]], type=pa.int64()),
        }
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition metrics (Rae et al. 2021 §A1.1 shape):
    the char fraction of the most frequent word 2-gram and of all duplicated
    word 2-grams.  Doc-local — a pure map_batches stage, no shuffle at any
    scale; ties on the top count break to the lexicographically smallest
    bigram (mirrored in the oracle's ORDER BY cnt DESC, g ASC)."""
    from ..functions.text import repetition_stats_docs

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return repetition_stats_docs(ds)


_DECON_EVAL_SOURCES = ("src0", "src1", "src2", "src3")


def _decon_gram_rows(batch: pa.Table, n: int) -> pa.Table:
    """Distinct (gram, doc_id, ev) word-n-gram postings for a batch — the
    shared emitter of q_decontaminate and q_contamination_score.  Gram
    STRINGS (not hashes) so oracle comparisons are exact."""
    empty = pa.table(
        {
            "g": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "ev": pa.array([], type=pa.bool_()),
        }
    )
    if batch.num_rows == 0:
        return empty
    ws = pc.split_pattern(batch.column("text"), " ")
    la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
    flat = la.flatten()
    offs = la.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    total = len(flat)
    if total < n:
        return empty
    wcount = offs[1:] - offs[:-1]
    doc_of = np.repeat(np.arange(len(wcount)), wcount)
    m = total - n + 1
    joined = pc.binary_join_element_wise(*[flat.slice(j, m) for j in range(n)], " ")
    keep = doc_of[:m] == doc_of[n - 1 :]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    srcs = batch.column("source").to_pylist()
    ev_doc = np.array([s in _DECON_EVAL_SOURCES for s in srcs], dtype=bool)
    gdoc = doc_of[:m][keep]
    t = pa.table(
        {
            "g": joined.filter(pa.array(keep)),
            "doc_id": pa.array(ids[gdoc], type=pa.int64()),
            "ev": pa.array(ev_doc[gdoc]),
        }
    )
    return t.group_by(["g", "doc_id", "ev"]).aggregate([])


def q_decontaminate(sf_dir: str, n: int = 8):
    """Train-vs-eval decontamination (GPT-3 appendix C shape, Brown et al.
    2020, public): a train doc is contaminated if it shares any word-8-gram
    with the eval slice (sources ``_DECON_EVAL_SOURCES``); output is
    (doc_id, n_shared = distinct shared grams) per contaminated train doc.

    Physical plan: distinct grams per doc (map_batches, gram STRINGS so the
    oracle comparison is exact — no hash collisions), then ONE sorted-bucket
    semi-join (``semi_join_by_key``: sort by gram, per-block bucket scan
    keeping train postings whose bucket contains an eval posting, tiny driver
    heal for block-edge buckets), then a per-doc count.  Linear in bucket
    size, so no hot-gram cap is needed — at 100 TB the eval side is NOT
    broadcast (it can be millions of benchmark grams); both sides ride the
    same sort."""
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def grams(batch: pa.Table) -> pa.Table:
        return _decon_gram_rows(batch, n)

    from ..stages.bucketjoin import semi_join_by_key
    from ..stages.groupagg import sorted_aggregate
    from ..util import heal

    rows = heal(
        ds.map_batches(grams, batch_format="pyarrow"),
        g=pa.string(), doc_id=pa.int64(), ev=pa.bool_(),
    )
    hit = semi_join_by_key(rows, "g", "doc_id", "ev")
    out = sorted_aggregate(
        hit, ["id"], {"n_shared": ("id", "count")},
        empty_types=dict(id=pa.int64(), n_shared=pa.int64()),
    )
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "n_shared"]), batch_format="pyarrow"
    )


def q_contamination_score(sf_dir: str, n: int = 8):
    """Per-train-doc contamination FRACTION (the GPT-3 appendix C 'dirty'
    metric made continuous): n_shared / n_grams where n_grams is the doc's
    distinct word-n-gram count and n_shared the subset also present in the
    eval slice (``_DECON_EVAL_SOURCES``).  Emits every train doc with at
    least one n-gram, shared or not — the score is what a curation pipeline
    thresholds on.

    Physical plan: the q_decontaminate semi-join gives n_shared; n_grams is
    counted from the SAME materialised gram-posting blocks the semi-join
    consumes (tokenisation runs once — a doc's distinct gram rows all live
    in the block its text batch produced, so a per-block unique-count is
    exact); the two per-doc partial tables merge through ONE sorted-sum
    exchange (union + sorted_aggregate) — no join, no broadcast, skew-free.
    """
    from ..stages.bucketjoin import semi_join_by_key
    from ..stages.groupagg import sorted_aggregate
    from ..util import heal

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "source", "text"])

    rows = heal(
        ds.map_batches(
            lambda b: _decon_gram_rows(b, n), batch_format="pyarrow"
        ),
        g=pa.string(), doc_id=pa.int64(), ev=pa.bool_(),
    )
    hit = semi_join_by_key(rows, "g", "doc_id", "ev")
    shared = sorted_aggregate(
        hit, ["id"], {"n_shared": ("id", "count")},
        empty_types=dict(id=pa.int64(), n_shared=pa.int64()),
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("id"),
                "n_grams": pa.array(np.zeros(b.num_rows, np.int64)),
                "n_shared": b.column("n_shared"),
            }
        ),
        batch_format="pyarrow",
    )

    def totals(batch: pa.Table) -> pa.Table:
        # per-doc distinct-gram counts off the already-tokenised posting
        # blocks (batch_size=None => batch == block => per-doc rows complete)
        t = batch.filter(pc.invert(batch.column("ev")))
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_grams": pa.array(cnt.astype(np.int64)),
                "n_shared": pa.array(np.zeros(len(uniq), np.int64)),
            }
        )

    tot = rows.map_batches(
        totals, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = sorted_aggregate(
        tot.union(shared),
        ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_shared": ("n_shared", "sum")},
        empty_types=dict(doc_id=pa.int64(), n_grams=pa.int64(), n_shared=pa.int64()),
    )

    def score(b: pa.Table) -> pa.Table:
        ng = b.column("n_grams").to_numpy(zero_copy_only=False)
        ns = b.column("n_shared").to_numpy(zero_copy_only=False)
        frac = ns.astype(np.float64) / np.maximum(ng, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_grams": b.column("n_grams"),
                "n_shared": b.column("n_shared"),
                "contamination": pa.array(frac, type=pa.float64()),
            }
        )

    return merged.map_batches(score, batch_format="pyarrow").sort("doc_id")


QUERIES = {
    "exact_dup_groups": q_exact_dup_groups,
    "token_counts": q_token_counts,
    "lang_stats": q_lang_stats,
    "top_docs": q_top_docs,
    "shingle_df_histogram": q_shingle_df_histogram,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "events_hourly": q_events_hourly,
    "events_sessions": q_events_sessions,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "ann_topk": q_ann_topk,
    "near_dup_pairs_oracle": q_near_dup_pairs_oracle,
    "source_overlap": q_source_overlap,
    "top_docs_per_source": q_top_docs_per_source,
    "chars_quantiles_per_lang": q_chars_quantiles_per_lang,
    "near_dup_clusters_oracle": q_near_dup_clusters_oracle,
    "doc_stats_oracle": q_doc_stats_oracle,
    "fingerprints_oracle": q_fingerprints_oracle,
    "minhash_oracle": q_minhash_oracle,
    "simhash_oracle": q_simhash_oracle,
    "multimodal_bytes": q_multimodal_bytes,
    "multimodal_decode_meta": q_multimodal_decode_meta,
    "near_dup_pairs": q_near_dup_pairs,
    "near_dup_clusters": q_near_dup_clusters,
    "minhash_signatures": q_minhash_signatures,
    "simhash": q_simhash,
    "fingerprints": q_fingerprints,
    "lang_id": q_lang_id,
    "quality": q_quality,
    "bpe_token_counts": q_bpe_token_counts,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_candidates": q_simhash_candidates,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_lsh_pairs": q_embedding_lsh_pairs,
    "embedding_lsh_pairs_oracle": q_embedding_lsh_pairs_oracle,
    "ann_ivf_topk": q_ann_ivf_topk,
    "multimodal_features": q_multimodal_features,
    "multimodal_features_oracle": q_multimodal_features_oracle,
    "multimodal_decode": q_multimodal_decode,
    "df_spectrum_band": q_df_spectrum_band,
    "exact_substring_spans": q_exact_substring_spans,
    "exact_substring_spans_oracle": q_exact_substring_spans_oracle,
    "exact_substring_dedup": q_exact_substring_dedup,
    "exact_substring_pairs": q_exact_substring_pairs,
    "shared_prefix_pairs": q_shared_prefix_pairs,
    "edit_distance_pairs": q_edit_distance_pairs,
    "setsim_prefix_pairs": q_setsim_prefix_pairs,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "minhash_band_pairs": q_minhash_band_pairs,
    "stratified_sample": q_stratified_sample,
    "token_budget_select": q_token_budget_select,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "contamination_score": q_contamination_score,
    "dup_span_coverage": q_dup_span_coverage,
    "containment_pairs": q_containment_pairs,
    "weighted_jaccard_pairs": q_weighted_jaccard_pairs,
    "jaccard_knn": q_jaccard_knn,
    "inverted_index": q_inverted_index,
}

_GRAMS_CTE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
    FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
)
"""

# the flagship word-3-gram near-dup pipeline as SQL, up to the verified-pair
# candidates — shared by near_dup_pairs_oracle and source_overlap
_NEAR_PAIRS_CTE = (
    "WITH survivors AS ("
    "  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
    "), toks AS ("
    "  SELECT doc_id, string_split(text, ' ') AS w FROM survivors"
    "), g_all AS ("
    "  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g"
    "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
    "), gram_tf AS ("
    "  SELECT doc_id, g, COUNT(*) AS tf FROM g_all GROUP BY 1, 2"
    "), dfs AS (SELECT g, COUNT(*) AS df FROM gram_tf GROUP BY g), "
    "dup AS ("
    "  SELECT gram_tf.doc_id, gram_tf.g, gram_tf.tf"
    "  FROM gram_tf JOIN dfs USING (g) WHERE df BETWEEN 2 AND 4"
    "), doc_dup AS ("
    "  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS np FROM dup GROUP BY doc_id"
    "), pairs AS ("
    "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
    "  FROM dup a JOIN dup b ON a.g = b.g AND a.doc_id < b.doc_id"
    "  GROUP BY 1, 2"
    ") "
)

# the flagship char-17 config's gram model in SQL: substr() k-grams of the
# survivor texts (hash_u64 of a 17-char window is injective up to 63-bit
# collisions, so DISTINCT grams == DISTINCT window strings)
_NEAR_PAIRS_CHAR_CTE = (
    "WITH survivors AS ("
    "  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
    "), g_all AS ("
    "  SELECT doc_id, substr(text, CAST(i AS INT), 17) AS g"
    "  FROM survivors, UNNEST(generate_series(1, length(text) - 16)) AS t(i)"
    "), gram_tf AS ("
    "  SELECT doc_id, g, COUNT(*) AS tf FROM g_all GROUP BY 1, 2"
    "), dfs AS (SELECT g, COUNT(*) AS df FROM gram_tf GROUP BY g), "
    "dup AS ("
    "  SELECT gram_tf.doc_id, gram_tf.g, gram_tf.tf"
    "  FROM gram_tf JOIN dfs USING (g) WHERE df BETWEEN 2 AND 4"
    "), doc_dup AS ("
    "  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS np FROM dup GROUP BY doc_id"
    "), pairs AS ("
    "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
    "  FROM dup a JOIN dup b ON a.g = b.g AND a.doc_id < b.doc_id"
    "  GROUP BY 1, 2"
    ") "
)

ORACLE_SQL = {
    "exact_dup_groups": (
        "SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY text"
    ),
    "token_counts": (
        "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents"
    ),
    "lang_stats": (
        "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY lang"
    ),
    "top_docs": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 100"
    ),
    "shingle_df_histogram": _GRAMS_CTE
    + (
        ", dfs AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g) "
        "SELECT df, COUNT(*) AS n_shingles FROM dfs GROUP BY df"
    ),
    "ngram_jaccard_pairs": _GRAMS_CTE
    + (
        ", dfs AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g), "
        "capped AS (SELECT grams.doc_id, grams.g FROM grams JOIN dfs USING (g) "
        "           WHERE df <= 50), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n_g FROM capped GROUP BY doc_id), "
        "pairs AS ("
        "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common"
        "  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, common, "
        "       CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common) AS jaccard "
        "FROM pairs JOIN sizes sa ON pairs.doc_a = sa.doc_id "
        "JOIN sizes sb ON pairs.doc_b = sb.doc_id "
        "WHERE CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common) >= 0.1"
    ),
    # flagship char-17 config — same verified-pair math as the word twin,
    # over substr() 17-grams
    "near_dup_pairs": _NEAR_PAIRS_CHAR_CTE
    + (
        "SELECT 'doc://' || lpad(CAST(da AS VARCHAR), 8, '0') AS url_a, "
        "       'doc://' || lpad(CAST(db AS VARCHAR), 8, '0') AS url_b, "
        "       common, pa.np AS n_dup_postings_a, pb.np AS n_dup_postings_b "
        "FROM pairs JOIN doc_dup pa ON pairs.da = pa.doc_id "
        "JOIN doc_dup pb ON pairs.db = pb.doc_id "
        "WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
        "   OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
    ),
    # flagship char-17 clustering — recursive min-label CC over the verified
    # near edges + exact-dup edges (same shape as near_dup_clusters_oracle)
    "near_dup_clusters": (
        "WITH RECURSIVE survivors AS ("
        "  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
        "), g_all AS ("
        "  SELECT doc_id, substr(text, CAST(i AS INT), 17) AS g"
        "  FROM survivors, UNNEST(generate_series(1, length(text) - 16)) AS t(i)"
        "), gram_tf AS ("
        "  SELECT doc_id, g, COUNT(*) AS tf FROM g_all GROUP BY 1, 2"
        "), dfs AS (SELECT g, COUNT(*) AS df FROM gram_tf GROUP BY g), "
        "dup AS ("
        "  SELECT gram_tf.doc_id, gram_tf.g, gram_tf.tf"
        "  FROM gram_tf JOIN dfs USING (g) WHERE df BETWEEN 2 AND 4"
        "), doc_dup AS ("
        "  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS np FROM dup GROUP BY doc_id"
        "), prs AS ("
        "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
        "  FROM dup a JOIN dup b ON a.g = b.g AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2"
        "), near AS ("
        "  SELECT da AS a, db AS b "
        "  FROM prs JOIN doc_dup pa ON prs.da = pa.doc_id "
        "  JOIN doc_dup pb ON prs.db = pb.doc_id "
        "  WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
        "     OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
        "), exact_e AS ("
        "  SELECT d.doc_id AS a, s.doc_id AS b FROM documents d "
        "  JOIN survivors s ON d.text = s.text AND d.doc_id <> s.doc_id"
        "), edges0 AS ("
        "  SELECT a, b FROM near UNION SELECT a, b FROM exact_e"
        "), edges AS ("
        "  SELECT a AS s, b AS d FROM edges0 UNION SELECT b AS s, a AS d FROM edges0"
        "), nodes AS (SELECT DISTINCT s AS n FROM edges), "
        "reach AS ("
        "  SELECT n, n AS l FROM nodes"
        "  UNION"
        "  SELECT e.d AS n, r.l FROM reach r JOIN edges e ON e.s = r.n"
        ") "
        "SELECT 'doc://' || lpad(CAST(n AS VARCHAR), 8, '0') AS url, "
        "       'doc://' || lpad(CAST(MIN(l) AS VARCHAR), 8, '0') AS cluster_url "
        "FROM reach GROUP BY n"
    ),
    "near_dup_pairs_oracle": _NEAR_PAIRS_CTE
    + (
        "SELECT 'doc://' || lpad(CAST(da AS VARCHAR), 8, '0') AS url_a, "
        "       'doc://' || lpad(CAST(db AS VARCHAR), 8, '0') AS url_b, "
        "       common, pa.np AS n_dup_postings_a, pb.np AS n_dup_postings_b "
        "FROM pairs JOIN doc_dup pa ON pairs.da = pa.doc_id "
        "JOIN doc_dup pb ON pairs.db = pb.doc_id "
        "WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
        "   OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
    ),
    # the same verified near-pairs, rolled up into a cross-source
    # contamination matrix (unordered source pairs)
    "source_overlap": _NEAR_PAIRS_CTE
    + (
        ", near AS ("
        "  SELECT da, db "
        "  FROM pairs JOIN doc_dup pa ON pairs.da = pa.doc_id "
        "  JOIN doc_dup pb ON pairs.db = pb.doc_id "
        "  WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
        "     OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
        ") "
        "SELECT least(sa.source, sb.source) AS source_a, "
        "       greatest(sa.source, sb.source) AS source_b, "
        "       COUNT(*) AS n_pairs "
        "FROM near JOIN documents sa ON near.da = sa.doc_id "
        "JOIN documents sb ON near.db = sb.doc_id "
        "GROUP BY 1, 2"
    ),
    # connected components in SQL: undirected edge closure via a recursive
    # min-label reachability CTE (UNION dedups, so it terminates); the final
    # GROUP BY MIN(l) == min doc id reachable == the component's min url.
    "near_dup_clusters_oracle": (
        "WITH RECURSIVE survivors AS ("
        "  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
        "), toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS w FROM survivors"
        "), g_all AS ("
        "  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g"
        "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
        "), gram_tf AS ("
        "  SELECT doc_id, g, COUNT(*) AS tf FROM g_all GROUP BY 1, 2"
        "), dfs AS (SELECT g, COUNT(*) AS df FROM gram_tf GROUP BY g), "
        "dup AS ("
        "  SELECT gram_tf.doc_id, gram_tf.g, gram_tf.tf"
        "  FROM gram_tf JOIN dfs USING (g) WHERE df BETWEEN 2 AND 4"
        "), doc_dup AS ("
        "  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS np FROM dup GROUP BY doc_id"
        "), prs AS ("
        "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
        "  FROM dup a JOIN dup b ON a.g = b.g AND a.doc_id < b.doc_id"
        "  GROUP BY 1, 2"
        "), near AS ("
        "  SELECT da AS a, db AS b "
        "  FROM prs JOIN doc_dup pa ON prs.da = pa.doc_id "
        "  JOIN doc_dup pb ON prs.db = pb.doc_id "
        "  WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
        "     OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
        "), exact_e AS ("
        "  SELECT d.doc_id AS a, s.doc_id AS b FROM documents d "
        "  JOIN survivors s ON d.text = s.text AND d.doc_id <> s.doc_id"
        "), edges0 AS ("
        "  SELECT a, b FROM near UNION SELECT a, b FROM exact_e"
        "), edges AS ("
        "  SELECT a AS s, b AS d FROM edges0 UNION SELECT b AS s, a AS d FROM edges0"
        "), nodes AS (SELECT DISTINCT s AS n FROM edges), "
        "reach AS ("
        "  SELECT n, n AS l FROM nodes"
        "  UNION"
        "  SELECT e.d AS n, r.l FROM reach r JOIN edges e ON e.s = r.n"
        ") "
        "SELECT 'doc://' || lpad(CAST(n AS VARCHAR), 8, '0') AS url, "
        "       'doc://' || lpad(CAST(MIN(l) AS VARCHAR), 8, '0') AS cluster_url "
        "FROM reach GROUP BY n"
    ),
    "doc_stats_oracle": (
        "WITH survivors AS ("
        "  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"
        "), toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS w FROM survivors"
        "), g_all AS ("
        "  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g"
        "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
        "), gram_tf AS ("
        "  SELECT doc_id, g, COUNT(*) AS tf FROM g_all GROUP BY 1, 2"
        "), dfs AS (SELECT g, COUNT(*) AS df FROM gram_tf GROUP BY g), "
        "agg AS ("
        "  SELECT gram_tf.doc_id, "
        "         CAST(SUM(tf) AS BIGINT) AS n_multi_postings, "
        "         CAST(COALESCE(SUM(CASE WHEN df BETWEEN 2 AND 4 THEN tf END), 0)"
        "              AS BIGINT) AS n_dup_postings "
        "  FROM gram_tf JOIN dfs USING (g) WHERE df >= 2 GROUP BY gram_tf.doc_id"
        ") "
        "SELECT 'doc://' || lpad(CAST(t.doc_id AS VARCHAR), 8, '0') AS url, "
        "       GREATEST(len(w) - 2, 0) AS n_postings, "
        "       COALESCE(a.n_multi_postings, 0) AS n_multi_postings, "
        "       COALESCE(a.n_dup_postings, 0) AS n_dup_postings "
        "FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id"
    ),
    "fingerprints_oracle": (
        "WITH toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS w FROM documents"
        "), g_all AS ("
        "  SELECT doc_id, i, md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS h"
        "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
        "), wmin AS ("
        "  SELECT doc_id, i, min(h) OVER ("
        "    PARTITION BY doc_id ORDER BY i"
        "    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp"
        "  FROM g_all"
        ") "
        "SELECT DISTINCT doc_id, fp FROM wmin WHERE i >= 4"
    ),
    "minhash_oracle": (
        "WITH toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS w FROM documents"
        "), g_all AS ("
        "  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g"
        "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
        ") "
        "SELECT doc_id, p AS perm, "
        "       min(md5(CAST(p AS VARCHAR) || '|' || g)) AS minhash "
        "FROM g_all CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS p) "
        "GROUP BY doc_id, p"
    ),
    "simhash_oracle": (
        "WITH toks AS ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
        "), h AS ("
        "  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks"
        "), bits AS ("
        "  SELECT doc_id, b, "
        "         SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v "
        "  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) "
        "  GROUP BY doc_id, b"
        ") "
        "SELECT doc_id, b AS bit, "
        "       CASE WHEN v > 0 THEN 1 ELSE 0 END AS bit_val FROM bits"
    ),
    "multimodal_bytes": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents"
    ),
    # lang_id: the stopword-voting heuristic is pure SQL on this (all-ASCII)
    # corpus: per-token stopword hits per language, argmax with ties broken
    # alphabetically (== the Python scan order over sorted langs with initial
    # best_hits=-1).  The CJK branch never fires on ASCII text.  The VALUES
    # list is generated from functions.text._STOPWORDS to prevent drift.
    # "lang_id" is appended below (VALUES generated from _STOPWORDS)
    "quality": (
        "SELECT doc_id, length(text) AS n_chars, "
        "       len(string_split(text, ' ')) AS n_tokens, "
        "       length(regexp_replace(text, '[^.,;:!?\"''()\\[\\]{}]', '', 'g'))"
        "         AS n_punct, "
        "       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper, "
        "       CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))"
        "         AS mean_token_len "
        "FROM documents"
    ),
    # per-group top-k with deterministic tie-break
    "top_docs_per_source": (
        "SELECT source, doc_id, n_chars, rnk FROM ("
        "  SELECT source, doc_id, n_chars, "
        "         row_number() OVER (PARTITION BY source "
        "           ORDER BY n_chars DESC, doc_id) AS rnk "
        "  FROM documents) WHERE rnk <= 5"
    ),
    # exact discrete quantiles, lower-rank definition mirrored verbatim
    "chars_quantiles_per_lang": (
        "WITH ranked AS ("
        "  SELECT lang, n_chars, "
        "         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
        "         COUNT(*) OVER (PARTITION BY lang) AS n "
        "  FROM documents"
        "), qv(q) AS (VALUES (0.5), (0.9), (0.99)) "
        "SELECT lang, q, n_chars AS n_chars_q "
        "FROM ranked JOIN qv ON rn = CAST(floor((n - 1) * q) AS BIGINT) + 1"
    ),
    "bpe_token_counts": (
        "SELECT doc_id, "
        "       len(regexp_extract_all(text,"
        " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\t\\n\\f\\r ]')) AS n_bpe_tokens "
        "FROM documents"
    ),
    "events_hourly": (
        "SELECT user_id, date_trunc('hour', ts) AS window_start, "
        "COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_types "
        "FROM events GROUP BY 1, 2"
    ),
    # session windows via gaps-and-islands: brk marks a session head, the
    # running sum of brk is the session id.  Tie-safe: a row tied with its
    # LAG neighbour has gap 0, so ordering among ties cannot move a boundary.
    "events_sessions": (
        "WITH o AS ("
        "  SELECT user_id, ts, "
        "    CASE WHEN LAG(ts) OVER w IS NULL "
        "          OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE "
        "         THEN 1 ELSE 0 END AS brk "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
        "), s AS ("
        "  SELECT user_id, ts, SUM(brk) OVER ("
        "    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "  FROM o"
        ") "
        "SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events "
        "FROM s GROUP BY user_id, sid"
    ),
    "events_asof_join": (
        "WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'), "
        "s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup') "
        "SELECT p.user_id, p.ts AS purchase_ts, s.ts AS signup_ts "
        "FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts"
    ),
    "events_range_join": (
        "SELECT a.event_id AS id_a, b.event_id AS id_b "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "WHERE (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id)) "
        "  AND b.ts - a.ts <= INTERVAL 5 MINUTE"
    ),
    "embedding_dup_pairs": (
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
    ),
    # prefix-blocked candidates (q_shared_prefix_pairs' cap semantics at
    # prefix_len=32) verified with byte-level levenshtein(); sim mirrors the
    # engine's 1.0 - dist / max(byte_len) IEEE ops
    "edit_distance_pairs": (
        "WITH pref AS ("
        "  SELECT doc_id, text, substr(text, 1, 32) AS p"
        "  FROM documents WHERE length(text) >= 32"
        "), ok AS ("
        "  SELECT p FROM pref GROUP BY p HAVING COUNT(*) BETWEEN 2 AND 256"
        "), cand AS ("
        "  SELECT a.doc_id AS da, b.doc_id AS db, a.text AS ta, b.text AS tb"
        "  FROM pref a JOIN pref b ON a.p = b.p AND a.doc_id < b.doc_id"
        "  JOIN ok ON ok.p = a.p"
        "), d AS ("
        "  SELECT da, db, levenshtein(ta, tb) AS dist,"
        "         GREATEST(octet_length(encode(ta)), octet_length(encode(tb)))"
        "           AS ml"
        "  FROM cand) "
        "SELECT da AS doc_a, db AS doc_b, CAST(dist AS BIGINT) AS dist, "
        "       1.0 - dist / CAST(ml AS DOUBLE) AS sim "
        "FROM d WHERE dist <= 64"
    ),
    # AllPairs prefix filter: df-ordered token prefix (lossless for
    # jaccard >= 0.6), hot-prefix-token cap 100 mirrored as a frequency CTE,
    # exact token-jaccard verify over the full DISTINCT token sets
    "setsim_prefix_pairs": (
        "WITH toks AS ("
        "  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok"
        "  FROM documents"
        "), dfs AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok), "
        "sz AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id), "
        "ranked AS ("
        "  SELECT t.doc_id, t.tok,"
        "         row_number() OVER (PARTITION BY t.doc_id"
        "                            ORDER BY d.df, t.tok) AS r,"
        "         s.n"
        "  FROM toks t JOIN dfs d USING (tok) JOIN sz s USING (doc_id)"
        "), pref AS ("
        "  SELECT doc_id, tok FROM ranked"
        "  WHERE r <= n - CEIL(0.6::DOUBLE * n) + 1"
        "), pdf AS (SELECT tok, COUNT(*) AS c FROM pref GROUP BY tok), "
        "pok AS ("
        "  SELECT p.doc_id, p.tok FROM pref p JOIN pdf USING (tok)"
        "  WHERE pdf.c BETWEEN 2 AND 100"
        "), cand AS ("
        "  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db"
        "  FROM pok a JOIN pok b ON a.tok = b.tok AND a.doc_id < b.doc_id"
        "), common AS ("
        "  SELECT c.da, c.db, COUNT(*) AS common"
        "  FROM cand c JOIN toks ta ON ta.doc_id = c.da"
        "              JOIN toks tb ON tb.doc_id = c.db AND tb.tok = ta.tok"
        "  GROUP BY c.da, c.db) "
        "SELECT da AS doc_a, db AS doc_b, common, "
        "       CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard "
        "FROM common JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db "
        "WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.6"
    ),
    # the cap CTE mirrors q_shared_prefix_pairs' bucket_cap=256: prefixes
    # hotter than the cap emit no pairs on either side
    "shared_prefix_pairs": (
        "WITH pref AS ("
        "  SELECT doc_id, substr(text, 1, 64) AS p"
        "  FROM documents WHERE length(text) >= 64"
        "), ok AS ("
        "  SELECT p FROM pref GROUP BY p HAVING COUNT(*) BETWEEN 2 AND 256"
        ") "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM pref a JOIN pref b ON a.p = b.p AND a.doc_id < b.doc_id "
        "JOIN ok ON ok.p = a.p"
    ),
    # strict PPM decode metadata: DuckDB rebuilds the doc-varying payload
    # from the text bytes (hex surgery) and recomputes header length, parsed
    # dims and the pixel byte sum
    "multimodal_decode_meta": (
        "WITH base AS ("
        "  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,"
        "         to_hex(encode(text)) AS hx, octet_length(encode(text)) AS nb"
        "  FROM documents"
        "), hdr AS ("
        "  SELECT doc_id, w, h, nb, hx, w * h * 3 AS npx,"
        "         length('P6' || chr(10) || w || ' ' || h || chr(10) || '255'"
        "                || chr(10)) AS hlen"
        "  FROM base"
        "), bytes AS ("
        "  SELECT doc_id,"
        "         CASE WHEN i <= nb THEN ('0x' || substr(hx, 2*i - 1, 2))::BIGINT"
        "              ELSE 0 END AS v"
        "  FROM hdr, UNNEST(generate_series(1, npx)) AS t(i)"
        "), sums AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS px_sum "
        "            FROM bytes GROUP BY doc_id) "
        "SELECT h.doc_id, h.hlen + h.npx AS n_bytes, h.w AS width, "
        "       h.h AS height, 3 AS channels, s.px_sum "
        "FROM hdr h JOIN sums s USING (doc_id) ORDER BY h.doc_id"
    ),
    # decode-arithmetic face of the feature extractor: same byte rebuild as
    # multimodal_decode_meta, then integer feature aggregates (min/max/sum,
    # 32-wide histogram bins via v // 32) + one double division for the mean
    "multimodal_features_oracle": (
        "WITH base AS ("
        "  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,"
        "         to_hex(encode(text)) AS hx, octet_length(encode(text)) AS nb"
        "  FROM documents"
        "), hdr AS ("
        "  SELECT doc_id, w, h, nb, hx, w * h * 3 AS npx FROM base"
        "), bytes AS ("
        "  SELECT doc_id,"
        "         CASE WHEN i <= nb THEN ('0x' || substr(hx, 2*i - 1, 2))::BIGINT"
        "              ELSE 0 END AS v"
        "  FROM hdr, UNNEST(generate_series(1, npx)) AS t(i)"
        "), agg AS ("
        "  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS px_sum,"
        "         MIN(v) AS px_min, MAX(v) AS px_max,"
        + ", ".join(
            f"         CAST(SUM(CASE WHEN v // 32 = {b} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS b{b}"
            for b in range(8)
        )
        + "  FROM bytes GROUP BY doc_id"
        ") "
        "SELECT h.doc_id, h.w AS width, h.h AS height, 3 AS channels, "
        "       a.px_sum, a.px_min, a.px_max, "
        "       CAST(a.px_sum AS DOUBLE) / h.npx AS mean_px, "
        "       a.b0, a.b1, a.b2, a.b3, a.b4, a.b5, a.b6, a.b7 "
        "FROM hdr h JOIN agg a USING (doc_id) ORDER BY h.doc_id"
    ),
    # ExactSubstr dedup application: a position of the higher-id doc is
    # removed iff its 40-gram occurs in a lower-id CANDIDATE partner; the
    # candidate stage (winnow-fingerprint bucket cap 64) is prepended after
    # the sqlhash import below — "{CAND}" is spliced there.  Islands = merged
    # removal intervals; string surgery rebuilds text_kept.
    "exact_substring_dedup": (
        "WITH {CAND},"
        "grams AS ("
        "  SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        "         substr(text, CAST(i AS INT), 40) AS g"
        "  FROM documents, UNNEST(generate_series(1, length(text) - 39)) AS t(i)"
        "), hits AS ("
        "  SELECT DISTINCT gb.doc_id AS doc_id, gb.pos AS pos"
        "  FROM cand c"
        "  JOIN grams ga ON ga.doc_id = c.da"
        "  JOIN grams gb ON gb.doc_id = c.db AND gb.g = ga.g"
        "), flagged AS ("
        "  SELECT doc_id, pos,"
        "         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 40"
        "              THEN 1 ELSE 0 END AS is_new"
        "  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)"
        "), numbered AS ("
        "  SELECT doc_id, pos,"
        "         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS isl"
        "  FROM flagged"
        "), islands AS ("
        "  SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) + 40 AS e"
        "  FROM numbered GROUP BY doc_id, isl"
        "), surgery AS ("
        "  SELECT doc_id, isl, s, e,"
        "         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS prev_e"
        "  FROM islands"
        "), pieces AS ("
        "  SELECT i.doc_id, i.s AS ord,"
        "         substr(d.text, CAST(i.prev_e AS INT),"
        "                CAST(i.s - i.prev_e AS INT)) AS piece"
        "  FROM surgery i JOIN documents d USING (doc_id)"
        "  UNION ALL"
        "  SELECT i.doc_id, CAST(1e15 AS BIGINT) AS ord,"
        "         substr(d.text, CAST(MAX(i.e) AS INT)) AS piece"
        "  FROM islands i JOIN documents d USING (doc_id)"
        "  GROUP BY i.doc_id, d.text"
        "), rebuilt AS ("
        "  SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS text_kept"
        "  FROM pieces GROUP BY doc_id"
        "), stats AS ("
        "  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_removed, "
        "         COUNT(*) AS n_spans"
        "  FROM islands GROUP BY doc_id"
        ") "
        "SELECT d.doc_id, COALESCE(r.text_kept, d.text) AS text_kept, "
        "       COALESCE(s.n_removed, 0) AS n_removed, "
        "       COALESCE(s.n_spans, 0) AS n_spans "
        "FROM documents d "
        "LEFT JOIN rebuilt r USING (doc_id) "
        "LEFT JOIN stats s USING (doc_id) "
        "ORDER BY d.doc_id"
    ),
    # a pair shares a >=40-char substring iff it shares a 40-char-gram
    "exact_substring_pairs": (
        "WITH grams AS ("
        "  SELECT DISTINCT doc_id, substr(text, i, 40) AS g"
        "  FROM documents, UNNEST(generate_series(1, length(text) - 39)) AS t(i)"
        ") "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM grams a JOIN grams b USING (g) WHERE a.doc_id < b.doc_id"
    ),
    # merged [start,end) spans = interval union of matched 40-gram windows
    # (a length-L common substring tiles exactly its L-39 gram starts) over
    # the capped candidate pairs ("{CAND4096}" spliced after the sqlhash
    # import); islands via the cumulative-max interval-merge window
    "exact_substring_spans_oracle": (
        "WITH {CAND4096},"
        "grams AS ("
        "  SELECT doc_id, i, substr(text, i, 40) AS g"
        "  FROM documents, UNNEST(generate_series(1, length(text) - 39)) AS t(i)"
        "), m AS ("
        "  SELECT c.da, c.db, a.i AS pa, b.i AS pb"
        "  FROM cand c JOIN grams a ON a.doc_id = c.da"
        "              JOIN grams b ON b.doc_id = c.db AND b.g = a.g"
        "), pos AS ("
        "  SELECT DISTINCT da, db, sd, p FROM ("
        "    SELECT da, db, da AS sd, pa AS p FROM m"
        "    UNION ALL"
        "    SELECT da, db, db AS sd, pb AS p FROM m)"
        "), w AS ("
        "  SELECT da, db, sd, p,"
        "    CASE WHEN p > COALESCE(MAX(p + 40) OVER ("
        "         PARTITION BY da, db, sd ORDER BY p"
        "         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)"
        "    THEN 1 ELSE 0 END AS brk"
        "  FROM pos"
        "), g2 AS ("
        "  SELECT da, db, sd, p,"
        "         SUM(brk) OVER (PARTITION BY da, db, sd ORDER BY p) AS grp"
        "  FROM w) "
        "SELECT da AS doc_a, db AS doc_b, sd AS span_doc,"
        "       MIN(p) - 1 AS start, MAX(p) + 39 AS \"end\" "
        "FROM g2 GROUP BY da, db, sd, grp"
    ),
    # brute-force Hamming<=3 over the md5-token 60-bit simhash; the Ray side
    # reaches the same set via Manku block candidates + exact verification
    "simhash_hamming_pairs": (
        "WITH toks AS ("
        "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
        "), h AS ("
        "  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks"
        "), bits AS ("
        "  SELECT doc_id, b, "
        "         SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v "
        "  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) "
        "  GROUP BY doc_id, b"
        "), sig AS ("
        "  SELECT doc_id, "
        "         CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)"
        "              AS BIGINT) AS s "
        "  FROM bits GROUP BY doc_id"
        ") "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming "
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.s, b.s)) <= 3"
    ),
    # LSH banding over the md5 minhash: 8 perms in 2 bands of 4; pairs share
    # >= 1 full band signature, n_bands counts how many
    "minhash_band_pairs": (
        "WITH toks AS ("
        "  SELECT doc_id, string_split(text, ' ') AS w FROM documents"
        "), g_all AS ("
        "  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g"
        "  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)"
        "), mh AS ("
        "  SELECT doc_id, p AS perm, "
        "         min(md5(CAST(p AS VARCHAR) || '|' || g)) AS m "
        "  FROM g_all CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS p) "
        "  GROUP BY doc_id, p"
        "), bands AS ("
        "  SELECT doc_id, perm // 4 AS band, "
        "         string_agg(m, '|' ORDER BY perm) AS sig "
        "  FROM mh GROUP BY doc_id, band"
        ") "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands "
        "FROM bands a JOIN bands b "
        "  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2"
    ),
    "ann_topk": (
        "SELECT query_id, neighbor_id, rnk FROM ("
        "  SELECT e1.vec_id AS query_id, e2.vec_id AS neighbor_id, "
        "         row_number() OVER (PARTITION BY e1.vec_id "
        "           ORDER BY list_cosine_similarity(e1.embedding, e2.embedding) DESC, "
        "                    e2.vec_id) AS rnk "
        "  FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id != e1.vec_id "
        "  WHERE e1.vec_id < 10) WHERE rnk <= 5"
    ),
}

from ..functions.text import _STOPWORDS as _SW

_SW_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang in sorted(_SW) for w in sorted(_SW[lang])
)
ORACLE_SQL["lang_id"] = (
    f"WITH sw(lang, w) AS (VALUES {_SW_VALUES}), "
    "toks AS ("
    "  SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents"
    "), hits AS ("
    "  SELECT t.doc_id, s.lang, COUNT(*) AS h"
    "  FROM toks t JOIN sw s ON t.w = s.w GROUP BY 1, 2"
    "), combos AS ("
    "  SELECT d.doc_id, l.lang FROM documents d"
    "  CROSS JOIN (SELECT DISTINCT lang FROM sw) l"
    "), scored AS ("
    "  SELECT c.doc_id, c.lang, COALESCE(h.h, 0) AS h"
    "  FROM combos c LEFT JOIN hits h ON c.doc_id = h.doc_id AND c.lang = h.lang"
    "), best AS ("
    "  SELECT doc_id, lang AS pred_lang, h AS stopword_hits,"
    "         row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang) AS rn"
    "  FROM scored"
    ") "
    "SELECT b.doc_id, b.pred_lang, b.stopword_hits, d.lang "
    "FROM best b JOIN documents d ON b.doc_id = d.doc_id WHERE b.rn = 1"
)

_SAMPLE_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{l}' THEN '{_rate_hex(r)}'" for l, r in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE '{_rate_hex(_SAMPLE_DEFAULT_RATE)}' END"
)
ORACLE_SQL["stratified_sample_oracle"] = (
    "SELECT doc_id, lang FROM documents "
    f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < {_SAMPLE_CASE}"
)
QUERIES["stratified_sample_oracle"] = q_stratified_sample_oracle
ORACLE_SQL["token_budget_select"] = (
    "WITH t AS ("
    "  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "         CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS s "
    "  FROM documents"
    "), w AS ("
    "  SELECT doc_id, n_tokens, "
    "         CAST(SUM(n_tokens) OVER (ORDER BY s DESC, doc_id "
    "           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens "
    "  FROM t) "
    "SELECT doc_id, n_tokens, cum_tokens FROM w "
    "WHERE cum_tokens <= (SELECT CAST(FLOOR(0.25 * SUM(n_tokens)) AS BIGINT) FROM t)"
)

ORACLE_SQL["repetition_stats"] = (
    "WITH d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents), "
    "g AS ("
    "  SELECT doc_id, n_chars, ws[i] || ' ' || ws[i+1] AS g"
    "  FROM d, UNNEST(range(1, len(ws))) AS t(i)"
    "), c AS ("
    "  SELECT doc_id, n_chars, g, COUNT(*) AS cnt, LENGTH(g) AS glen"
    "  FROM g GROUP BY ALL"
    "), r AS ("
    "  SELECT *, ROW_NUMBER() OVER ("
    "    PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn FROM c"
    ") "
    "SELECT doc_id, "
    "  MAX(CASE WHEN rn = 1 THEN g END) AS top_bigram, "
    "  MAX(CASE WHEN rn = 1 THEN cnt END) AS top_bigram_count, "
    "  MAX(CASE WHEN rn = 1 THEN CAST(cnt * glen AS DOUBLE) / n_chars END)"
    "    AS top_bigram_frac, "
    "  CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END) AS DOUBLE)"
    "    / ANY_VALUE(n_chars) AS dup_bigram_frac "
    "FROM r GROUP BY doc_id"
)

_DECON_EVAL_SQL = "('" + "','".join(_DECON_EVAL_SOURCES) + "')"
ORACLE_SQL["decontaminate"] = (
    "WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents), "
    "g AS ("
    "  SELECT doc_id, source, array_to_string(ws[i:i+7], ' ') AS g"
    "  FROM d, UNNEST(range(1, len(ws) - 6)) AS t(i)"
    "), ev AS (SELECT DISTINCT g FROM g WHERE source IN " + _DECON_EVAL_SQL + "), "
    "tr AS ("
    "  SELECT DISTINCT doc_id, g FROM g WHERE source NOT IN " + _DECON_EVAL_SQL
    + ") "
    "SELECT tr.doc_id AS doc_id, COUNT(*) AS n_shared "
    "FROM tr JOIN ev USING (g) GROUP BY 1"
)

# asymmetric containment over the df<=50 word-token space (cap mirrored
# from the Ray side's in-place annotate_bucket_size filter)
ORACLE_SQL["containment_pairs"] = (
    "WITH toks AS ("
    "  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok"
    "  FROM documents"
    "), dfs AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok), "
    "keep AS ("
    "  SELECT t.doc_id, t.tok FROM toks t JOIN dfs USING (tok)"
    "  WHERE dfs.df <= 50"
    "), sz AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id), "
    "c AS ("
    "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
    "  FROM keep a JOIN keep b USING (tok) WHERE a.doc_id < b.doc_id"
    "  GROUP BY 1, 2) "
    "SELECT da AS doc_a, db AS doc_b, common, "
    "       CAST(common AS DOUBLE) / LEAST(sa.n, sb.n) AS containment "
    "FROM c JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db "
    "WHERE CAST(common AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.5"
)

# inverted-index build over the df<=400 token space (the cap bounds ROW
# SIZE only — no pair fan-out here); postings as an ordered comma-joined
# string so the value hash is representation-stable
ORACLE_SQL["inverted_index"] = (
    "WITH toks AS ("
    "  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok"
    "  FROM documents"
    "), dfs AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok) "
    "SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS df, "
    "       string_agg(t.doc_id, ',' ORDER BY t.doc_id) AS postings "
    "FROM toks t JOIN dfs USING (tok) WHERE dfs.df <= 400 "
    "GROUP BY t.tok"
)

# per-doc top-k lexical neighbours over the df<=50 candidate space;
# deterministic ties (jaccard DESC, neighbor ASC) on bitwise-equal doubles
ORACLE_SQL["jaccard_knn"] = (
    "WITH toks AS ("
    "  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok"
    "  FROM documents"
    "), dfs AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok), "
    "keep AS ("
    "  SELECT t.doc_id, t.tok FROM toks t JOIN dfs USING (tok)"
    "  WHERE dfs.df <= 50"
    "), sz AS (SELECT doc_id, COUNT(*) AS n FROM keep GROUP BY doc_id), "
    "c AS ("
    "  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS common"
    "  FROM keep a JOIN keep b USING (tok) WHERE a.doc_id < b.doc_id"
    "  GROUP BY 1, 2"
    "), j AS ("
    "  SELECT da, db, common,"
    "         CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard"
    "  FROM c JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db"
    "), bi AS ("
    "  SELECT da AS doc_id, db AS neighbor_id, common, jaccard FROM j"
    "  UNION ALL"
    "  SELECT db, da, common, jaccard FROM j"
    "), r AS ("
    "  SELECT doc_id, neighbor_id, common, jaccard,"
    "         row_number() OVER (PARTITION BY doc_id"
    "                            ORDER BY jaccard DESC, neighbor_id) AS rnk"
    "  FROM bi) "
    "SELECT doc_id, neighbor_id, common, jaccard, rnk FROM r WHERE rnk <= 3"
)

# weighted (bag) jaccard: sum-min / (N_a + N_b - sum-min); candidates from
# the df<=50 distinct-token join, min-sum over ALL shared tokens
ORACLE_SQL["weighted_jaccard_pairs"] = (
    "WITH toksm AS ("
    "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    "), tf AS ("
    "  SELECT doc_id, tok, COUNT(*) AS tf FROM toksm GROUP BY 1, 2"
    "), n AS (SELECT doc_id, COUNT(*) AS n FROM toksm GROUP BY 1), "
    "dfs AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok), "
    "keep AS ("
    "  SELECT t.doc_id, t.tok FROM tf t JOIN dfs USING (tok)"
    "  WHERE dfs.df <= 50"
    "), cand AS ("
    "  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db"
    "  FROM keep a JOIN keep b USING (tok) WHERE a.doc_id < b.doc_id"
    "), inter AS ("
    "  SELECT c.da, c.db, CAST(SUM(LEAST(ta.tf, tb.tf)) AS BIGINT) AS common"
    "  FROM cand c JOIN tf ta ON ta.doc_id = c.da"
    "              JOIN tf tb ON tb.doc_id = c.db AND tb.tok = ta.tok"
    "  GROUP BY 1, 2) "
    "SELECT da AS doc_a, db AS doc_b, common, "
    "       CAST(common AS DOUBLE) / (na.n + nb.n - common) AS wjaccard "
    "FROM inter JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db "
    "WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= 0.3"
)

# contamination fraction: same gram CTEs; LEFT JOIN so unshared train docs
# appear with n_shared = 0; COUNT() keeps both counters BIGINT
ORACLE_SQL["contamination_score"] = (
    "WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents), "
    "g AS ("
    "  SELECT doc_id, source, array_to_string(ws[i:i+7], ' ') AS g"
    "  FROM d, UNNEST(range(1, len(ws) - 6)) AS t(i)"
    "), ev AS (SELECT DISTINCT g FROM g WHERE source IN " + _DECON_EVAL_SQL + "), "
    "tr AS ("
    "  SELECT DISTINCT doc_id, g FROM g WHERE source NOT IN " + _DECON_EVAL_SQL
    + "), cnt AS ("
    "  SELECT tr.doc_id, COUNT(*) AS n_grams, COUNT(ev.g) AS n_shared"
    "  FROM tr LEFT JOIN ev USING (g) GROUP BY 1) "
    "SELECT doc_id, n_grams, n_shared, "
    "       CAST(n_shared AS DOUBLE) / n_grams AS contamination FROM cnt"
)

# per-doc duplicated-char fraction: union of matched 40-gram windows against
# the doc's capped candidate partners ("{CAND}" = winnow-fingerprint bucket
# cap 64, spliced after the sqlhash import), merged with the cumulative-max
# island window; docs without dup spans surface through the LEFT JOIN with
# coverage 0
ORACLE_SQL["dup_span_coverage"] = (
    "WITH {CAND},"
    "grams AS ("
    "  SELECT doc_id, i, substr(text, i, 40) AS g"
    "  FROM documents, UNNEST(generate_series(1, length(text) - 39)) AS t(i)"
    "), m AS ("
    "  SELECT c.da, c.db, a.i AS p_a, b.i AS p_b"
    "  FROM cand c JOIN grams a ON a.doc_id = c.da"
    "              JOIN grams b ON b.doc_id = c.db AND b.g = a.g"
    "), pos AS ("
    "  SELECT DISTINCT dd, p FROM ("
    "    SELECT da AS dd, p_a AS p FROM m"
    "    UNION ALL SELECT db, p_b FROM m)"
    "), w AS ("
    "  SELECT dd, p,"
    "    CASE WHEN p > COALESCE(MAX(p + 40) OVER ("
    "         PARTITION BY dd ORDER BY p"
    "         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)"
    "    THEN 1 ELSE 0 END AS brk"
    "  FROM pos"
    "), g2 AS ("
    "  SELECT dd, p, SUM(brk) OVER (PARTITION BY dd ORDER BY p) AS grp FROM w"
    "), sp AS ("
    "  SELECT dd, MIN(p) - 1 AS s, MAX(p) + 39 AS e FROM g2 GROUP BY dd, grp"
    "), cov AS (SELECT dd, SUM(e - s) AS covered FROM sp GROUP BY dd) "
    "SELECT doc.doc_id, length(doc.text) AS n_chars, "
    "       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered, "
    "       CASE WHEN length(doc.text) > 0 "
    "            THEN CAST(COALESCE(c.covered, 0) AS DOUBLE) / length(doc.text) "
    "            ELSE 0.0 END AS coverage "
    "FROM documents doc LEFT JOIN cov c ON c.dd = doc.doc_id"
)


# --------------------------------------------------------------------------
# curation queries (pipelines/curate.py): deduplicated-corpus output,
# CCNet-style segment dedup, Bloom-gated incremental dedup, top-k n-grams,
# PII redaction
# --------------------------------------------------------------------------
from .curate import CURATE_QUERIES, CURATE_SQL  # noqa: E402

QUERIES.update(CURATE_QUERIES)
ORACLE_SQL.update(CURATE_SQL)
# near_dup_dedup shares the clusters-oracle connected-components CTE; only
# the final SELECT differs (kept docs = not a non-representative node).
_cc_sql = ORACLE_SQL["near_dup_clusters_oracle"]
ORACLE_SQL["near_dup_dedup"] = _cc_sql[: _cc_sql.rindex("SELECT 'doc://'")] + (
    "SELECT d.doc_id, d.lang FROM documents d WHERE d.doc_id NOT IN "
    "(SELECT n FROM reach GROUP BY n HAVING MIN(l) <> n)"
)
# near_dup_keep_longest: same components, representative = argmax(n_chars,
# tie -> min doc_id) per cluster instead of min doc_id
ORACLE_SQL["near_dup_keep_longest"] = _cc_sql[
    : _cc_sql.rindex("SELECT 'doc://'")
] + (
    ", memb AS (SELECT n AS doc_id, MIN(l) AS cl FROM reach GROUP BY n), "
    "rk AS ("
    "  SELECT m.doc_id,"
    "         row_number() OVER (PARTITION BY m.cl"
    "                            ORDER BY d.n_chars DESC, m.doc_id) AS r"
    "  FROM memb m JOIN documents d USING (doc_id)"
    ") "
    "SELECT d.doc_id, d.n_chars FROM documents d "
    "WHERE d.doc_id NOT IN (SELECT doc_id FROM rk WHERE r > 1)"
)


def q_events_sliding(sf_dir: str):
    """Sliding-window aggregate (the streaming-window operator family's
    second member next to the tumbling ``events_hourly``): per event_type
    per hour bucket, the event count of the trailing 3-hour window
    (current + 2 preceding hour buckets).

    Physical plan: ONE sorted aggregation to per-(type, hour) buckets, then
    a per-block vectorised windowed scan over the bucket table sorted by
    (type, hour) — interior type-groups are complete within their block
    (sorted), the <=2 groups per block touching a block edge ship whole to
    a tiny driver heal (the annotate_bucket_size invariant).  The window
    needs only each group's own rows, so nothing global is ever held."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import ds_from_refs, split_boundary

    ds = _read_mat(sf_dir, "events", columns=["ts", "event_type"])
    HOUR = 3_600_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "h": pa.array(ts // HOUR, type=pa.int64()),
            }
        )

    buckets = sorted_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "h"],
        {"n_events": ("h", "count")},
        empty_types=dict(event_type=pa.string(), h=pa.int64(), n_events=pa.int64()),
    )
    s = buckets.sort(["event_type", "h"])

    def _window(h: np.ndarray, n: np.ndarray) -> np.ndarray:
        # h ascending within one group; trailing [h-2, h] bucket sum
        cs = np.cumsum(n)
        left = np.searchsorted(h, h - 2, side="left")
        return cs - np.where(left > 0, cs[left - 1], 0)

    def slide(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_3h": pa.array([], pa.int64()),
                "_boundary": pa.array([], pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        et = batch.column("event_type")
        et = et.combine_chunks() if et.num_chunks != 1 else et.chunk(0)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = batch.column("n_events").to_numpy(zero_copy_only=False)
        m = batch.num_rows
        neq = (
            pc.not_equal(et.slice(1), et.slice(0, m - 1)).to_numpy(
                zero_copy_only=False
            )
            if m > 1
            else np.empty(0, dtype=bool)
        )
        starts = np.flatnonzero(np.r_[True, neq])
        ends = np.r_[starts[1:], m]
        bnd = (
            pc.equal(et, et[0]).to_numpy(zero_copy_only=False)
            | pc.equal(et, et[m - 1]).to_numpy(zero_copy_only=False)
        )
        n3 = np.zeros(m, dtype=np.int64)
        for a, b in zip(starts, ends):
            if not bnd[a]:
                n3[a:b] = _window(h[a:b], n[a:b])
        return pa.table(
            {
                "event_type": et,
                "h": batch.column("h"),
                "n_events": batch.column("n_events"),
                "n_3h": pa.array(n3, type=pa.int64()),
                "_boundary": pa.array(bnd),
            }
        )

    part = s.map_batches(
        slide, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        et = np.asarray(boundary.column("event_type").to_pylist(), dtype=object)
        h = boundary.column("h").to_numpy(zero_copy_only=False)
        n = boundary.column("n_events").to_numpy(zero_copy_only=False)
        order = np.lexsort((h, et))
        et, h, n = et[order], h[order], n[order]
        n3 = np.zeros(len(h), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(h)]
        for a, b in zip(starts, ends):
            n3[a:b] = _window(h[a:b], n[a:b])
        healed = pa.table(
            {
                "event_type": pa.array(et.tolist(), type=pa.string()),
                "h": pa.array(h, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "n_3h": pa.array(n3, type=pa.int64()),
            }
        )
        int_refs = int_refs + [ray.put(healed)]
        n_int += healed.num_rows
    out = ds_from_refs(
        int_refs, count=n_int, event_type=pa.string(), h=pa.int64(),
        n_events=pa.int64(), n_3h=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": pc.multiply(
                    batch.column("h"), pa.scalar(3_600_000_000, pa.int64())
                ).cast(pa.timestamp("us")),
                "n_events": batch.column("n_events"),
                "n_3h": batch.column("n_3h"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


QUERIES["events_sliding"] = q_events_sliding
ORACLE_SQL["events_sliding"] = (
    "WITH b AS ("
    "  SELECT event_type, epoch_us(ts) // 3600000000 AS h, "
    "         CAST(COUNT(*) AS BIGINT) AS n_events "
    "  FROM events GROUP BY 1, 2"
    ") "
    "SELECT event_type, make_timestamp(h * 3600000000) AS window_start, "
    "       n_events, "
    "       CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY h "
    "            RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3h "
    "FROM b"
)

def q_events_latest(sf_dir: str):
    """Latest event per user — the keep-latest-snapshot operator of a crawl
    corpus (per-url argmax over warc_ts; reference analogue: the newest
    assembly wins, dedup.py skip-if-exists semantics generalised to rows).

    Physical shape: ONE range sort by user_id for block locality, then a
    per-block vectorised argmax over (ts, event_id) per user; argmax is
    associative, so boundary users also reduce to one row per block and the
    driver heal input is O(blocks), never O(rows)."""
    import ray

    from ..util import ds_from_refs, split_boundary

    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def to_micros(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    s = ds.map_batches(to_micros, batch_format="pyarrow").sort("user_id")

    def _argmax_per_user(u: np.ndarray, t: np.ndarray, e: np.ndarray):
        """Rows in ANY order -> one (u, max ts, max event_id @ max ts) each."""
        if len(u) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        order = np.lexsort((e, t, u))
        u, t, e = u[order], t[order], e[order]
        last = np.r_[u[1:] != u[:-1], True]
        return u[last], t[last], e[last]

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        e = batch.column("event_id").to_numpy(zero_copy_only=False)
        # sorted by user_id => min/max user may straddle block edges
        bnd_mask = (u == u.min()) | (u == u.max())
        iu, it, ie = _argmax_per_user(u[~bnd_mask], t[~bnd_mask], e[~bnd_mask])
        bu, bt, be = _argmax_per_user(u[bnd_mask], t[bnd_mask], e[bnd_mask])
        n_i, n_b = len(iu), len(bu)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([iu, bu])),
                "ts": pa.array(np.concatenate([it, bt])),
                "event_id": pa.array(np.concatenate([ie, be])),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        hu, ht, he = _argmax_per_user(
            boundary.column("user_id").to_numpy(zero_copy_only=False),
            boundary.column("ts").to_numpy(zero_copy_only=False),
            boundary.column("event_id").to_numpy(zero_copy_only=False),
        )
        int_refs = int_refs + [
            ray.put(
                pa.table(
                    {
                        "user_id": pa.array(hu),
                        "ts": pa.array(ht),
                        "event_id": pa.array(he),
                    }
                )
            )
        ]
        n_int += len(hu)
    out = ds_from_refs(
        int_refs, count=n_int,
        user_id=pa.int64(), ts=pa.int64(), event_id=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "last_ts": batch.column("ts").cast(pa.timestamp("us")),
                "last_event_id": batch.column("event_id"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


QUERIES["events_latest"] = q_events_latest
ORACLE_SQL["events_latest"] = (
    "SELECT user_id, ts AS last_ts, event_id AS last_event_id FROM ("
    "  SELECT user_id, ts, event_id, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn"
    "  FROM events) WHERE rn = 1"
)


def q_orders_by_segment(sf_dir: str, *, _broadcast_row_gate: int | None = None):
    """Two-table join + aggregate (orders x customer by market segment) —
    the engine's general relational-join surface next to the dedup-centric
    joins (J1-J4).  Small side broadcast with the repo's standard row+byte
    gate; above the gate it falls back to the distributed hash join.  Float
    output is MAX only (order-independent), so values match DuckDB bitwise."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    cfg = DedupConfig()
    cust = _read_mat(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read_mat(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    n_cust = cust.count()
    cust_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, cust)))
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )
    if n_cust <= row_gate and cust_bytes <= cfg.broadcast_bytes_limit:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("c_custkey").to_numpy(zero_copy_only=False),
                    np.asarray(b.column("c_mktsegment").to_pylist(), dtype=object),
                ),
                cust,
            )
        )
        keys = (
            np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        )
        segs = (
            np.concatenate([p[1] for p in parts])
            if parts
            else np.empty(0, dtype=object)
        )
        order = np.argsort(keys, kind="stable")
        lut_ref = ray.put((keys[order], segs[order]))

        # per-block partials: (segment, n, max_price); |segments| is tiny so
        # the driver merge is O(blocks x segments), never O(orders)
        def part_fn(b: pa.Table):
            k_s, s_s = ray.get(lut_ref)
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
            price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
            if len(k_s) == 0 or len(ck) == 0:
                return (
                    np.empty(0, dtype=object),
                    np.empty(0, np.int64),
                    np.empty(0, np.float64),
                )
            pos = np.searchsorted(k_s, ck)
            pos_c = np.minimum(pos, len(k_s) - 1)
            hit = k_s[pos_c] == ck
            seg = s_s[pos_c[hit]]
            price = price[hit]
            ul, inv = np.unique(seg, return_inverse=True)
            cnt = np.bincount(inv)
            mx = np.full(len(ul), -np.inf)
            np.maximum.at(mx, inv, price)
            return ul, cnt.astype(np.int64), mx

        acc: dict = {}
        for ul, cnt, mx in ray.get(map_blocks(part_fn, orders)):
            for sname, c, m in zip(ul, cnt, mx):
                a = acc.setdefault(sname, [0, -np.inf])
                a[0] += int(c)
                a[1] = max(a[1], float(m))
        segs_out = sorted(acc)
        return pa.table(
            {
                "c_mktsegment": pa.array(segs_out, type=pa.string()),
                "n_orders": pa.array([acc[s][0] for s in segs_out], type=pa.int64()),
                "max_price": pa.array([acc[s][1] for s in segs_out], type=pa.float64()),
            }
        )
    # 100-TB path: distributed hash join, then a tiny sorted aggregation
    o_side = orders.map_batches(
        lambda b: pa.table(
            {"k": b.column("o_custkey"), "o_totalprice": b.column("o_totalprice")}
        ),
        batch_format="pyarrow",
    )
    c_side = cust.map_batches(
        lambda b: pa.table(
            {"k": b.column("c_custkey"), "c_mktsegment": b.column("c_mktsegment")}
        ),
        batch_format="pyarrow",
    )
    joined = o_side.join(
        c_side, "inner", num_partitions=cfg.join_partitions(), on=("k",)
    )
    return sorted_aggregate(
        joined,
        ["c_mktsegment"],
        {
            "n_orders": ("c_mktsegment", "count"),
            "max_price": ("o_totalprice", "max"),
        },
        empty_types=dict(
            c_mktsegment=pa.string(), n_orders=pa.int64(), max_price=pa.float64()
        ),
    )


QUERIES["orders_by_segment"] = q_orders_by_segment
ORACLE_SQL["orders_by_segment"] = (
    "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "       MAX(o_totalprice) AS max_price "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "GROUP BY c_mktsegment"
)


def q_lm_familiarity(sf_dir: str):
    """Corpus-LM quality signal: train a character-trigram frequency model
    over the whole corpus, then score every document by the summed global
    frequency of its own trigram occurrences (an integer perplexity proxy —
    boilerplate scores high, gibberish low).  The train-then-score shape of
    an n-gram LM quality filter, kept in exact integers so DuckDB matches
    bitwise.

    Physical plan: vectorised per-block trigram explosion (one utf-32
    codepoint array per batch, packed 3x21-bit keys), then
    ``annotate_bucket_size`` attaches each trigram's GLOBAL occurrence count
    without a join (one sort + per-block bucket scan + O(blocks) heal), then
    one sorted aggregation by doc_id.  No driver-side state beyond the
    boundary heals."""
    from ..stages.bucketjoin import annotate_bucket_size
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if not texts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "g": pa.array([], type=pa.int64()),
                }
            )
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        codes = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        codes = codes.astype(np.int64)
        # valid trigram starts: within-doc offsets 0..len-3
        n_tri = np.maximum(lens - 2, 0)
        doc_of = np.repeat(np.arange(len(texts)), n_tri)
        starts = np.repeat(np.cumsum(lens) - lens, n_tri)
        local = np.arange(len(doc_of)) - np.repeat(
            np.cumsum(n_tri) - n_tri, n_tri
        )
        i = starts + local
        g = (codes[i] << 42) | (codes[i + 1] << 21) | codes[i + 2]
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of], type=pa.int64()),
                "g": pa.array(g, type=pa.int64()),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow")
    marked = annotate_bucket_size(rows, "g", out_col="c")
    return sorted_aggregate(
        marked.select_columns(["doc_id", "c"]),
        ["doc_id"],
        {"familiarity": ("c", "sum")},
        empty_types=dict(doc_id=pa.int64(), familiarity=pa.int64()),
    )


QUERIES["lm_familiarity"] = q_lm_familiarity
ORACLE_SQL["lm_familiarity"] = (
    "WITH tris AS ("
    "  SELECT doc_id, substr(text, i, 3) AS g"
    "  FROM documents, UNNEST(generate_series(1, length(text) - 2)) AS t(i)"
    "), cnt AS (SELECT g, COUNT(*) AS c FROM tris GROUP BY g) "
    "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS familiarity "
    "FROM tris JOIN cnt USING (g) GROUP BY doc_id"
)


def q_embedding_kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd's k-means cluster assignment over the embeddings
    table — the clustering step of embedding-space curation (diversity
    sampling, semantic dedup bucketing).  Iterative, so no SQL oracle;
    deterministic (seeded by the k smallest vec_ids), value-pinned in
    tests/test_rows_only_pins.py."""
    from ..functions.embed import kmeans_assign

    ds = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=k, iters=iters)


QUERIES["embedding_kmeans"] = q_embedding_kmeans


def q_embedding_kmeans_oracle(sf_dir: str, quant: int = 1024):
    """Fixed-point face of the Lloyd's assign+reduce shape (the iterative
    float production q_embedding_kmeans stays rows-only and value-pinned):
    vectors are integer-quantised (floor(x*quant + 0.5), the rademacher-LSH
    convention), the two lowest-vec_id vectors seed k=2, assignment is by
    EXACT int64 squared distance (tie -> cluster 0), and the output is the
    per-(cluster, dim) integer coordinate sum plus member count — exactly
    the partial-sum exchange one production k-means iteration runs, with
    every arithmetic step replayable bitwise in DuckDB.  Oracle fixture:
    the two-seed pull is a sort+limit (O(1) driver rows)."""
    from ..functions.embed import _emb_matrix
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    seed_rows = ds.sort("vec_id").limit(2).take_all()
    empty = pa.table(
        {
            "c": pa.array([], pa.int64()), "d": pa.array([], pa.int64()),
            "sum_q": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
        }
    )
    if len(seed_rows) < 2:
        return empty
    seeds = np.floor(
        np.asarray([r["embedding"] for r in seed_rows], dtype=np.float64)
        * quant + 0.5
    ).astype(np.int64)  # (2, dim)
    dim = seeds.shape[1]

    def assign(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if len(ids) == 0:
            return empty
        q = np.floor(m.astype(np.float64) * quant + 0.5).astype(np.int64)
        d0 = ((q - seeds[0]) ** 2).sum(axis=1)
        d1 = ((q - seeds[1]) ** 2).sum(axis=1)
        c = (d1 < d0).astype(np.int64)  # tie -> cluster 0
        key = np.repeat(c, dim) * dim + np.tile(
            np.arange(dim, dtype=np.int64), len(ids)
        )
        sums = np.zeros(2 * dim, dtype=np.int64)
        np.add.at(sums, key, q.ravel())
        cnt = np.zeros(2, dtype=np.int64)
        np.add.at(cnt, c, 1)
        kk = np.arange(2 * dim, dtype=np.int64)
        return pa.table(
            {
                "c": pa.array(kk // dim),
                "d": pa.array(kk % dim),
                "sum_q": pa.array(sums),
                "n": pa.array(cnt[kk // dim]),
            }
        )

    agg = sorted_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["c", "d"],
        {"sum_q": ("sum_q", "sum"), "n": ("n", "sum")},
        empty_types=dict(c=pa.int64(), d=pa.int64(), sum_q=pa.int64(),
                         n=pa.int64()),
    )
    # SQL GROUP BY emits only non-empty clusters; drop the n=0 padding rows
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 0)),
        batch_format="pyarrow",
    )


QUERIES["embedding_kmeans_oracle"] = q_embedding_kmeans_oracle
ORACLE_SQL["embedding_kmeans_oracle"] = """
WITH v AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS d
  FROM embeddings
), q AS (
  SELECT vec_id, d,
         CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT) AS qv
  FROM v
), m0 AS (SELECT MIN(vec_id) AS s FROM embeddings),
m1 AS (SELECT MIN(vec_id) AS s FROM embeddings
       WHERE vec_id > (SELECT s FROM m0)),
s0 AS (SELECT d, qv AS v0 FROM q WHERE vec_id = (SELECT s FROM m0)),
s1 AS (SELECT d, qv AS v1 FROM q WHERE vec_id = (SELECT s FROM m1)),
dist AS (
  SELECT q.vec_id,
         SUM((q.qv - s0.v0) * (q.qv - s0.v0)) AS d0,
         SUM((q.qv - s1.v1) * (q.qv - s1.v1)) AS d1
  FROM q JOIN s0 USING (d) JOIN s1 USING (d) GROUP BY 1
), asg AS (
  SELECT vec_id, CASE WHEN d1 < d0 THEN 1 ELSE 0 END AS c FROM dist
)
SELECT a.c, q.d, CAST(SUM(q.qv) AS BIGINT) AS sum_q, COUNT(*) AS n
FROM q JOIN asg a USING (vec_id) GROUP BY 1, 2
"""


def q_multimodal_resize(sf_dir: str):
    """REAL image-resize plumbing: doc-varying P6 PPM payloads (w=4+id%5,
    h=3+id%4, pixels = text bytes) decoded by the strict PPM parser and
    nearest-neighbour-resized to 4x3 in an actor pool (binary in, binary
    out).  DuckDB recomputes the resize's gather arithmetic from the text
    bytes (to_hex surgery), so a header-parse, index-math or padding bug
    breaks the hash."""
    from ..functions.multimodal import ImageResizer

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def to_ppm(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        payloads = []
        for i, t in zip(ids.tolist(), texts):
            w = 4 + i % 5
            h = 3 + i % 4
            header = f"P6\n{w} {h}\n255\n".encode()
            payloads.append(header + t.encode()[: w * h * 3].ljust(w * h * 3, b"\0"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    out = ds.map_batches(to_ppm, batch_format="pyarrow").map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": 4, "out_h": 3},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )
    return out.select_columns(["doc_id", "width", "height", "px_sum"])


QUERIES["multimodal_resize"] = q_multimodal_resize
ORACLE_SQL["multimodal_resize"] = (
    "WITH base AS ("
    "  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,"
    "         to_hex(encode(text)) AS hx, octet_length(encode(text)) AS nb"
    "  FROM documents"
    "), px AS ("
    "  SELECT doc_id, hx, nb,"
    "         (((yy.y * h) // 3) * w + ((xx.x * w) // 4)) * 3 + cc.c AS p"
    "  FROM base,"
    "       UNNEST(generate_series(0, 2)) AS yy(y),"
    "       UNNEST(generate_series(0, 3)) AS xx(x),"
    "       UNNEST(generate_series(0, 2)) AS cc(c)"
    "), vals AS ("
    "  SELECT doc_id, CASE WHEN p < nb"
    "         THEN ('0x' || substr(hx, 2*p + 1, 2))::BIGINT ELSE 0 END AS v"
    "  FROM px) "
    "SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height, "
    "       CAST(SUM(v) AS BIGINT) AS px_sum "
    "FROM vals GROUP BY doc_id"
)


def q_multimodal_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing over a parseable container
    (concatenated-P6 motion-PPM; real mp4/webm decode is stubbed behind
    NotImplementedError): each doc gets 2 + id%3 frames of 4x3 built from
    consecutive 36-byte text slices, the actor pool keeps every 2nd frame
    and emits one row per kept frame.  DuckDB recomputes the kept frames'
    byte sums from the text (to_hex surgery)."""
    from ..functions.multimodal import FrameSampler

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    W, H = 4, 3
    FRAME = W * H * 3

    def to_stream(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        header = f"P6\n{W} {H}\n255\n".encode()
        payloads = []
        for i, t in zip(ids.tolist(), texts):
            nf = 2 + i % 3
            raw = t.encode()
            payloads.append(
                b"".join(
                    header + raw[f * FRAME : (f + 1) * FRAME].ljust(FRAME, b"\0")
                    for f in range(nf)
                )
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return ds.map_batches(to_stream, batch_format="pyarrow").map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every": 2},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


QUERIES["multimodal_frame_sample"] = q_multimodal_frame_sample
ORACLE_SQL["multimodal_frame_sample"] = (
    "WITH base AS ("
    "  SELECT doc_id, 2 + doc_id % 3 AS nf,"
    "         to_hex(encode(text)) AS hx, octet_length(encode(text)) AS nb"
    "  FROM documents"
    "), frames AS ("
    "  SELECT doc_id, ff.f AS frame_idx, hx, nb"
    "  FROM base, UNNEST(generate_series(0, nf - 1)) AS ff(f)"
    "  WHERE ff.f % 2 = 0"
    "), vals AS ("
    "  SELECT doc_id, frame_idx, CASE WHEN frame_idx * 36 + ii.i < nb"
    "         THEN ('0x' || substr(hx, 2*(frame_idx * 36 + ii.i) + 1, 2))::BIGINT"
    "         ELSE 0 END AS v"
    "  FROM frames, UNNEST(generate_series(0, 35)) AS ii(i)) "
    "SELECT doc_id, frame_idx, CAST(4 AS BIGINT) AS width, "
    "       CAST(3 AS BIGINT) AS height, CAST(SUM(v) AS BIGINT) AS px_sum "
    "FROM vals GROUP BY doc_id, frame_idx"
)


def q_distinct_tokens_kmv(sf_dir: str, k: int = 256):
    """Approximate global distinct-token count via a KMV / bottom-k sketch
    (Beyer et al. SIGMOD'07) — THE mergeable-cardinality primitive of a
    100-TB pipeline (vocabulary size, distinct-URL counts) where an exact
    global distinct is a full shuffle.  Per-block bottom-k partials run as
    raw tasks; the driver merge is O(blocks x k) integers, never O(rows).

    Oracle fixture face: md5 is the hash contract with DuckDB (same as the
    md5 minhash/simhash family — not the scale hash; the production path is
    q_distinct_shingles_kmv on splitmix64).  The estimate is integer order
    statistics + one IEEE multiply + divide, so DuckDB matches bitwise."""
    import hashlib

    import ray

    from ..util import map_blocks
    from ..functions.sketch import block_bottom_k, bottom_k_merge, kmv_estimate

    ds = _read_mat(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table):
        # Arrow-kernel tokenise + distinct; the per-DISTINCT-token md5 loop
        # is the DuckDB oracle contract (fixture hash, not the scale path)
        toks = pc.unique(
            pc.list_flatten(pc.split_pattern(b.column("text"), pattern=" "))
        ).to_pylist()
        hv = np.array(
            [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in toks],
            dtype=np.uint64,
        )
        return block_bottom_k(hv, 256 if k < 256 else k)

    parts = ray.get(map_blocks(part, ds))
    bottom = bottom_k_merge(parts, k)
    k_used, kth, est = kmv_estimate(bottom, k, hash_bits=60)
    return pa.table(
        {
            "k": pa.array([k_used], type=pa.int64()),
            "kth_hash": pa.array([kth], type=pa.int64()),
            "estimate": pa.array([est], type=pa.float64()),
        }
    )


QUERIES["distinct_tokens_kmv"] = q_distinct_tokens_kmv
ORACLE_SQL["distinct_tokens_kmv"] = (
    "WITH toks AS ("
    "  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents"
    "), h AS ("
    "  SELECT DISTINCT ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM toks"
    "), bot AS (SELECT hv FROM h ORDER BY hv LIMIT 256) "
    "SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(hv) AS BIGINT) AS kth_hash, "
    "       CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE) "
    "            ELSE (CAST(COUNT(*) - 1 AS DOUBLE) * 1152921504606846976.0)"
    "                   / CAST(MAX(hv) AS DOUBLE) END AS estimate "
    "FROM bot"
)


def q_distinct_shingles_kmv(sf_dir: str, k: int = 256):
    """Production face of the KMV sketch: distinct char-17-shingle (the
    flagship's token) cardinality under the engine's own vectorised rolling
    hash (hashing.shingle_hashes, splitmix64 family) — no per-token Python.
    DuckDB oracle: sqlhash.kmv_select replays the mod-2**64 hash bitwise."""
    import ray

    from ..hashing import shingle_hashes
    from ..util import map_blocks
    from ..functions.sketch import block_bottom_k, bottom_k_merge, kmv_estimate

    ds = _read_mat(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table):
        hs = [shingle_hashes(t, 17) for t in b.column("text").to_pylist()]
        hv = np.concatenate(hs) if hs else np.empty(0, dtype=np.int64)
        return block_bottom_k(hv, k)

    parts = ray.get(map_blocks(part, ds))
    bottom = bottom_k_merge(parts, k)
    # shingle_hashes is the engine's 63-bit wire format (hashing.to_i63)
    k_used, kth, est = kmv_estimate(bottom, k, hash_bits=63)
    return pa.table(
        {
            "k": pa.array([k_used], type=pa.int64()),
            "kth_hash": pa.array([kth], type=pa.int64()),
            "estimate": pa.array([est], type=pa.float64()),
        }
    )


QUERIES["distinct_shingles_kmv"] = q_distinct_shingles_kmv


def q_events_user_counts(sf_dir: str):
    """Exact per-group COUNT(DISTINCT): distinct users + total events per
    event_type.  Physical plan: one sorted aggregation to (event_type,
    user_id) partial rows (the dedupe), then a second tiny sorted
    aggregation per event_type — distinct-count as two ordered exchanges,
    no driver state."""
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = sorted_aggregate(
        ds,
        ["event_type", "user_id"],
        {"n_events": ("user_id", "count")},
        empty_types=dict(
            event_type=pa.string(), user_id=pa.int64(), n_events=pa.int64()
        ),
    )
    return sorted_aggregate(
        pairs,
        ["event_type"],
        {"n_users": ("user_id", "count"), "n_events": ("n_events", "sum")},
        empty_types=dict(
            event_type=pa.string(), n_users=pa.int64(), n_events=pa.int64()
        ),
    )


QUERIES["events_user_counts"] = q_events_user_counts
ORACLE_SQL["events_user_counts"] = (
    "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
    "       CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY event_type"
)


def q_frequent_tokens(sf_dir: str, m: int = 4095, denom: int = 1000):
    """Guaranteed heavy hitters WITHOUT a shuffle: classic two-pass
    Misra-Gries.  Pass 1: per-block exact counts reduced to an MG summary of
    m counters (raw tasks), driver merge of O(blocks x m) counters — total
    undercount <= N/(m+1), so every token with true count >= T =
    max(2, N//denom) survives as a candidate (N//(m+1) < N//denom).  Pass 2:
    broadcast the <=m candidates, per-block EXACT counts of candidates only,
    driver sum, filter >= T.  Output is therefore exact and SQL-checkable —
    while the dataflow never groups the full token stream (the 100-TB
    alternative to top_ngrams' combine+exchange when only hot keys matter)."""
    import ray

    from ..functions.sketch import mg_from_counts, mg_merge
    from ..util import map_blocks

    assert denom < m + 1, "recall guarantee needs N/(m+1) < N/denom"
    ds = _read_mat(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table):
        # Arrow-kernel tokenise + count: split_pattern -> flatten ->
        # value_counts, all C++; no per-doc Python loop
        flat = pc.list_flatten(pc.split_pattern(b.column("text"), pattern=" "))
        if len(flat) == 0:
            return (np.empty(0, dtype=object), np.empty(0, np.int64), 0)
        vc = pc.value_counts(flat)
        uk = np.asarray(vc.field("values").to_pylist(), dtype=object)
        cnt = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        k, c = mg_from_counts(uk, cnt, m)
        return k, c, int(cnt.sum())

    parts = ray.get(map_blocks(part, ds))
    n_total = sum(p[2] for p in parts)
    cand, _ = mg_merge([(p[0], p[1]) for p in parts], m)
    thresh = max(2, n_total // denom)
    if len(cand) == 0:
        return pa.table(
            {
                "w": pa.array([], type=pa.string()),
                "n_occurrences": pa.array([], type=pa.int64()),
            }
        )
    cand_ref = ray.put(np.sort(cand))

    def exact(b: pa.Table):
        cs = ray.get(cand_ref)
        flat = pc.list_flatten(pc.split_pattern(b.column("text"), pattern=" "))
        # index_in against the candidate set: one C++ hash probe per token
        idx = pc.index_in(flat, value_set=pa.array(cs.tolist(), type=pa.string()))
        iv = pc.drop_null(idx).to_numpy(zero_copy_only=False).astype(np.int64)
        return np.bincount(iv, minlength=len(cs)).astype(np.int64)

    counts = sum(ray.get(map_blocks(exact, ds)))
    cs = np.sort(cand)
    keep = counts >= thresh
    order = np.argsort(cs[keep], kind="stable")
    return pa.table(
        {
            "w": pa.array(cs[keep][order].tolist(), type=pa.string()),
            "n_occurrences": pa.array(counts[keep][order], type=pa.int64()),
        }
    )


QUERIES["frequent_tokens"] = q_frequent_tokens
ORACLE_SQL["frequent_tokens"] = (
    "WITH toks AS ("
    "  SELECT unnest(string_split(text, ' ')) AS w FROM documents"
    "), tot AS (SELECT COUNT(*) AS n FROM toks) "
    "SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occurrences "
    "FROM toks GROUP BY w "
    "HAVING COUNT(*) >= GREATEST(2, (SELECT n // 1000 FROM tot))"
)


def q_normalize_text(sf_dir: str):
    """CCNet-style text normalisation ahead of hashing: lowercase -> NFC ->
    whitespace collapse -> trim, plus the normalised length.  Entirely
    Arrow-kernel vectorised (utf8proc casing/normalisation + RE2 regex —
    the SAME underlying libraries DuckDB uses, so the oracle match is
    byte-exact).  Pure per-batch map: zero shuffle at any scale."""
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(pc.utf8_lower(batch.column("text")), form="NFC")
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_text": t,
                "n_chars_norm": pc.utf8_length(t).cast(pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


QUERIES["normalize_text"] = q_normalize_text
ORACLE_SQL["normalize_text"] = (
    "SELECT doc_id, "
    "       trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g'))"
    "         AS norm_text, "
    "       CAST(length(trim(regexp_replace(nfc_normalize(lower(text)), "
    "            '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm "
    "FROM documents"
)


def q_cluster_sample(sf_dir: str, m: int = 5):
    """Cluster-stratified diversity sampling: after the distributed k-means
    assignment, keep the m smallest vec_ids per cluster — the deterministic
    skeleton of embedding-diversity corpus selection (one representative
    slice per semantic bucket).  Physical shape: per-block partial top-m per
    cluster (raw tasks) + a driver merge bounded by clusters x m x blocks —
    the mergeable-partial-top-k pattern of q_top_docs_per_source."""
    import ray

    from ..util import map_blocks

    assigned = q_embedding_kmeans(sf_dir).materialize()

    def part(b: pa.Table):
        vid = b.column("vec_id").to_numpy(zero_copy_only=False)
        cl = b.column("cluster").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, cl))
        vid, cl = vid[order], cl[order]
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        keep = np.zeros(len(vid), dtype=bool)
        for s, e in zip(starts, np.r_[starts[1:], len(vid)]):
            keep[s : min(s + m, e)] = True
        return cl[keep], vid[keep]

    parts = ray.get(map_blocks(part, assigned))
    if not parts:
        return pa.table(
            {
                "cluster": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
            }
        )
    cl = np.concatenate([p[0] for p in parts])
    vid = np.concatenate([p[1] for p in parts])
    order = np.lexsort((vid, cl))
    cl, vid = cl[order], vid[order]
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    keep = np.zeros(len(vid), dtype=bool)
    for s, e in zip(starts, np.r_[starts[1:], len(vid)]):
        keep[s : min(s + m, e)] = True
    return pa.table(
        {
            "cluster": pa.array(cl[keep], type=pa.int64()),
            "vec_id": pa.array(vid[keep], type=pa.int64()),
        }
    )


QUERIES["cluster_sample"] = q_cluster_sample


def q_events_rank(sf_dir: str):
    """Ranking window function: each event's 1-based sequence number within
    its user's (ts, event_id)-ordered history — ROW_NUMBER() OVER
    (PARTITION BY user ORDER BY ts, id), the ordered-window sibling of the
    session/sliding operators.  Physical shape: ONE range sort by user_id +
    per-block vectorised rank for interior users; the <=2 users per block
    edge ship whole to a tiny driver heal (rank needs the user's full
    prefix, so boundary users are ranked over their concatenated rows —
    O(blocks) users, never O(rows))."""
    import ray

    from ..util import ds_from_refs, split_boundary

    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def to_micros(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    s = ds.map_batches(to_micros, batch_format="pyarrow").sort("user_id")

    def _rank(u: np.ndarray, t: np.ndarray, e: np.ndarray):
        """Ranks for rows in ANY order; returns arrays aligned to the
        (u, t, e)-lexsorted order."""
        order = np.lexsort((e, t, u))
        u, t, e = u[order], t[order], e[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        base = np.repeat(starts, np.diff(np.r_[starts, len(u)]))
        rnk = np.arange(len(u), dtype=np.int64) - base + 1
        return u, t, e, rnk

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "rnk": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        e = batch.column("event_id").to_numpy(zero_copy_only=False)
        bnd = (u == u.min()) | (u == u.max())
        iu, it, ie, ir = _rank(u[~bnd], t[~bnd], e[~bnd])
        n_i, n_b = len(iu), int(bnd.sum())
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([iu, u[bnd]])),
                "ts": pa.array(np.concatenate([it, t[bnd]])),
                "event_id": pa.array(np.concatenate([ie, e[bnd]])),
                "rnk": pa.array(
                    np.concatenate([ir, np.zeros(n_b, dtype=np.int64)])
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        hu, ht, he, hr = _rank(
            boundary.column("user_id").to_numpy(zero_copy_only=False),
            boundary.column("ts").to_numpy(zero_copy_only=False),
            boundary.column("event_id").to_numpy(zero_copy_only=False),
        )
        int_refs = int_refs + [
            ray.put(
                pa.table(
                    {
                        "user_id": pa.array(hu),
                        "ts": pa.array(ht),
                        "event_id": pa.array(he),
                        "rnk": pa.array(hr),
                    }
                )
            )
        ]
        n_int += len(hu)
    out = ds_from_refs(
        int_refs, count=n_int,
        user_id=pa.int64(), ts=pa.int64(), event_id=pa.int64(), rnk=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "rnk": batch.column("rnk"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


QUERIES["events_rank"] = q_events_rank
ORACLE_SQL["events_rank"] = (
    "SELECT event_id, user_id, "
    "       CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
    "            ORDER BY ts, event_id) AS BIGINT) AS rnk "
    "FROM events"
)


def q_doc_chunks(sf_dir: str, chunk: int = 120, stride: int = 90):
    """Fixed-window document chunking with overlap — the prep step for
    embedding / training-sequence pipelines (each doc becomes windows of
    ``chunk`` chars starting every ``stride`` chars; n_chunks =
    max(1, ceil(len/stride)) so empty docs keep one empty chunk).

    Distributed shape: a pure flat-map — no shuffle, no state; streams at
    any scale.  Vectorized: the loop is over the per-batch MAX chunk count
    (one ``utf8_slice_codeunits`` kernel per chunk index), never over rows.
    """
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        ids = batch.column("doc_id").combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chunks = np.maximum(1, -(-lens // stride))
        parts = []
        for g in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > g)
            sub_t = text.filter(mask)
            parts.append(
                pa.table(
                    {
                        "doc_id": ids.filter(mask),
                        "chunk_idx": pa.array(
                            np.full(len(sub_t), g, dtype=np.int64)
                        ),
                        "chunk_text": pc.utf8_slice_codeunits(
                            sub_t, start=g * stride, stop=g * stride + chunk
                        ),
                    }
                )
            )
        if not parts:
            out = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        else:
            out = pa.concat_tables(parts)
        return out.append_column(
            "chunk_len", pc.cast(pc.utf8_length(out.column("chunk_text")), pa.int64())
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


QUERIES["doc_chunks"] = q_doc_chunks
ORACLE_SQL["doc_chunks"] = (
    "SELECT doc_id, CAST(t.g AS BIGINT) AS chunk_idx, "
    "       substring(text, CAST(t.g * 90 + 1 AS INT), 120) AS chunk_text, "
    "       CAST(length(substring(text, CAST(t.g * 90 + 1 AS INT), 120)) "
    "            AS BIGINT) AS chunk_len "
    "FROM documents, UNNEST(generate_series(0, "
    "       CAST(greatest(ceil(length(text) / 90.0) - 1, 0) AS BIGINT))) AS t(g)"
)


def q_quality_gate(sf_dir: str, pct: float = 0.25):
    """Global-percentile quality gate: keep docs whose length is at or above
    the exact lower-quantile threshold (rank floor((n-1)*pct) of the sorted
    lengths) — the standard 'drop the shortest quartile' curation filter,
    with the threshold computed from the data, not configured.

    Distributed shape (two passes, no shuffle): (1) per-block value_counts
    of the integer metric as raw-task partials -> tiny driver merge (the
    count-of-lengths table is O(distinct lengths), never O(docs) — the
    count-of-counts trick); (2) a broadcast-threshold filter map.  Exact at
    any scale."""
    import ray
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "n_chars"])

    if isinstance(ds, MaterializedDataset):
        def part(b: pa.Table):
            v = b.column("n_chars").to_numpy(zero_copy_only=False)
            u, c = np.unique(v, return_counts=True)
            return u, c

        acc: dict = {}
        total = 0
        for u, c in ray.get(map_blocks(part, ds)):
            for val, cnt in zip(u, c):
                acc[int(val)] = acc.get(int(val), 0) + int(cnt)
                total += int(cnt)
    else:
        hist = ds.groupby("n_chars").count().take_all()
        acc = {int(r["n_chars"]): int(r["count()"]) for r in hist}
        total = sum(acc.values())
    if not total:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())}
        )
    rank = int(np.floor((total - 1) * pct))  # 0-based rank-select
    cum = 0
    thr = max(acc)
    for val in sorted(acc):
        cum += acc[val]
        if cum > rank:
            thr = val
            break

    def gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_chars"), thr))

    return ds.map_batches(gate, batch_format="pyarrow")


QUERIES["quality_gate"] = q_quality_gate
ORACLE_SQL["quality_gate"] = (
    "WITH ranked AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn, "
    "                       COUNT(*) OVER () AS n FROM documents), "
    "thr AS (SELECT min(n_chars) AS t FROM ranked "
    "        WHERE rn = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1) "
    "SELECT d.doc_id, d.n_chars FROM documents d, thr WHERE d.n_chars >= thr.t"
)


def q_lang_source_share(sf_dir: str):
    """Corpus-mix matrix: per (lang, source) doc count plus that source's
    share of the language — the mixing-weights table a training-data
    pipeline reports before sampling.

    Distributed shape: per-block (lang, source) partial counts as raw tasks
    -> driver merge over O(blocks x |langs x sources|) rows (the key domain
    is small by definition — it is the mixing matrix itself), share = one
    IEEE double division on the same integers in both engines."""
    import ray
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["lang", "source"])

    acc: dict = {}
    if isinstance(ds, MaterializedDataset):
        def part(b: pa.Table):
            key = pc.binary_join_element_wise(
                b.column("lang"), b.column("source"), "\x1f"
            )
            vc = pc.value_counts(key.combine_chunks())
            return vc.field("values").to_pylist(), vc.field("counts").to_pylist()

        for u, c in ray.get(map_blocks(part, ds)):
            for k, cnt in zip(u, c):
                acc[k] = acc.get(k, 0) + int(cnt)
    else:
        from ray.data.aggregate import Count

        rows = ds.groupby(["lang", "source"]).aggregate(Count()).take_all()
        for r in rows:
            acc["\x1f".join((r["lang"], r["source"]))] = int(r["count()"])
    lang_tot: dict = {}
    for k, cnt in acc.items():
        lang_tot[k.split("\x1f")[0]] = lang_tot.get(k.split("\x1f")[0], 0) + cnt
    keys = sorted(acc)
    langs = [k.split("\x1f")[0] for k in keys]
    return pa.table(
        {
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array([k.split("\x1f")[1] for k in keys], type=pa.string()),
            "n_docs": pa.array([acc[k] for k in keys], type=pa.int64()),
            "share": pa.array(
                [acc[k] / lang_tot[l] for k, l in zip(keys, langs)],
                type=pa.float64(),
            ),
        }
    )


QUERIES["lang_source_share"] = q_lang_source_share
ORACLE_SQL["lang_source_share"] = (
    "SELECT lang, source, COUNT(*) AS n_docs, "
    "       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY lang) "
    "         AS share "
    "FROM documents GROUP BY lang, source"
)


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate: 1 h windows advancing every 15 min (each
    event lands in exactly 4 overlapping windows) — the overlapping sibling
    of the tumbling (`events_hourly`) and RANGE-frame sliding
    (`events_sliding`) operators.

    Distributed shape: window membership is computed (never joined) and
    COMBINED map-side — each block emits per-(window, type) partial counts
    via one vectorised np.unique over dictionary-encoded keys, so the
    exchange carries O(blocks x windows x types) rows regardless of the
    overlap factor (the naive 4x flat-expansion would make shuffle volume
    proportional to it); one sorted aggregation sums the partials."""
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "events", columns=["ts", "event_type"])
    QTR = 900_000_000  # 15 min in micros
    HOPS = 4  # window / hop

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "w": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // QTR
        w = ((base[None, :] - np.arange(HOPS, dtype=np.int64)[:, None]) * QTR).ravel()
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_types = len(et.dictionary)
        key = (w // QTR) * n_types + np.tile(codes, HOPS)
        uk, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "w": pa.array((uk // n_types) * QTR),
                "event_type": et.dictionary.take(pa.array(uk % n_types)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = sorted_aggregate(
        ds.map_batches(expand, batch_format="pyarrow"),
        ["w", "event_type"],
        {"n_events": ("n", "sum")},
        empty_types={"w": pa.int64(), "event_type": pa.string()},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("w").cast(pa.timestamp("us")),
                "event_type": batch.column("event_type"),
                "n_events": batch.column("n_events"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


QUERIES["events_hopping"] = q_events_hopping
ORACLE_SQL["events_hopping"] = (
    "SELECT make_timestamp(((epoch_us(ts) // 900000000) - t.j) * 900000000) "
    "         AS window_start, "
    "       event_type, COUNT(*) AS n_events "
    "FROM events, UNNEST(generate_series(0, 3)) AS t(j) "
    "GROUP BY 1, 2"
)


def _source_counts(sf_dir: str):
    """Per-source doc counts: per-block value_counts partials -> tiny driver
    merge (O(blocks x sources)); distributed groupby fallback off the
    materialised path.  No shuffle on the common path."""
    import ray
    from ray.data.dataset import MaterializedDataset

    from ..util import map_blocks

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "source"])
    cnt: dict = {}
    if isinstance(ds, MaterializedDataset):
        def part(b: pa.Table):
            vc = pc.value_counts(b.column("source").combine_chunks())
            return vc.field("values").to_pylist(), vc.field("counts").to_pylist()

        for u, c in ray.get(map_blocks(part, ds)):
            for k, n in zip(u, c):
                cnt[k] = cnt.get(k, 0) + int(n)
    else:
        for r in ds.groupby("source").count().take_all():
            cnt[r["source"]] = int(r["count()"])
    return ds, cnt


def q_source_balance_sample(sf_dir: str):
    """Source-flattening downsample (temperature-0 corpus mixing): keep each
    doc of source s with probability min_count/count(s), so every source
    contributes ~min_count docs in expectation — the CCNet/Pile-style
    rebalancing step, with the rate derived FROM the data (two passes), not
    configured.  Deterministic hash-keyed Bernoulli, PRODUCTION path: keep
    iff splitmix64(doc_id) masked to 63 bits falls below
    floor(2^63 * min_count / count(s)) — the engine's vectorised splitmix
    finalizer (no per-row Python hashing), replayed bitwise in DuckDB via
    sqlhash.sm64_ctes.  The md5-keyed variant survives as
    q_source_balance_sample_oracle (fixture).

    Float contract: the threshold is (exact power-of-two multiply) followed
    by ONE IEEE division and a floor — bitwise-identical in DuckDB; the
    comparison runs in the uint64 domain (a threshold of exactly 2^63, i.e.
    the min-count source keeping everything, still fits)."""
    from ..hashing import MASK63, splitmix64

    ds, cnt = _source_counts(sf_dir)
    if not cnt:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "source": pa.array([], pa.string())}
        )
    mn = min(cnt.values())
    srcs_sorted = sorted(cnt)
    thr_np = np.array(
        [int(np.floor((_TWO63 * mn) / cnt[s])) for s in srcs_sorted],
        dtype=np.uint64,
    )
    src_arr = pa.array(srcs_sorted, type=pa.string())

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64)) & MASK63  # uint64 in [0, 2^63)
        idx = (
            pc.index_in(batch.column("source"), value_set=src_arr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array(h < thr_np[idx]))

    return ds.map_batches(gate, batch_format="pyarrow")


def q_source_balance_sample_oracle(sf_dir: str):
    """md5-keyed fixture twin of q_source_balance_sample (hashlib.md5 is the
    contract with DuckDB's md5(); threshold space 2^24): an independent
    second face of the rebalancing math, never the scale path."""
    import hashlib

    ds, cnt = _source_counts(sf_dir)
    if not cnt:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "source": pa.array([], pa.string())}
        )
    mn = min(cnt.values())
    thr = {s: int(np.floor((16777216.0 * mn) / c)) for s, c in cnt.items()}

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        keep = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) < thr[s]
            for i, s in zip(ids, srcs)
        ]
        return batch.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


QUERIES["source_balance_sample"] = q_source_balance_sample
QUERIES["source_balance_sample_oracle"] = q_source_balance_sample_oracle
ORACLE_SQL["source_balance_sample_oracle"] = (
    "WITH cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source), "
    "mn AS (SELECT MIN(c) AS m FROM cnt), "
    "thr AS (SELECT source, CAST(floor((16777216.0 * m) / c) AS BIGINT) AS t "
    "        FROM cnt, mn) "
    "SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source) "
    "WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT < thr.t"
)


def q_near_dup_cluster_sizes(sf_dir: str):
    """Cluster-size histogram of the flagship's connected components (the
    dedup-impact report: how many pairs/triples/blobs the corpus contains).
    Composes the memoised oracle-config flagship run; the histogram is two
    tiny count-of-counts aggregates over the membership table — at the
    production scale both run as grouped counts (O(clusters) then
    O(distinct sizes)), never materialising documents."""
    members = q_near_dup_clusters_oracle(sf_dir)
    if members.num_rows == 0:
        return pa.table(
            {
                "cluster_size": pa.array([], pa.int64()),
                "n_clusters": pa.array([], pa.int64()),
            }
        )
    labels = np.asarray(members.column("cluster_url").to_pylist(), dtype=object)
    _, sizes = np.unique(labels, return_counts=True)
    usize, ncl = np.unique(sizes, return_counts=True)
    return pa.table(
        {
            "cluster_size": pa.array(usize.astype(np.int64)),
            "n_clusters": pa.array(ncl.astype(np.int64)),
        }
    )


def q_dup_graph_degrees(sf_dir: str):
    """Degree histogram of the verified near-dup pair graph — the
    graph-shape report behind cluster formation (how many docs have 1, 2,
    ... near-duplicate partners; a long tail of high-degree nodes predicts
    giant clusters and hot union-find edges).  Composes the memoised
    oracle-config flagship; the histogram is two count-of-counts over the
    pair endpoints (O(pairs) then O(distinct degrees)) — documents are
    never materialised."""
    pairs = q_near_dup_pairs_oracle(sf_dir)

    def ends(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": pa.concat_arrays(
                    [
                        b.column("url_a").combine_chunks().cast(pa.string()),
                        b.column("url_b").combine_chunks().cast(pa.string()),
                    ]
                )
            }
        )

    from ..stages.groupagg import sorted_aggregate

    deg = sorted_aggregate(
        pairs.map_batches(ends, batch_format="pyarrow"),
        ["url"], {"degree": ("url", "count")},
        empty_types=dict(url=pa.string(), degree=pa.int64()),
    )
    # second count-of-counts stays distributed: O(docs-with-dups) rows never
    # land on the driver
    return sorted_aggregate(
        deg.map_batches(
            lambda b: b.select(["degree"]), batch_format="pyarrow"
        ),
        ["degree"], {"n_docs": ("degree", "count")},
        empty_types=dict(degree=pa.int64(), n_docs=pa.int64()),
    )


QUERIES["dup_graph_degrees"] = q_dup_graph_degrees
ORACLE_SQL["dup_graph_degrees"] = _NEAR_PAIRS_CTE + (
    ", near AS ("
    "  SELECT da, db "
    "  FROM pairs JOIN doc_dup pa ON pairs.da = pa.doc_id "
    "  JOIN doc_dup pb ON pairs.db = pb.doc_id "
    "  WHERE CAST(common AS DOUBLE) / (pa.np + 1) > 0.2 "
    "     OR CAST(common AS DOUBLE) / (pb.np + 1) > 0.2"
    "), ends AS ("
    "  SELECT da AS d FROM near UNION ALL SELECT db FROM near"
    "), deg AS (SELECT d, COUNT(*) AS degree FROM ends GROUP BY d) "
    "SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_docs "
    "FROM deg GROUP BY degree"
)


QUERIES["near_dup_cluster_sizes"] = q_near_dup_cluster_sizes
ORACLE_SQL["near_dup_cluster_sizes"] = _cc_sql[
    : _cc_sql.rindex("SELECT 'doc://'")
] + (
    "SELECT CAST(cluster_size AS BIGINT) AS cluster_size, COUNT(*) AS n_clusters "
    "FROM (SELECT lbl, COUNT(*) AS cluster_size "
    "      FROM (SELECT n, MIN(l) AS lbl FROM reach GROUP BY n) m "
    "      GROUP BY lbl) c "
    "GROUP BY cluster_size"
)


def q_gram_novelty(sf_dir: str, n: int = 3):
    """Per-doc n-gram novelty: how many of a doc's distinct word n-grams
    occur for the FIRST time in that doc (by doc_id order) vs its total
    distinct grams — the marginal-contribution signal dedup-aware corpus
    selection ranks by (a doc whose grams all appeared earlier adds nothing).

    Distributed shape: one wide exchange keyed by gram (min doc_id per gram
    — the same cost class as the DF table), then two skinny doc-keyed
    aggregates: first-occurrence credits (<= one row per doc) unioned with
    the doc-local distinct-gram counts and summed — no join, no broadcast,
    no driver state."""
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    grams = ds.map_batches(
        lambda b: _distinct_gram_rows(b, n), batch_format="pyarrow"
    )
    firsts = sorted_aggregate(
        grams, ["g"], {"d0": ("doc_id", "min")},
        empty_types={"g": pa.string(), "d0": pa.int64()},
    )

    def credit_rows(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("d0").combine_chunks())
        return pa.table(
            {
                "doc_id": vc.field("values"),
                "n_first": vc.field("counts").cast(pa.int64()),
                "n_grams": pa.array(np.zeros(len(vc), dtype=np.int64)),
            }
        )

    def local_counts(batch: pa.Table) -> pa.Table:
        g = _distinct_gram_rows(batch, n)
        vc = pc.value_counts(g.column("doc_id").combine_chunks())
        return pa.table(
            {
                "doc_id": vc.field("values"),
                "n_first": pa.array(np.zeros(len(vc), dtype=np.int64)),
                "n_grams": vc.field("counts").cast(pa.int64()),
            }
        )

    union = firsts.map_batches(credit_rows, batch_format="pyarrow").union(
        ds.map_batches(local_counts, batch_format="pyarrow")
    )
    return sorted_aggregate(
        union,
        ["doc_id"],
        {"n_first": ("n_first", "sum"), "n_grams": ("n_grams", "sum")},
        empty_types={
            "doc_id": pa.int64(), "n_first": pa.int64(), "n_grams": pa.int64()
        },
    )


QUERIES["gram_novelty"] = q_gram_novelty
ORACLE_SQL["gram_novelty"] = _GRAMS_CTE + (
    ", firsts AS (SELECT g, MIN(doc_id) AS d0 FROM grams GROUP BY g), "
    "nf AS (SELECT d0 AS doc_id, COUNT(*) AS n_first FROM firsts GROUP BY d0), "
    "ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id) "
    "SELECT ng.doc_id, CAST(COALESCE(nf.n_first, 0) AS BIGINT) AS n_first, "
    "       ng.n_grams "
    "FROM ng LEFT JOIN nf USING (doc_id)"
)


def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: declared ``lang`` column vs the
    stopword-heuristic prediction, with doc counts per (true, predicted)
    cell — the classifier-eval report a curation pipeline runs before
    trusting a filter.  Composes the oracle-checked ``lang_id`` operator;
    the matrix itself is per-block (lang, pred_lang) value-count partials
    merged on the driver (domain = |langs|^2, tiny by definition)."""
    import ray

    from ..functions.text import lang_id_docs
    from ..util import map_blocks

    pred = lang_id_docs(
        _read_mat(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ).materialize()

    def part(b: pa.Table):
        key = pc.binary_join_element_wise(
            b.column("lang"), b.column("pred_lang"), "\x1f"
        )
        vc = pc.value_counts(key.combine_chunks())
        return vc.field("values").to_pylist(), vc.field("counts").to_pylist()

    acc: dict = {}
    for u, c in ray.get(map_blocks(part, pred)):
        for k, n in zip(u, c):
            acc[k] = acc.get(k, 0) + int(n)
    keys = sorted(acc)
    return pa.table(
        {
            "lang": pa.array([k.split("\x1f")[0] for k in keys], type=pa.string()),
            "pred_lang": pa.array(
                [k.split("\x1f")[1] for k in keys], type=pa.string()
            ),
            "n_docs": pa.array([acc[k] for k in keys], type=pa.int64()),
        }
    )


QUERIES["lang_confusion"] = q_lang_confusion
ORACLE_SQL["lang_confusion"] = (
    "SELECT lang, pred_lang, COUNT(*) AS n_docs FROM ("
    + ORACLE_SQL["lang_id"]
    + ") pred GROUP BY lang, pred_lang"
)


def q_incremental_band_pairs(sf_dir: str):
    """Incremental near-dup candidates: the docs of the 'incoming' slice
    (doc_id % 5 == 4, the daily-crawl stand-in) that share at least one
    full MinHash band with a 'base'-corpus doc — the asymmetric
    crawl-vs-corpus near-dedup step (`incremental_dedup` is its exact-hash
    sibling).  Composes the oracle-checked banding operator, so at scale
    the incoming side's signatures semi-join the base's band keys without
    rescanning base text; here the shared memoised md5 pass keeps the
    oracle family one computation."""
    pairs = q_minhash_band_pairs(sf_dir)

    def asym(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False)
        bb = b.column("doc_b").to_numpy(zero_copy_only=False)
        nb = b.column("n_bands").to_numpy(zero_copy_only=False)
        ia, ib = (a % 5) == 4, (bb % 5) == 4
        keep = ia != ib
        a, bb, nb, ia = a[keep], bb[keep], nb[keep], ia[keep]
        return pa.table(
            {
                "incoming_id": pa.array(np.where(ia, a, bb)),
                "base_id": pa.array(np.where(ia, bb, a)),
                "n_bands": pa.array(nb),
            }
        )

    return pairs.map_batches(asym, batch_format="pyarrow")


QUERIES["incremental_band_pairs"] = q_incremental_band_pairs
_band_sql = ORACLE_SQL["minhash_band_pairs"]
ORACLE_SQL["incremental_band_pairs"] = _band_sql[
    : _band_sql.rindex("SELECT a.doc_id")
] + (
    "SELECT CASE WHEN a.doc_id % 5 = 4 THEN a.doc_id ELSE b.doc_id END "
    "         AS incoming_id, "
    "       CASE WHEN a.doc_id % 5 = 4 THEN b.doc_id ELSE a.doc_id END "
    "         AS base_id, "
    "       COUNT(*) AS n_bands "
    "FROM bands a JOIN bands b "
    "  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id "
    "WHERE (a.doc_id % 5 = 4) <> (b.doc_id % 5 = 4) "
    "GROUP BY 1, 2"
)


def q_events_funnel(sf_dir: str):
    """Ordered-step funnel per user (view -> click -> purchase): depth = how
    many steps completed in strict timestamp order (step k+1 must occur
    AFTER step k's first occurrence) — the sequence-matching analytics
    family next to sessions/rank/sliding.

    Physical shape: ONE range sort by user_id + a per-block vectorised
    three-pass segmented-min kernel (np.minimum.at per step with the
    previous step's per-user time as the mask) for interior users; the <=2
    users touching each block edge ship whole to a tiny driver heal running
    the same kernel — O(blocks) users, never O(rows)."""
    import ray

    from ..util import ds_from_refs, split_boundary

    STEPS = ["view", "click", "purchase"]
    SENT = np.iinfo(np.int64).max

    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def to_micros(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    s = ds.map_batches(to_micros, batch_format="pyarrow").sort("user_id")

    def _funnel(u: np.ndarray, t: np.ndarray, et: np.ndarray):
        """(user, depth) arrays for rows in ANY order."""
        users, uinv = np.unique(u, return_inverse=True)
        prev = np.zeros(len(users), dtype=np.int64) - 1  # step0 gate: ts > -1
        depth = np.zeros(len(users), dtype=np.int64)
        for step in STEPS:
            cur = np.full(len(users), SENT, dtype=np.int64)
            m = (et == step) & (t > prev[uinv]) & (prev[uinv] < SENT)
            np.minimum.at(cur, uinv[m], t[m])
            depth += (cur < SENT).astype(np.int64)
            prev = cur
        return users, depth

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "depth": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        bnd = (u == u.min()) | (u == u.max())
        iu, idep = _funnel(u[~bnd], t[~bnd], et[~bnd])
        n_i, n_b = len(iu), int(bnd.sum())
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([iu, u[bnd]])),
                "ts": pa.array(
                    np.concatenate([np.zeros(n_i, dtype=np.int64), t[bnd]])
                ),
                "event_type": pa.array(
                    [""] * n_i + list(et[bnd]), type=pa.string()
                ),
                "depth": pa.array(
                    np.concatenate([idep, np.zeros(n_b, dtype=np.int64)])
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        hu, hdep = _funnel(
            boundary.column("user_id").to_numpy(zero_copy_only=False),
            boundary.column("ts").to_numpy(zero_copy_only=False),
            np.asarray(boundary.column("event_type").to_pylist(), dtype=object),
        )
        import ray as _ray

        int_refs = int_refs + [
            _ray.put(
                pa.table(
                    {
                        "user_id": pa.array(hu),
                        "ts": pa.array(np.zeros(len(hu), dtype=np.int64)),
                        "event_type": pa.array([""] * len(hu), type=pa.string()),
                        "depth": pa.array(hdep),
                    }
                )
            )
        ]
        n_int += len(hu)
    out = ds_from_refs(
        int_refs, count=n_int,
        user_id=pa.int64(), ts=pa.int64(), event_type=pa.string(),
        depth=pa.int64(),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "depth": batch.column("depth"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


QUERIES["events_funnel"] = q_events_funnel
ORACLE_SQL["events_funnel"] = (
    "WITH u AS (SELECT DISTINCT user_id FROM events), "
    "s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    "       WHERE event_type = 'view' GROUP BY 1), "
    "s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e "
    "       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1 "
    "       WHERE e.event_type = 'click' GROUP BY 1), "
    "s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e "
    "       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2 "
    "       WHERE e.event_type = 'purchase' GROUP BY 1) "
    "SELECT u.user_id, "
    "       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3 "
    "                 WHEN s2.user_id IS NOT NULL THEN 2 "
    "                 WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
    "         AS depth "
    "FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) "
    "LEFT JOIN s3 USING (user_id)"
)


# --------------------------------------------------------------------------
# Production-hash oracle faces (round 4): DuckDB replays the engine's rolling
# polynomial hash + splitmix64 family bitwise via HUGEINT mod-2**64 math
# (pipelines/sqlhash.py), so the PRODUCTION variants of simhash / winnowing /
# MinHash / KMV — not just their md5 stand-ins — are driver-certifiable.
# --------------------------------------------------------------------------
from .sqlhash import (  # noqa: E402
    fingerprints_select,
    kmv_select,
    minhash_signatures_select,
    rademacher_lsh_select,
    sm64_ctes,
    simhash_candidates_select,
    simhash_select,
    winnow_candidates_ctes,
)

# Production-hash faces of the two full-corpus sampling operators: DuckDB
# replays the splitmix64 Bernoulli key bitwise (sm64_ctes), thresholds are
# embedded integer literals (stratified) or the same one-divide-and-floor
# double math (source balance, compared in the HUGEINT domain so the
# min-count source's threshold of exactly 2^63 keeps everything).
_STRAT_CASE63 = (
    "CASE lang "
    + " ".join(
        f"WHEN '{l}' THEN {_rate_thr63(r)}"
        for l, r in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE {_rate_thr63(_SAMPLE_DEFAULT_RATE)} END"
)
ORACLE_SQL["stratified_sample"] = (
    "WITH base AS (SELECT doc_id, lang FROM documents),\n"
    + sm64_ctes("ss_", "base", ["doc_id", "lang"], {"h": "CAST(doc_id AS HUGEINT)"})
    + f"\nSELECT doc_id, lang FROM ss_f WHERE h < {_STRAT_CASE63}"
)
ORACLE_SQL["source_balance_sample"] = (
    "WITH cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),\n"
    "mn AS (SELECT MIN(c) AS m FROM cnt),\n"
    "thr AS (SELECT source, CAST(floor((9223372036854775808.0 * m) / c) "
    "        AS HUGEINT) AS t FROM cnt, mn),\n"
    "base AS (SELECT doc_id, source FROM documents),\n"
    + sm64_ctes("sb_", "base", ["doc_id", "source"], {"h": "CAST(doc_id AS HUGEINT)"})
    + "\nSELECT f.doc_id, f.source FROM sb_f f JOIN thr USING (source) "
    "WHERE CAST(f.h AS HUGEINT) < thr.t"
)

# Splice the winnow-fingerprint candidate CTE (the bitwise SQL face of the
# pairs_by_key bucket cap) into the three substring-family oracles declared
# as templates above: production cap 64 for the dedup application and the
# coverage metric, large-but-finite 4096 for the spans oracle.  window = 25
# = min_len(40) - k(16) + 1, matching q_exact_substring_spans' defaults.
for _tmpl_q, _tmpl_cand in (
    ("exact_substring_dedup", winnow_candidates_ctes(k=16, window=25, cap=64)),
    ("dup_span_coverage", winnow_candidates_ctes(k=16, window=25, cap=64)),
    (
        "exact_substring_spans_oracle",
        winnow_candidates_ctes(k=16, window=25, cap=4096),
    ),
):
    ORACLE_SQL[_tmpl_q] = (
        ORACLE_SQL[_tmpl_q]
        .replace("{CAND4096}", _tmpl_cand)
        .replace("{CAND}", _tmpl_cand)
    )

def q_fingerprint_df_histogram(sf_dir: str, min_len: int = 40, k: int = 16):
    """Winnow-fingerprint document-frequency histogram — the skew report
    that sizes the substring family's bucket_cap: one row per distinct df
    value with the number of fingerprints at that df.  Boilerplate shared
    by m docs shows up as mass at df = m; the cap is chosen just above the
    organic tail.

    Shape: vectorised per-doc winnowing (the q_exact_substring_spans
    emitter) with a per-block (fp, count) combine, ONE radix hash exchange
    (groupagg.hash_sum_aggregate — fp is int64, sums only) for global dfs,
    then block-local histogram partials + one tiny sorted sum.  Exchange
    volume is distinct-fps-per-block, never postings."""
    from ..hashing import shingle_hashes
    from ..stages.groupagg import hash_sum_aggregate, sorted_aggregate
    from ..stages.substr import winnow_fingerprints

    window = min_len - k + 1
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def fps(batch: pa.Table) -> pa.Table:
        parts = []
        for t in batch.column("text").to_pylist():
            sel = winnow_fingerprints(shingle_hashes(t, k), window)
            if len(sel):
                parts.append(sel)
        if parts:
            uf, cnt = np.unique(np.concatenate(parts), return_counts=True)
        else:
            uf = np.empty(0, dtype=np.int64)
            cnt = np.empty(0, dtype=np.int64)
        return pa.table(
            {"fp": pa.array(uf), "n": pa.array(cnt.astype(np.int64))}
        )

    dfs = hash_sum_aggregate(
        docs.map_batches(fps, batch_format="pyarrow"),
        "fp", {"df": "n"},
        empty_types=dict(fp=pa.int64(), df=pa.int64()),
    )

    def hist_part(b: pa.Table) -> pa.Table:
        d = b.column("df").to_numpy(zero_copy_only=False)
        ud, c = np.unique(d, return_counts=True)
        return pa.table(
            {
                "df": pa.array(ud.astype(np.int64)),
                "n_fingerprints": pa.array(c.astype(np.int64)),
            }
        )

    return sorted_aggregate(
        dfs.map_batches(hist_part, batch_format="pyarrow"),
        ["df"], {"n_fingerprints": ("n_fingerprints", "sum")},
        empty_types=dict(df=pa.int64(), n_fingerprints=pa.int64()),
    )


QUERIES["fingerprint_df_histogram"] = q_fingerprint_df_histogram
from .sqlhash import winnow_sel_ctes as _winnow_sel_ctes  # noqa: E402

ORACLE_SQL["fingerprint_df_histogram"] = (
    f"WITH {_winnow_sel_ctes(k=16, window=25)},\n"
    "dfs AS (SELECT fp, count(*) AS df FROM sel GROUP BY fp)\n"
    "SELECT df, count(*) AS n_fingerprints FROM dfs GROUP BY df"
)


def q_ann_range_query(sf_dir: str, threshold: float = 0.3, n_queries: int = 10):
    """Range similarity search: for each query vector (vec_id < n_queries),
    ALL corpus neighbors with cosine >= threshold — the epsilon-ball
    sibling of the top-k ann_topk, the retrieval shape dedup-by-similarity
    thresholds use.  Brute-force baseline: the query matrix is broadcast
    once (ray.put) and every batch does one numpy matmul against it; the
    IVF/LSH paths (ann_ivf_topk, embedding_lsh_pairs) are the scale
    variants.  Output (query_id, neighbor_id), self excluded."""
    import ray

    from ..functions.embed import _emb_matrix
    from ..util import heal

    ds = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = ds.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"), n_queries)),
        batch_format="pyarrow",
    ).take_all()
    empty = dict(query_id=pa.int64(), neighbor_id=pa.int64())
    if not q_rows:
        from ..util import ds_from_refs

        return ds_from_refs([], count=0, **empty)
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([r["embedding"] for r in q_rows], dtype=np.float64)
    order = np.argsort(qids)
    q_ref = ray.put((qids[order], Q[order]))

    def scan(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                }
            )
        qi, Qm = ray.get(q_ref)
        m = m.astype(np.float64, copy=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = (m @ Qm.T) / (
                np.linalg.norm(m, axis=1)[:, None]
                * np.linalg.norm(Qm, axis=1)[None, :]
            )
        hit = sims >= threshold
        hit &= ids[:, None] != qi[None, :]  # exclude self
        ni, qj = np.nonzero(hit)
        return pa.table(
            {
                "query_id": pa.array(qi[qj], type=pa.int64()),
                "neighbor_id": pa.array(ids[ni], type=pa.int64()),
            }
        )

    return heal(ds.map_batches(scan, batch_format="pyarrow"), **empty)


QUERIES["ann_range_query"] = q_ann_range_query
ORACLE_SQL["ann_range_query"] = (
    "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id "
    "FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id "
    "WHERE q.vec_id < 10 "
    "AND list_cosine_similarity(q.embedding, e.embedding) >= 0.3"
)


ORACLE_SQL["simhash"] = simhash_select(k=5)
ORACLE_SQL["fingerprints"] = fingerprints_select(k=8, window=16)
ORACLE_SQL["minhash_signatures"] = minhash_signatures_select(num_perm=16, k=17)
ORACLE_SQL["simhash_candidates"] = simhash_candidates_select(
    k=5, prefix_bits=16, bucket_cap=256
)
ORACLE_SQL["distinct_shingles_kmv"] = kmv_select(k=256, shingle_k=17)
ORACLE_SQL["embedding_lsh_pairs_oracle"] = rademacher_lsh_select(
    n_tables=_ELSH_ORACLE["n_tables"], n_bits=_ELSH_ORACLE["n_bits"],
    dim=_ELSH_ORACLE["dim"], quant=_ELSH_ORACLE["quant"],
    threshold=0.4, cap=_ELSH_ORACLE["bucket_cap"],
)


def q_cdc_chunk_dedup(sf_dir: str, k: int = 8, mod: int = 64):
    """Content-defined chunking dedup report (storage-dedup style, e.g.
    LBFS/Venti lineage — public technique): cut each doc where the production
    rolling window hash (hashing.shingle_hashes, the same token family the
    flagship shingles with) is ≡ 0 mod ``mod``, then count duplicate chunks
    across the corpus.  Unlike fixed windows, CDC boundaries survive
    insertions/deletions, so shared boilerplate blocks dedup even when they
    shift position.  Output: one row per chunk content seen ≥ 2 times —
    (chunk_hash md5, chunk_len, n_occ, n_docs).

    Scale shape: chunking is doc-local map work; the only exchange is the
    grouped aggregation over (chunk_hash, per-doc count) partials — map-side
    combined, hash-keyed, no skew beyond genuinely hot chunks.  DuckDB
    oracle: sqlhash window hashes -> identical cut offsets -> md5(substring)."""
    import hashlib

    from ..hashing import shingle_hashes
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        h_out: list = []
        l_out: list = []
        n_out: list = []
        d_out: list = []
        for doc_id, t in zip(ids, texts):
            h = shingle_hashes(t, k)
            cuts = np.flatnonzero(h % mod == 0)
            cuts = cuts[cuts > 0]
            bounds = [0, *cuts.tolist(), len(t)]
            per_doc: dict = {}
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e <= s:
                    continue  # duplicate boundary (can't happen; guard)
                c = t[s:e]
                key = hashlib.md5(c.encode()).hexdigest()
                if key in per_doc:
                    per_doc[key][1] += 1
                else:
                    per_doc[key] = [len(c), 1]
            for key, (ln, n) in per_doc.items():
                h_out.append(key)
                l_out.append(ln)
                n_out.append(n)
                d_out.append(int(doc_id))
        return pa.table(
            {
                "chunk_hash": pa.array(h_out, type=pa.string()),
                "chunk_len": pa.array(l_out, type=pa.int64()),
                "n": pa.array(n_out, type=pa.int64()),
                "doc_id": pa.array(d_out, type=pa.int64()),
            }
        )

    rows = ds.map_batches(chunks, batch_format="pyarrow")
    agg = sorted_aggregate(
        rows,
        ["chunk_hash"],
        {"chunk_len": ("chunk_len", "max"), "n_occ": ("n", "sum"),
         "n_docs": ("chunk_hash", "count")},
        empty_types=dict(chunk_hash=pa.string(), chunk_len=pa.int64(),
                         n_occ=pa.int64(), n_docs=pa.int64()),
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_occ"), 2))

    return agg.map_batches(dup_only, batch_format="pyarrow")


QUERIES["cdc_chunk_dedup"] = q_cdc_chunk_dedup

from .sqlhash import rolling_hash_ctes as _rh_ctes  # noqa: E402

ORACLE_SQL["cdc_chunk_dedup"] = f"""
WITH docs AS (
  SELECT 'doc://' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url, text
  FROM documents
),
{_rh_ctes(8)},
cuts AS (
  SELECT url, i - 1 AS s FROM hs
  WHERE (CAST(h AS UBIGINT) % 64) = 0 AND i > 1
),
starts AS (
  SELECT url, 0 AS s FROM docs UNION ALL SELECT url, s FROM cuts
),
ext AS (
  SELECT s.url, s.s,
         COALESCE(lead(s.s) OVER (PARTITION BY s.url ORDER BY s.s),
                  length(d.text)) AS e,
         d.text
  FROM starts s JOIN docs d ON s.url = d.url
),
chunks AS (
  SELECT url, md5(substr(text, s + 1, e - s)) AS chunk_hash,
         e - s AS chunk_len
  FROM ext WHERE e > s
),
agg AS (
  SELECT chunk_hash, max(chunk_len) AS chunk_len, count(*) AS n_occ,
         count(DISTINCT url) AS n_docs
  FROM chunks GROUP BY chunk_hash
)
SELECT chunk_hash, chunk_len, n_occ, n_docs FROM agg WHERE n_occ >= 2
"""


# ---------------------------------------------------------------------------
# Within-document repetition, script/char-class profile, keyed running totals
# ---------------------------------------------------------------------------


def q_intra_doc_repeats(sf_dir: str, n: int = 10):
    """Within-document repeated n-gram statistics — the self-repetition
    signal of "Deduplicating Training Data Makes Language Models Better"
    (Lee et al. 2022, arXiv:2107.06499, public): for each doc, over all
    character n-grams (n=10), the number of distinct grams occurring >= 2
    times, their total occurrences, and the maximal repeat count.  Docs
    with no repeated gram are omitted (matches the oracle's HAVING).

    Vectorised: each batch concatenates its texts into ONE uint32 codepoint
    array (utf-32-le, so "character" matches SQL substr() semantics), takes
    a strided (N, n) sliding-window view, prefixes each window with its doc
    index, and runs a single np.unique over the void view — no per-gram
    Python.  A doc never spans rows, so the stage is an embarrassingly
    parallel map_batches with NO shuffle at any scale; per-task memory is
    bounded by the byte-capped block size x (n + 1) x 4 bytes/char.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_repeat_grams": pa.array([], type=pa.int64()),
                "repeat_occurrences": pa.array([], type=pa.int64()),
                "max_repeat": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        texts = batch.column("text").to_pylist()
        enc = [t.encode("utf-32-le") for t in texts]
        lens = np.array([len(e) // 4 for e in enc], dtype=np.int64)
        arr = np.frombuffer(b"".join(enc), dtype=np.uint32)
        total = len(arr)
        if total < n or not (lens >= n).any():
            return empty
        win = sliding_window_view(arr, n)  # (total - n + 1, n), zero-copy
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        doc_of_char = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        w_doc = doc_of_char[: total - n + 1]
        pos_in_doc = np.arange(total - n + 1, dtype=np.int64) - starts[w_doc]
        valid = pos_in_doc <= (lens[w_doc] - n)
        rows = np.concatenate(
            [w_doc[valid, None].astype(np.uint32), win[valid]], axis=1
        )
        rows = np.ascontiguousarray(rows)
        v = rows.view([("", np.uint32)] * (n + 1)).ravel()
        uniq, counts = np.unique(v, return_counts=True)
        rep = counts >= 2
        if not rep.any():
            return empty
        d_rep = uniq.view(np.uint32).reshape(-1, n + 1)[:, 0].astype(np.int64)[rep]
        c_rep = counts[rep].astype(np.int64)
        order = np.argsort(d_rep, kind="stable")
        d_rep, c_rep = d_rep[order], c_rep[order]
        s = np.flatnonzero(np.r_[True, d_rep[1:] != d_rep[:-1]])
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d_rep[s]]),
                "n_repeat_grams": pa.array(np.diff(np.r_[s, len(d_rep)])),
                "repeat_occurrences": pa.array(np.add.reduceat(c_rep, s)),
                "max_repeat": pa.array(np.maximum.reduceat(c_rep, s)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


QUERIES["intra_doc_repeats"] = q_intra_doc_repeats

ORACLE_SQL["intra_doc_repeats"] = """
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 9, 0))) AS i
  FROM documents
),
g AS (
  SELECT doc_id, substr(text, i, 10) AS gram, count(*) AS c
  FROM pos GROUP BY doc_id, gram HAVING count(*) >= 2
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_repeat_grams,
       CAST(sum(c) AS BIGINT) AS repeat_occurrences,
       CAST(max(c) AS BIGINT) AS max_repeat
FROM g GROUP BY doc_id
"""


def q_script_stats(sf_dir: str):
    """Per-language character-class profile (letters / digits / spaces /
    total chars + doc count) — the script-composition screen of web-corpus
    quality filtering (C4-style heuristics, Raffel et al. 2020, public).

    Vectorised: each batch decodes its texts into one uint32 codepoint
    array, computes the class masks with range compares, and emits ONE
    partial row per language (np.bincount over lang codes); the tiny
    partial table then rides sorted_aggregate — at 100 TB the shuffle
    carries O(blocks x langs) rows, never O(chars)."""
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "letters": pa.array([], type=pa.int64()),
                "digits": pa.array([], type=pa.int64()),
                "spaces": pa.array([], type=pa.int64()),
                "chars": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        langs = batch.column("lang")
        codes_arr = pc.dictionary_encode(langs)
        code = np.asarray(codes_arr.combine_chunks().indices)
        uniq_langs = codes_arr.combine_chunks().dictionary.to_pylist()
        k = len(uniq_langs)
        texts = batch.column("text").to_pylist()
        enc = [t.encode("utf-32-le") for t in texts]
        lens = np.array([len(e) // 4 for e in enc], dtype=np.int64)
        arr = np.frombuffer(b"".join(enc), dtype=np.uint32)
        doc_of_char = np.repeat(code.astype(np.int64), lens)
        letters = ((arr >= 65) & (arr <= 90)) | ((arr >= 97) & (arr <= 122))
        digits = (arr >= 48) & (arr <= 57)
        spaces = arr == 32
        return pa.table(
            {
                "lang": pa.array(uniq_langs, type=pa.string()),
                "n_docs": pa.array(np.bincount(code, minlength=k).astype(np.int64)),
                "letters": pa.array(
                    np.bincount(doc_of_char, weights=letters, minlength=k).astype(
                        np.int64
                    )
                ),
                "digits": pa.array(
                    np.bincount(doc_of_char, weights=digits, minlength=k).astype(
                        np.int64
                    )
                ),
                "spaces": pa.array(
                    np.bincount(doc_of_char, weights=spaces, minlength=k).astype(
                        np.int64
                    )
                ),
                "chars": pa.array(np.bincount(doc_of_char, minlength=k).astype(np.int64)),
            }
        )

    part = ds.map_batches(partials, batch_format="pyarrow")
    return sorted_aggregate(
        part,
        ["lang"],
        {
            "n_docs": ("n_docs", "sum"),
            "letters": ("letters", "sum"),
            "digits": ("digits", "sum"),
            "spaces": ("spaces", "sum"),
            "chars": ("chars", "sum"),
        },
        empty_types={"lang": pa.string()},
    )


QUERIES["script_stats"] = q_script_stats

ORACLE_SQL["script_stats"] = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT)
         AS letters,
       CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT)
         AS digits,
       CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
         AS spaces,
       CAST(sum(length(text)) AS BIGINT) AS chars
FROM documents GROUP BY lang
"""


def q_orders_running_total(sf_dir: str):
    """Per-customer running revenue — SUM(...) OVER (PARTITION BY custkey
    ORDER BY orderdate, orderkey), the keyed-prefix-scan window sibling of
    q_events_rank (ROW_NUMBER) and token_budget_select (global scan).

    Physical shape: ONE range sort by o_custkey + per-block vectorised
    grouped cumsum for interior customers; the <= 2 customers per block
    edge ship whole to a tiny driver heal (O(blocks) customers, never
    O(rows)).  Money travels as integer cents so the cumsum is exact and
    order-independent across engines."""
    import ray

    from ..util import ds_from_refs, split_boundary

    ds = _read_mat(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "d": batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
                "cents": pa.array(cents),
            }
        )

    s = ds.map_batches(prep, batch_format="pyarrow").sort("o_custkey")

    def _scan(cust, okey, d, cents):
        """Grouped inclusive cumsum; returns arrays in (cust, d, okey) order."""
        order = np.lexsort((okey, d, cust))
        cust, okey, cents = cust[order], okey[order], cents[order]
        run = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        base = np.repeat(np.r_[0, run[starts[1:] - 1]], np.diff(np.r_[starts, len(run)]))
        return cust, okey, run - base

    def per_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderkey": pa.array([], type=pa.int64()),
                "d": pa.array([], type=pa.int64()),
                "run_cents": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        bnd = (cust == cust.min()) | (cust == cust.max())
        ic, io, ir = _scan(cust[~bnd], okey[~bnd], d[~bnd], cents[~bnd])
        n_i, n_b = len(ic), int(bnd.sum())
        return pa.table(
            {
                "o_custkey": pa.array(np.concatenate([ic, cust[bnd]])),
                "o_orderkey": pa.array(np.concatenate([io, okey[bnd]])),
                "d": pa.array(
                    np.concatenate([np.zeros(n_i, dtype=d.dtype), d[bnd]])
                ),
                "run_cents": pa.array(
                    np.concatenate([ir, cents[bnd]]).astype(np.int64)
                ),
                "_boundary": pa.array(np.r_[np.zeros(n_i, bool), np.ones(n_b, bool)]),
            }
        )

    part = s.map_batches(
        per_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    if boundary is not None and boundary.num_rows:
        hc, ho, hr = _scan(
            boundary.column("o_custkey").to_numpy(zero_copy_only=False),
            boundary.column("o_orderkey").to_numpy(zero_copy_only=False),
            boundary.column("d").to_numpy(zero_copy_only=False),
            boundary.column("run_cents").to_numpy(zero_copy_only=False),
        )
        int_refs = int_refs + [
            ray.put(
                pa.table(
                    {
                        "o_custkey": pa.array(hc),
                        "o_orderkey": pa.array(ho),
                        "d": pa.array(np.zeros(len(hc), dtype=np.int64)),
                        "run_cents": pa.array(hr),
                    }
                )
            )
        ]
        n_int += len(hc)
    out = ds_from_refs(
        int_refs,
        count=n_int,
        o_custkey=pa.int64(),
        o_orderkey=pa.int64(),
        d=pa.int64(),
        run_cents=pa.int64(),
    )
    return out.map_batches(
        lambda b: b.select(["o_custkey", "o_orderkey", "run_cents"]),
        batch_format="pyarrow",
    )


QUERIES["orders_running_total"] = q_orders_running_total

ORACLE_SQL["orders_running_total"] = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS BIGINT) AS run_cents
FROM orders
"""


def q_semantic_dedup(sf_dir: str, k: int = 8, iters: int = 5, tau: float = 0.4):
    """SemDeDup semantic near-dup removal over the embeddings table
    (functions.embed.semantic_dedup): k-means bucketing + within-cluster
    greedy cosine keep-first.  Iterative k-means, so no SQL oracle;
    deterministic and value-pinned in tests/test_rows_only_pins.py."""
    from ..functions.embed import semantic_dedup

    ds = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup(ds, k=k, iters=iters, tau=tau)


QUERIES["semantic_dedup"] = q_semantic_dedup


def q_bigram_pmi(sf_dir: str, min_count: int = 5, topk: int = 50):
    """Collocation mining: top-k adjacent word bigrams by pointwise-mutual-
    information ratio (Church & Hanks 1990, public) — pmi_ratio =
    c_xy * N / (c_x * c_y) with N = total bigram occurrences.  The
    association-score sibling of q_salient_terms (tf-idf) over the same
    token stream.

    Physical plan: one vectorised bigram explosion (Arrow split + two
    shifted zero-copy slices, doc-edge windows masked), ONE sorted
    aggregation for bigram counts and ONE for unigram counts; the unigram
    lookup side is attached under the repo's standard row+byte broadcast
    gate, with a distributed hash-join fallback above it.  All counts stay
    integers; pmi_ratio is ONE double division of exact int64 products, so
    DuckDB matches bitwise.  Top-k = per-block partial top-k + an
    O(blocks x k) driver merge — never a global sort."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    cfg = DedupConfig()
    ds = _read_mat(sf_dir, "documents", columns=["text"])

    def bigrams(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        flat = la.flatten()
        n = len(flat)
        if n < 2:
            return empty
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        # window i pairs word i with word i+1; windows whose second word
        # starts a new doc are masked out
        valid = np.ones(n - 1, dtype=bool)
        ends = offs[1:-1] - 1  # last word index of every doc but the final
        valid[ends[(ends >= 0) & (ends < n - 1)]] = False
        mask = pa.array(valid)
        return pa.table(
            {
                "w1": pc.array_filter(flat.slice(0, n - 1), mask),
                "w2": pc.array_filter(flat.slice(1, n - 1), mask),
            }
        )

    def unigrams(batch: pa.Table) -> pa.Table:
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        return pa.table({"w": la.flatten()})

    big = ds.map_batches(bigrams, batch_format="pyarrow").materialize()
    from ..util import fast_count

    n_total = fast_count(big)
    bc = sorted_aggregate(
        big,
        ["w1", "w2"],
        {"c_xy": ("w1", "count")},
        empty_types={"w1": pa.string(), "w2": pa.string()},
    ).filter(expr=f"c_xy >= {min_count}")
    uni = sorted_aggregate(
        ds.map_batches(unigrams, batch_format="pyarrow"),
        ["w"],
        {"c": ("w", "count")},
        empty_types={"w": pa.string()},
    ).materialize()

    n_vocab = fast_count(uni)
    uni_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, uni)))
    if (
        n_vocab <= cfg.broadcast_classify_limit
        and uni_bytes <= cfg.broadcast_bytes_limit
    ):
        parts = ray.get(
            map_blocks(
                lambda b: (
                    np.asarray(b.column("w").to_pylist(), dtype=object),
                    b.column("c").to_numpy(zero_copy_only=False),
                ),
                uni,
            )
        )
        words = (
            np.concatenate([p[0] for p in parts])
            if parts
            else np.empty(0, dtype=object)
        )
        cnts = (
            np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
        )
        order = np.argsort(words, kind="stable")
        lut_ref = ray.put((words[order], cnts[order]))

        def attach(b: pa.Table) -> pa.Table:
            w_s, c_s = ray.get(lut_ref)
            w1 = np.asarray(b.column("w1").to_pylist(), dtype=object)
            w2 = np.asarray(b.column("w2").to_pylist(), dtype=object)
            cx = c_s[np.searchsorted(w_s, w1)] if len(w1) else np.empty(0, np.int64)
            cy = c_s[np.searchsorted(w_s, w2)] if len(w2) else np.empty(0, np.int64)
            return b.append_column("c_x", pa.array(cx, type=pa.int64())).append_column(
                "c_y", pa.array(cy, type=pa.int64())
            )

        scored = bc.map_batches(attach, batch_format="pyarrow")
    else:  # 100-TB path: two distributed hash joins against the vocab table
        u1 = uni.map_batches(
            lambda b: pa.table({"w1": b.column("w"), "c_x": b.column("c")}),
            batch_format="pyarrow",
        )
        u2 = uni.map_batches(
            lambda b: pa.table({"w2": b.column("w"), "c_y": b.column("c")}),
            batch_format="pyarrow",
        )
        scored = bc.join(
            u1, "inner", num_partitions=cfg.join_partitions(), on=("w1",)
        ).join(u2, "inner", num_partitions=cfg.join_partitions(), on=("w2",))

    def ratio(b: pa.Table) -> pa.Table:
        c_xy = b.column("c_xy").to_numpy(zero_copy_only=False)
        c_x = b.column("c_x").to_numpy(zero_copy_only=False)
        c_y = b.column("c_y").to_numpy(zero_copy_only=False)
        r = (c_xy * np.int64(n_total)).astype(np.float64) / (c_x * c_y).astype(
            np.float64
        )
        return pa.table(
            {
                "w1": b.column("w1"),
                "w2": b.column("w2"),
                "c_xy": pa.array(c_xy, type=pa.int64()),
                "c_x": pa.array(c_x, type=pa.int64()),
                "c_y": pa.array(c_y, type=pa.int64()),
                "pmi_ratio": pa.array(r, type=pa.float64()),
            }
        )

    scored = scored.map_batches(ratio, batch_format="pyarrow").materialize()

    def topk_part(b: pa.Table, _k=topk):
        if b.num_rows == 0:
            return b
        r = b.column("pmi_ratio").to_numpy(zero_copy_only=False)
        w1 = np.asarray(b.column("w1").to_pylist(), dtype=object)
        w2 = np.asarray(b.column("w2").to_pylist(), dtype=object)
        order = np.lexsort((w2, w1, -r))[:_k]
        return b.take(pa.array(np.sort(order)))

    parts = [t for t in ray.get(map_blocks(topk_part, scored)) if t.num_rows]
    if not parts:
        return pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c_xy": pa.array([], type=pa.int64()),
                "c_x": pa.array([], type=pa.int64()),
                "c_y": pa.array([], type=pa.int64()),
                "pmi_ratio": pa.array([], type=pa.float64()),
            }
        )
    merged = pa.concat_tables(parts)
    r = merged.column("pmi_ratio").to_numpy(zero_copy_only=False)
    w1 = np.asarray(merged.column("w1").to_pylist(), dtype=object)
    w2 = np.asarray(merged.column("w2").to_pylist(), dtype=object)
    order = np.lexsort((w2, w1, -r))[:topk]
    return merged.take(pa.array(order))


QUERIES["bigram_pmi"] = q_bigram_pmi

ORACLE_SQL["bigram_pmi"] = """
WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
big AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM d, UNNEST(range(1, len(ws))) AS t(i)
),
bc AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
  FROM big GROUP BY w1, w2 HAVING count(*) >= 5
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM big)
SELECT bc.w1, bc.w2, bc.c_xy, u1.c AS c_x, u2.c AS c_y,
       CAST(bc.c_xy * tot.n AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE)
         AS pmi_ratio
FROM bc
JOIN uni u1 ON bc.w1 = u1.w
JOIN uni u2 ON bc.w2 = u2.w
CROSS JOIN tot
ORDER BY pmi_ratio DESC, bc.w1, bc.w2
LIMIT 50
"""


def q_events_retention(sf_dir: str):
    """Hour-over-hour cohort retention: for every hour h, the number of
    distinct active users and how many of them are also active in h+1 —
    the engagement-funnel sibling of q_events_funnel over tumbling windows.

    Physical plan: project events to (user_id, hour) int64 pairs, ONE range
    sort by user_id, then per-block: local np.unique collapses duplicate
    (user, hour) rows and adjacent unique hours (diff == 1h) mark
    retention; per-block output is a tiny (h, n_active, n_retained)
    partial.  The <= 2 users per block edge ship whole to a driver heal
    (O(blocks) users), and the partials ride one final tiny sorted
    aggregation — the events table itself is never driver-resident."""
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import ds_from_refs, map_blocks

    HOUR = 3_600_000_000
    ds = _read_mat(sf_dir, "events", columns=["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        h = pc.multiply(pc.floor(pc.divide(ts, HOUR)).cast(pa.int64()), HOUR)
        return pa.table({"user_id": batch.column("user_id"), "h": h})

    s = ds.map_batches(prep, batch_format="pyarrow").sort("user_id").materialize()

    def _partials(u: np.ndarray, h: np.ndarray):
        """(hours, act, ret) partial counts from (user, hour) rows in any
        order (duplicates collapsed here)."""
        pairs = np.unique(np.stack([u, h], axis=1), axis=0)
        uu, hh = pairs[:, 0], pairs[:, 1]
        same = np.r_[uu[1:] == uu[:-1], False]
        ret = same & (np.r_[hh[1:] - hh[:-1], 0] == HOUR)
        hours_a, act = np.unique(hh, return_counts=True)
        hours_r, ret_c = (
            np.unique(hh[ret], return_counts=True) if ret.any() else
            (np.empty(0, dtype=hh.dtype), np.empty(0, dtype=np.int64))
        )
        hours = np.union1d(hours_a, hours_r)
        act_out = np.zeros(len(hours), dtype=np.int64)
        ret_out = np.zeros(len(hours), dtype=np.int64)
        act_out[np.searchsorted(hours, hours_a)] = act
        ret_out[np.searchsorted(hours, hours_r)] = ret_c
        return hours, act_out, ret_out

    def per_block(b: pa.Table):
        if b.num_rows == 0:
            empty = pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "act": pa.array([], type=pa.int64()),
                    "ret": pa.array([], type=pa.int64()),
                }
            )
            return empty, empty
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        h = b.column("h").to_numpy(zero_copy_only=False)
        bnd = (u == u.min()) | (u == u.max())
        hours, act, ret = _partials(u[~bnd], h[~bnd])
        part = pa.table(
            {
                "h": pa.array(hours, type=pa.int64()),
                "act": pa.array(act),
                "ret": pa.array(ret),
            }
        )
        # boundary rows collapse to distinct (user, hour) BEFORE shipping,
        # so a hot user costs the heal its distinct hours, never its raw rows
        epairs = np.unique(np.stack([u[bnd], h[bnd]], axis=1), axis=0)
        edge = pa.table(
            {
                "h": pa.array(epairs[:, 1], type=pa.int64()),
                "act": pa.array(epairs[:, 0], type=pa.int64()),  # user ids, healed below
                "ret": pa.array(np.zeros(len(epairs), dtype=np.int64)),
            }
        )
        return part, edge

    refs = map_blocks(per_block, s, num_returns=2)
    outs = [(ray.get(p), ray.get(e)) for p, e in refs]
    parts = [p for p, _ in outs if p.num_rows]
    edges = [e for _, e in outs if e.num_rows]
    if edges:
        edge = pa.concat_tables(edges)
        hours, act, ret = _partials(
            edge.column("act").to_numpy(zero_copy_only=False),
            edge.column("h").to_numpy(zero_copy_only=False),
        )
        parts.append(
            pa.table(
                {
                    "h": pa.array(hours, type=pa.int64()),
                    "act": pa.array(act),
                    "ret": pa.array(ret),
                }
            )
        )
    if not parts:
        return pa.table(
            {
                "window_start": pa.array([], type=pa.timestamp("us")),
                "n_active": pa.array([], type=pa.int64()),
                "n_retained": pa.array([], type=pa.int64()),
            }
        )
    import ray as _ray

    part_ds = ds_from_refs(
        [_ray.put(t) for t in parts],
        count=sum(t.num_rows for t in parts),
        h=pa.int64(),
        act=pa.int64(),
        ret=pa.int64(),
    )
    agg = sorted_aggregate(
        part_ds,
        ["h"],
        {"n_active": ("act", "sum"), "n_retained": ("ret", "sum")},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("h").cast(pa.timestamp("us")),
                "n_active": batch.column("n_active"),
                "n_retained": batch.column("n_retained"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


QUERIES["events_retention"] = q_events_retention

ORACLE_SQL["events_retention"] = """
WITH uh AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events),
act AS (SELECT h, CAST(count(*) AS BIGINT) AS n_active FROM uh GROUP BY h),
r AS (
  SELECT a.h AS h, CAST(count(*) AS BIGINT) AS n_retained
  FROM uh a JOIN uh b
    ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
  GROUP BY a.h
)
SELECT act.h AS window_start, act.n_active,
       CAST(COALESCE(r.n_retained, 0) AS BIGINT) AS n_retained
FROM act LEFT JOIN r ON act.h = r.h
"""


def q_lang_centroids(sf_dir: str, *, _broadcast_row_gate: int | None = None):
    """Per-language embedding centroids via a two-table join (documents ⋈
    embeddings on doc_id = vec_id) — the text×vector relational surface
    behind per-domain semantic drift monitoring.  Components are quantised
    to integer micro-units (ROUND(x * 1e6), exact in double because a
    float32 significand times 1e6 fits in 53 bits) so the distributed sum
    is order-independent and DuckDB matches bitwise; the mean is ONE double
    division of two exact int64s.

    Physical plan: the doc_id→lang side is attached under the repo's
    standard row+byte broadcast gate (fallback: distributed hash join);
    each block then emits (lang, dim) partial sums — O(langs × dim) rows
    per block, never O(vectors) — and one tiny sorted aggregation
    finishes.  Output: (lang, dim, sum_q, n, mean)."""
    import ray

    from ..functions.embed import _emb_matrix
    from ..stages.groupagg import sorted_aggregate
    from ..util import map_blocks

    cfg = DedupConfig()
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "lang"])
    emb = _read_mat(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    n_docs = docs.count()
    docs_bytes = sum(ray.get(map_blocks(lambda b: b.nbytes, docs)))
    row_gate = (
        cfg.broadcast_classify_limit
        if _broadcast_row_gate is None
        else _broadcast_row_gate
    )

    def quantise(m: np.ndarray) -> np.ndarray:
        v = m.astype(np.float64) * 1_000_000.0
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)

    if n_docs <= row_gate and docs_bytes <= cfg.broadcast_bytes_limit:
        parts = ray.get(
            map_blocks(
                lambda b: (
                    b.column("doc_id").to_numpy(zero_copy_only=False),
                    np.asarray(b.column("lang").to_pylist(), dtype=object),
                ),
                docs,
            )
        )
        ids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        langs = (
            np.concatenate([p[1] for p in parts])
            if parts
            else np.empty(0, dtype=object)
        )
        order = np.argsort(ids, kind="stable")
        lut_ref = ray.put((ids[order], langs[order]))

        def partials(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "dim": pa.array([], type=pa.int64()),
                    "sum_q": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            k_s, l_s = ray.get(lut_ref)
            vids, m = _emb_matrix(b)
            if m.size == 0 or len(k_s) == 0:
                return empty
            pos = np.searchsorted(k_s, vids)
            pos_c = np.minimum(pos, len(k_s) - 1)
            hit = k_s[pos_c] == vids
            if not hit.any():
                return empty
            m = m[hit]
            row_langs = l_s[pos_c[hit]]
            codes, uniq = pd_factorize(row_langs)
            q = quantise(m)
            kk, dim = len(uniq), q.shape[1]
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, codes, q)
            cnt = np.bincount(codes, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "lang": pa.array(np.repeat(uniq, dim), type=pa.string()),
                    "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), kk)),
                    "sum_q": pa.array(sums.ravel()),
                    "n": pa.array(np.repeat(cnt, dim)),
                }
            )

        part = emb.map_batches(partials, batch_format="pyarrow")
    else:  # 100-TB path: distributed hash join, then per-block partials.
        # Arrow hash joins reject list-typed payload columns, so each
        # quantised vector travels as a fixed-width binary blob.
        d_side = docs.map_batches(
            lambda b: pa.table({"k": b.column("doc_id"), "lang": b.column("lang")}),
            batch_format="pyarrow",
        )

        def pack(b: pa.Table) -> pa.Table:
            _, m = _emb_matrix(b)
            q = quantise(m) if m.size else np.empty((0, 0), dtype=np.int64)
            blobs = [row.tobytes() for row in q]
            return pa.table(
                {
                    "k": b.column("vec_id"),
                    "qbin": pa.array(blobs, type=pa.large_binary()),
                }
            )

        e_side = emb.map_batches(pack, batch_format="pyarrow")
        joined = e_side.join(
            d_side, "inner", num_partitions=cfg.join_partitions(), on=("k",)
        )

        def joined_partials(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "lang": pa.array([], type=pa.string()),
                    "dim": pa.array([], type=pa.int64()),
                    "sum_q": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            col = b.column("qbin")
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            buf = b"".join(arr.to_pylist())
            q = np.frombuffer(buf, dtype=np.int64).reshape(b.num_rows, -1)
            row_langs = np.asarray(b.column("lang").to_pylist(), dtype=object)
            codes, uniq = pd_factorize(row_langs)
            kk, dim = len(uniq), q.shape[1]
            sums = np.zeros((kk, dim), dtype=np.int64)
            np.add.at(sums, codes, q)
            cnt = np.bincount(codes, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "lang": pa.array(np.repeat(uniq, dim), type=pa.string()),
                    "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), kk)),
                    "sum_q": pa.array(sums.ravel()),
                    "n": pa.array(np.repeat(cnt, dim)),
                }
            )

        part = joined.map_batches(joined_partials, batch_format="pyarrow")

    agg = sorted_aggregate(
        part,
        ["lang", "dim"],
        {"sum_q": ("sum_q", "sum"), "n": ("n", "sum")},
        empty_types={"lang": pa.string(), "dim": pa.int64()},
    )

    def finish(b: pa.Table) -> pa.Table:
        sum_q = b.column("sum_q").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        mean = sum_q.astype(np.float64) / (n * 1_000_000).astype(np.float64)
        return b.append_column("mean", pa.array(mean, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def pd_factorize(arr: np.ndarray):
    """Stable first-appearance factorisation of an object array (tiny
    cardinality — language codes); avoids importing pandas in workers."""
    uniq: list = []
    index: dict = {}
    codes = np.empty(len(arr), dtype=np.int64)
    for i, v in enumerate(arr):
        c = index.get(v)
        if c is None:
            c = index[v] = len(uniq)
            uniq.append(v)
        codes[i] = c
    return codes, np.asarray(uniq, dtype=object)


QUERIES["lang_centroids"] = q_lang_centroids

ORACLE_SQL["lang_centroids"] = """
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
j AS (
  SELECT d.lang, ex.i, CAST(ROUND(CAST(ex.x AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM ex JOIN documents d ON ex.vec_id = d.doc_id
)
SELECT lang, CAST(i AS BIGINT) AS dim,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(q) AS DOUBLE) / CAST(COUNT(*) * 1000000 AS DOUBLE) AS mean
FROM j GROUP BY lang, i
"""


def q_hashed_bow(sf_dir: str, dims: int = 64):
    """Feature-hashing document vectors (the "hashing trick", Weinberger et
    al. 2009, public): each token is md5-hashed to a dimension in [0, 64)
    and a ±1 sign; a document's vector is the signed occurrence count per
    dimension — the model-free featurisation stage of streaming text
    classifiers.  Output long form: (doc_id, dim, val) for val != 0.

    Vectorised except the md5 kernel, which runs once per DISTINCT token
    per batch (Arrow dictionary-encode first, so cost is batch vocab, not
    token occurrences); per-(doc, dim) sums are one np.bincount.  Doc-local
    — NO shuffle at any scale."""
    ds = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])

    import hashlib

    def per_batch(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        flat = la.flatten()
        if len(flat) == 0:
            return empty
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        wcount = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(len(wcount), dtype=np.int64), wcount)
        enc = pc.dictionary_encode(flat)
        codes = np.asarray(enc.indices)
        vocab = enc.dictionary.to_pylist()
        hv = np.array(
            [int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in vocab],
            dtype=np.int64,
        )
        tok_dim = hv % dims
        tok_sign = np.where((hv // dims) % 2 == 0, 1, -1).astype(np.int64)
        key = doc_of * dims + tok_dim[codes]
        vals = np.bincount(
            key, weights=tok_sign[codes], minlength=len(wcount) * dims
        ).astype(np.int64)
        nz = np.flatnonzero(vals)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz // dims]),
                "dim": pa.array((nz % dims).astype(np.int64)),
                "val": pa.array(vals[nz]),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


QUERIES["hashed_bow"] = q_hashed_bow

ORACLE_SQL["hashed_bow"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM toks
),
v AS (
  SELECT doc_id, CAST(hv % 64 AS BIGINT) AS dim,
         CAST(SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
           AS val
  FROM h GROUP BY doc_id, dim
)
SELECT doc_id, dim, val FROM v WHERE val <> 0
"""


def q_dup_ratio_per_source(sf_dir: str):
    """Dedup-impact analytics: per source, how many docs are exact-text
    duplicates of ANY doc in the whole corpus (count >= 2 across sources),
    and the duplicate ratio — the report a curation run uses to decide
    which feeds to throttle.  Doc identity is md5(text) so the DuckDB
    oracle groups on exactly the same 128-bit key.

    Physical plan: (md5, source) rows ride ONE annotate_bucket_size
    exchange (sort by md5 + per-block bucket scan + O(blocks) heal)
    attaching each doc's global text multiplicity WITHOUT a join; each
    block then emits per-source partials and a tiny sorted aggregation
    finishes.  The ratio is ONE double division of exact int64s."""
    from ..stages.bucketjoin import annotate_bucket_size
    from ..stages.groupagg import sorted_aggregate

    import hashlib

    ds = _read_mat(sf_dir, "documents", columns=["source", "text"])

    def to_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "h": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in texts],
                    type=pa.string(),
                ),
                "source": batch.column("source"),
            }
        )

    rows = ds.map_batches(to_rows, batch_format="pyarrow")
    annotated = annotate_bucket_size(rows, "h", out_col="n_copies")

    def partials(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "n_dup_docs": pa.array([], type=pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        src = np.asarray(b.column("source").to_pylist(), dtype=object)
        n = b.column("n_copies").to_numpy(zero_copy_only=False)
        codes, uniq = pd_factorize(src)
        kk = len(uniq)
        return pa.table(
            {
                "source": pa.array(uniq, type=pa.string()),
                "n_docs": pa.array(np.bincount(codes, minlength=kk).astype(np.int64)),
                "n_dup_docs": pa.array(
                    np.bincount(codes, weights=(n >= 2), minlength=kk).astype(np.int64)
                ),
            }
        )

    part = annotated.map_batches(partials, batch_format="pyarrow")
    agg = sorted_aggregate(
        part,
        ["source"],
        {"n_docs": ("n_docs", "sum"), "n_dup_docs": ("n_dup_docs", "sum")},
        empty_types={"source": pa.string()},
    )

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy(zero_copy_only=False)
        dup = b.column("n_dup_docs").to_numpy(zero_copy_only=False)
        ratio = dup.astype(np.float64) / nd.astype(np.float64)
        return b.append_column("dup_ratio", pa.array(ratio, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


QUERIES["dup_ratio_per_source"] = q_dup_ratio_per_source

ORACLE_SQL["dup_ratio_per_source"] = """
WITH t AS (SELECT source, md5(text) AS h FROM documents),
c AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY h),
j AS (SELECT t.source, c.n FROM t JOIN c USING (h))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_ratio
FROM j GROUP BY source
"""


def q_minhash_estimate_vs_exact(sf_dir: str, n_perm: int = 8):
    """Sketch-calibration report: for every MinHash-banding candidate pair,
    the number of matching signature minima (the MinHash Jaccard estimator's
    numerator) NEXT TO the exact distinct-gram intersection/union — the
    table an operator reads to pick num_perm / band shape for a target
    corpus (Broder 1997's estimator, public).  est_jaccard = n_match /
    n_perm and exact_jaccard = n_inter / n_union are each ONE double
    division of exact integers, so DuckDB matches bitwise.

    Oracle FIXTURE like its md5-minhash siblings (q_minhash_oracle /
    q_minhash_band_pairs — the md5-per-gram hash IS the DuckDB contract;
    production signatures are the vectorised splitmix family).  Fully
    distributed: candidate pairs get text_a/text_b attached via the gated
    broadcast / two-hash-join policy (_pairs_with_texts) and the per-pair
    signature + gram-set math runs inside map_batches with a per-batch doc
    cache — NOTHING data-proportional (no pair list, no gram dicts) ever
    lands on the driver, so a dup-heavy corpus with an unbounded candidate
    set streams through like every other pair verifier."""
    from ..util import heal

    pairs = q_minhash_band_pairs(sf_dir, n_perm=n_perm).map_batches(
        lambda b: pa.table({"ua": b.column("doc_a"), "ub": b.column("doc_b")}),
        batch_format="pyarrow",
    )
    docs = _read_mat(sf_dir, "documents", columns=["doc_id", "text"])
    with_texts = _pairs_with_texts(pairs, docs)

    def per_pair(batch: pa.Table) -> pa.Table:
        import hashlib

        ua = batch.column("ua").to_numpy(zero_copy_only=False)
        ub = batch.column("ub").to_numpy(zero_copy_only=False)
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # a doc appears in many candidate pairs: its signature and sorted
        # gram-hash set are computed once per batch
        cache: dict = {}

        def doc_state(uid, text):
            if uid not in cache:
                wds = text.split(" ")
                grams = {
                    " ".join(wds[j : j + 3]) for j in range(len(wds) - 2)
                }
                sig = [
                    min(
                        hashlib.md5(f"{p}|{g}".encode()).hexdigest()
                        for g in grams
                    )
                    if grams
                    else ""
                    for p in range(n_perm)
                ]
                hv = np.array(
                    sorted(
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        for g in grams
                    ),
                    dtype=np.int64,
                )
                cache[uid] = (sig, hv)
            return cache[uid]

        n = len(ua)
        m_arr = np.empty(n, dtype=np.int64)
        i_arr = np.empty(n, dtype=np.int64)
        u_arr = np.empty(n, dtype=np.int64)
        for j in range(n):
            sa, ga = doc_state(ua[j], ta[j])
            sb, gb = doc_state(ub[j], tb[j])
            m_arr[j] = sum(x == y for x, y in zip(sa, sb))
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            i_arr[j] = inter
            u_arr[j] = len(ga) + len(gb) - inter
        return pa.table(
            {
                "doc_a": pa.array(ua),
                "doc_b": pa.array(ub),
                "n_match": pa.array(m_arr),
                "n_inter": pa.array(i_arr),
                "n_union": pa.array(u_arr),
                "est_jaccard": pa.array(
                    m_arr.astype(np.float64) / np.float64(n_perm),
                    type=pa.float64(),
                ),
                "exact_jaccard": pa.array(
                    i_arr.astype(np.float64) / u_arr.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return heal(
        with_texts.map_batches(per_pair, batch_format="pyarrow"),
        doc_a=pa.int64(), doc_b=pa.int64(), n_match=pa.int64(),
        n_inter=pa.int64(), n_union=pa.int64(),
        est_jaccard=pa.float64(), exact_jaccard=pa.float64(),
    )


QUERIES["minhash_estimate_vs_exact"] = q_minhash_estimate_vs_exact

ORACLE_SQL["minhash_estimate_vs_exact"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g_all AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
), mh AS (
  SELECT doc_id, p AS perm,
         min(md5(CAST(p AS VARCHAR) || '|' || g)) AS m
  FROM g_all CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS p)
  GROUP BY doc_id, p
), bands AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(m, '|' ORDER BY perm) AS sig
  FROM mh GROUP BY doc_id, band
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
), match AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_match
  FROM pairs p
  JOIN mh x ON x.doc_id = p.doc_a
  JOIN mh y ON y.doc_id = p.doc_b AND y.perm = x.perm AND y.m = x.m
  GROUP BY 1, 2
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g_all GROUP BY doc_id
), inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN g_all ga ON ga.doc_id = p.doc_a
  JOIN g_all gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       COALESCE(m.n_match, 0) AS n_match,
       COALESCE(i.n_inter, 0) AS n_inter,
       CAST(sa.sz + sb.sz - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
       CAST(COALESCE(m.n_match, 0) AS DOUBLE) / 8.0 AS est_jaccard,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(sa.sz + sb.sz - COALESCE(i.n_inter, 0) AS DOUBLE)
         AS exact_jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN match m ON m.doc_a = p.doc_a AND m.doc_b = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
"""


def q_token_len_histogram(sf_dir: str):
    """Log2-bucketed document-length histogram per language — the corpus
    shape report behind sequence-length planning (bucket b holds docs with
    2^(b-1) <= n_tokens < 2^b, i.e. b = bit-length of the token count).

    Vectorised: token counts from one Arrow split (list lengths, no
    flatten), buckets via log2 (exact for the only boundary case, powers of
    two), per-(lang, bucket) partials per block, one tiny sorted
    aggregation.  The shuffle carries O(blocks x langs x 64) rows — never
    O(docs)."""
    from ..stages.groupagg import sorted_aggregate

    ds = _read_mat(sf_dir, "documents", columns=["lang", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "min_tokens": pa.array([], type=pa.int64()),
                "max_tokens": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ws = pc.split_pattern(batch.column("text"), " ")
        la = ws.combine_chunks() if isinstance(ws, pa.ChunkedArray) else ws
        n_tok = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.floor(np.log2(np.maximum(n_tok, 1))).astype(np.int64) + 1
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        codes, uniq = pd_factorize(langs)
        key = codes * 65 + bucket
        cnt = np.bincount(key, minlength=len(uniq) * 65)
        nz = np.flatnonzero(cnt)
        mins = np.full(len(uniq) * 65, np.iinfo(np.int64).max, dtype=np.int64)
        maxs = np.zeros(len(uniq) * 65, dtype=np.int64)
        np.minimum.at(mins, key, n_tok)
        np.maximum.at(maxs, key, n_tok)
        return pa.table(
            {
                "lang": pa.array(uniq[nz // 65], type=pa.string()),
                "bucket": pa.array((nz % 65).astype(np.int64)),
                "n_docs": pa.array(cnt[nz].astype(np.int64)),
                "min_tokens": pa.array(mins[nz]),
                "max_tokens": pa.array(maxs[nz]),
            }
        )

    return sorted_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["lang", "bucket"],
        {
            "n_docs": ("n_docs", "sum"),
            "min_tokens": ("min_tokens", "min"),
            "max_tokens": ("max_tokens", "max"),
        },
        empty_types={"lang": pa.string(), "bucket": pa.int64()},
    )


QUERIES["token_len_histogram"] = q_token_len_histogram

ORACLE_SQL["token_len_histogram"] = """
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS n FROM documents
)
SELECT lang, CAST(length(bin(n)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n) AS BIGINT) AS min_tokens,
       CAST(max(n) AS BIGINT) AS max_tokens
FROM t GROUP BY lang, bucket
"""


QUERIES["minhash_recall_report"] = q_minhash_recall_report
# corpus-level banding quality: exact-truth vs banding-candidate pair sets
# composed as nested-CTE subqueries of their own green oracles
ORACLE_SQL["minhash_recall_report"] = (
    "WITH truth AS (SELECT doc_a, doc_b FROM ("
    + ORACLE_SQL["ngram_jaccard_pairs"]
    + ")), cand AS (SELECT doc_a, doc_b FROM ("
    + ORACLE_SQL["minhash_band_pairs"]
    + ")), hit AS ("
    "  SELECT doc_a, doc_b FROM truth"
    "  INTERSECT SELECT doc_a, doc_b FROM cand"
    ") "
    "SELECT (SELECT COUNT(*) FROM truth) AS n_true, "
    "       (SELECT COUNT(*) FROM cand) AS n_candidates, "
    "       (SELECT COUNT(*) FROM hit) AS n_hit, "
    "       CASE WHEN (SELECT COUNT(*) FROM truth) > 0 "
    "            THEN CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)"
    "                 / (SELECT COUNT(*) FROM truth) ELSE 0.0 END AS recall, "
    "       CASE WHEN (SELECT COUNT(*) FROM cand) > 0 "
    "            THEN CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)"
    "                 / (SELECT COUNT(*) FROM cand) ELSE 0.0 END AS prec"
)
