"""SimHash (Charikar) near-dup sketch over shingle hashes.

63-bit simhash: bit j of the sketch is 1 iff the tf-weighted sum of bit j
over all shingle hashes is positive.  Vectorized: per doc, unpack the shingle
hash matrix to bits and reduce.  Near-dup detection = grouping by rotated
prefixes (Manku et al. web-dedup, public algorithm) — exposed separately.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import shingle_hashes


def simhash_text(text: str, k: int) -> int:
    h = shingle_hashes(text, k)
    if len(h) == 0:
        return 0
    u = h.astype(np.uint64)
    bits = ((u[:, None] >> np.arange(63, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = 2 * bits.sum(axis=0) - len(u)  # (+1/-1 vote per shingle)
    out = np.uint64(0)
    for j in range(63):
        if votes[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


_SIMHASH_SLAB = 1 << 20  # shingle hashes per unpack slab (~63 MiB of uint8 bits)


def simhash_batch(batch: pa.Table, *, k: int) -> pa.Table:
    """Batch simhash, values identical to simhash_text per doc (pinned by
    tests/test_rows_only_pins.py).

    Memory-bounded: the bit matrix is unpacked as uint8 (1 byte/bit, not the
    int64 8) and in fixed ``_SIMHASH_SLAB``-shingle slabs whose partial
    per-doc bit sums accumulate into a (docs, 63) int64 table — peak extra
    memory is ~63 MiB per map task regardless of batch size or doc length
    (a doc longer than a slab just contributes partials from several slabs).
    """
    key_col = "doc_id" if "doc_id" in batch.column_names else "url"
    texts = batch.column("text").to_pylist()
    hs = [shingle_hashes(t, k) for t in texts]
    lens = np.array([len(h) for h in hs], dtype=np.int64)
    vals = np.zeros(len(texts), dtype=np.int64)
    nz = np.flatnonzero(lens)
    if len(nz):
        all_h = np.ascontiguousarray(np.concatenate([hs[i] for i in nz]).astype(np.uint64))
        lens_nz = lens[nz]
        starts = np.r_[0, np.cumsum(lens_nz)[:-1]]
        sums = np.zeros((len(nz), 63), dtype=np.int64)
        for lo in range(0, len(all_h), _SIMHASH_SLAB):
            hi = min(lo + _SIMHASH_SLAB, len(all_h))
            # little-endian uint64 -> byte view -> little bit order: column j
            # of the unpacked matrix IS bit j of the hash
            bits = np.unpackbits(
                all_h[lo:hi].view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )[:, :63]
            d0 = int(np.searchsorted(starts, lo, side="right")) - 1
            d1 = int(np.searchsorted(starts, hi, side="left"))
            local = np.maximum(starts[d0:d1] - lo, 0)
            sums[d0:d1] += np.add.reduceat(bits, local, axis=0, dtype=np.int64)
        votes = 2 * sums - lens_nz[:, None]
        sketch = ((votes > 0).astype(np.uint64) << np.arange(63, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        vals[nz] = sketch.astype(np.int64)
    return pa.table({key_col: batch.column(key_col), "simhash": pa.array(vals)})


def simhash_docs(docs, *, k: int = 5):
    return docs.map_batches(lambda b: simhash_batch(b, k=k), batch_format="pyarrow")


def hamming_candidates(sim_ds, *, prefix_bits: int = 16, num_partitions: int = 16):
    """Manku-style candidate pairs: docs sharing any of 4 rotated
    ``prefix_bits``-bit prefixes of their simhash (catches hamming distance
    <= 3 whp for 63-bit sketches split into 4 blocks)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    key_col = "doc_id" if "doc_id" in sim_ds.schema().names else "url"

    def bands(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = batch.column(key_col).to_pylist()
        out_band, out_key, out_id = [], [], []
        for rot in range(4):
            rotated = ((s << np.uint64(16 * rot)) | (s >> np.uint64(64 - 16 * rot))) & np.uint64(
                (1 << 63) - 1
            )
            prefix = (rotated >> np.uint64(63 - prefix_bits)).astype(np.int64)
            out_band.extend([rot] * len(s))
            out_key.extend(prefix.tolist())
            out_id.extend(keys)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int64()),
                "prefix": pa.array(out_key, type=pa.int64()),
                key_col: pa.array(out_id),
            }
        )

    b = sim_ds.map_batches(bands, batch_format="pyarrow")

    key_type = pa.string() if key_col == "url" else pa.int64()
    bucket_cap = 256

    # Sort by (band, prefix) once and emit each bucket's pairs per sorted
    # block (per-group map_groups costs ~0.6 ms/group — groupagg.py); bucket
    # postings of the block's first/last key pair on the driver.
    import ray

    from ..stages.groupagg import sorted_aggregate
    from ..util import ds_from_refs, split_boundary

    s = b.sort(["band", "prefix", key_col])

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], type=key_type),
                "id_b": pa.array([], type=key_type),
                "_bnd_band": pa.array([], type=pa.int64()),
                "_bnd_prefix": pa.array([], type=pa.int64()),
                "_boundary": pa.array([], type=pa.bool_()),
            }
        )
        if batch.num_rows == 0:
            return empty
        band = batch.column("band").to_numpy(zero_copy_only=False)
        pref = batch.column("prefix").to_numpy(zero_copy_only=False)
        keys = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        n = len(band)
        new = np.r_[True, (band[1:] != band[:-1]) | (pref[1:] != pref[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        gfirst, glast = 0, len(starts) - 1
        out_a, out_b = [], []
        bnd_a, bnd_band, bnd_pref = [], [], []
        for gi, (st, en) in enumerate(zip(starts, ends)):
            ids = np.unique(keys[st:en])
            if gi in (gfirst, glast):
                bnd_a.extend(ids.tolist())
                bnd_band.extend([int(band[st])] * len(ids))
                bnd_pref.extend([int(pref[st])] * len(ids))
                continue
            m = len(ids)
            if m < 2 or m > bucket_cap:
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.extend(ids[ia].tolist())
            out_b.extend(ids[ib].tolist())
        np_pairs, nb = len(out_a), len(bnd_a)
        return pa.table(
            {
                "id_a": pa.array(out_a + bnd_a, type=key_type),
                "id_b": pa.array(out_b + [None] * nb, type=key_type),
                "_bnd_band": pa.array([None] * np_pairs + bnd_band, type=pa.int64()),
                "_bnd_prefix": pa.array([None] * np_pairs + bnd_pref, type=pa.int64()),
                "_boundary": pa.array([False] * np_pairs + [True] * nb),
            }
        )

    part = s.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).materialize()
    int_refs, boundary, n_int = split_boundary(part)
    # interior refs still carry the null _bnd_* columns; strip via raw tasks
    import ray as _ray

    def strip(t: pa.Table):
        t = t.drop_columns(["_bnd_band", "_bnd_prefix"])
        return t, t.num_rows

    stripped = [_ray.remote(num_returns=2)(strip).remote(r) for r in int_refs]
    counts = _ray.get([o[1] for o in stripped])
    refs = [o[0] for o, c in zip(stripped, counts) if c]
    n_int = int(sum(counts))
    if boundary is not None and boundary.num_rows:
        bb = boundary.column("_bnd_band").to_pylist()
        bp = boundary.column("_bnd_prefix").to_pylist()
        bi = boundary.column("id_a").to_pylist()
        groups: dict[tuple, set] = {}
        for band_v, pref_v, id_v in zip(bb, bp, bi):
            groups.setdefault((band_v, pref_v), set()).add(id_v)
        out_a, out_b = [], []
        for ids in groups.values():
            su = sorted(ids)
            m = len(su)
            if m < 2 or m > bucket_cap:
                continue
            for x in range(m):
                for y in range(x + 1, m):
                    out_a.append(su[x])
                    out_b.append(su[y])
        if out_a:
            bt = pa.table(
                {
                    "id_a": pa.array(out_a, type=key_type),
                    "id_b": pa.array(out_b, type=key_type),
                }
            )
            refs = refs + [_ray.put(bt)]
            n_int += bt.num_rows
    pairs_ds = ds_from_refs(refs, count=n_int, id_a=key_type, id_b=key_type)
    return sorted_aggregate(
        pairs_ds, ["id_a", "id_b"], {"n": ("id_a", "count")},
        empty_types=dict(id_a=key_type, id_b=key_type, n=pa.int64()),
    )
