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


def simhash_batch(batch: pa.Table, *, k: int) -> pa.Table:
    key_col = "doc_id" if "doc_id" in batch.column_names else "url"
    texts = batch.column("text").to_pylist()
    vals = np.array([simhash_text(t, k) for t in texts], dtype=np.int64)
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

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(key_col).to_pylist()))
        if len(ids) < 2 or len(ids) > 256:
            return pa.table({"id_a": pa.array([], type=key_type),
                             "id_b": pa.array([], type=key_type)})
        out_a, out_b = [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                out_a.append(ids[x])
                out_b.append(ids[y])
        return pa.table({"id_a": pa.array(out_a, type=key_type),
                         "id_b": pa.array(out_b, type=key_type)})

    p = b.groupby(["band", "prefix"]).map_groups(pairs, batch_format="pyarrow")
    return p.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n"))
