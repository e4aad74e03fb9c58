"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary``/``large_binary``
columns; decode / resize / feature-extract run as actor-pool ``map_batches``
stages (model/codec state in ``__init__``).  The actual codecs are NOT in
this environment, so the decode step is STUBBED:

  * ``decoder="strict"``  -> raises NotImplementedError (the real-codec slot);
  * ``decoder="fake"``    -> a deterministic content-hash pseudo-decoder so
    the Ray-side plumbing (schema, batch size, actor signature, output
    layout) is real and tested end-to-end.

At 100-TB scale the operative knobs are small ``batch_size`` (payloads are
MB-scale: batch x concurrency must fit worker heap) and dropping the payload
column immediately after feature extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..hashing import splitmix64


class BinaryFeatureExtractor:
    """Actor stage: (id, payload:binary) -> (id, n_bytes, features:list<float>).

    State (the "model") is initialised once per actor.  The fake decoder
    derives a deterministic feature vector from the payload bytes.
    """

    def __init__(self, *, dim: int = 16, decoder: str = "fake"):
        if decoder not in ("fake", "strict"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.dim = dim
        self.seeds = splitmix64(np.arange(1, dim + 1, dtype=np.uint64))

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "strict":
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; use decoder='fake' for plumbing tests"
            )
        from hashlib import blake2b

        h = int.from_bytes(blake2b(payload, digest_size=8).digest(), "little")
        with np.errstate(over="ignore"):
            vals = splitmix64(np.uint64(h) ^ self.seeds)
        return (vals.astype(np.float64) / 2**64).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col = batch.column_names[0]
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p if p is not None else b"") for p in payloads]
        return pa.table(
            {
                key_col: batch.column(key_col),
                "n_bytes": pa.array(
                    np.array([len(p) if p else 0 for p in payloads], dtype=np.int64)
                ),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def extract_features(
    ds: Dataset,
    *,
    dim: int = 16,
    decoder: str = "fake",
    batch_size: int = 64,
    concurrency=(1, 4),
) -> Dataset:
    """Actor-pool feature extraction over a binary payload column.

    Small batch_size by design: payload batches are large; the payload column
    is dropped from the output (only id + features move on)."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_kwargs={"dim": dim, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
