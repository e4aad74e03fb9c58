"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary``/``large_binary``
columns; decode / resize / feature-extract run as actor-pool ``map_batches``
stages (model/codec state in ``__init__``).  Decoder slots:

  * ``decoder="strict"`` -> REAL pure-python codecs for the container formats
    parseable without external libraries: PPM (P6/P3), uncompressed 24/32-bit
    BMP, and PCM16 WAV.  Unknown magic raises ValueError (the external-codec
    slot — jpeg/png/mp4 need libraries not present in this environment).
  * ``decoder="fake"``   -> a deterministic content-hash pseudo-decoder for
    plumbing tests on arbitrary bytes.

At 100-TB scale the operative knobs are small ``batch_size`` (payloads are
MB-scale: batch x concurrency must fit worker heap) and dropping the payload
column immediately after feature extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..hashing import splitmix64


def decode_ppm(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """(pixels float64 flat, width, height, channels) from P6/P3 PPM."""
    parts = []
    i = 0
    # header: magic, width, height, maxval with comment support
    while len(parts) < 4 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        parts.append(payload[i:j])
        i = j
    magic, w, h, maxval = parts[0], int(parts[1]), int(parts[2]), int(parts[3])
    i += 1  # single whitespace after maxval
    if magic == b"P6":
        dt = np.uint8 if maxval < 256 else ">u2"
        px = np.frombuffer(payload, dtype=dt, count=w * h * 3, offset=i)
    elif magic == b"P3":
        px = np.array(payload[i:].split()[: w * h * 3], dtype=np.int64)
    else:
        raise ValueError(f"not a PPM: {magic!r}")
    return px.astype(np.float64), w, h, 3


def decode_bmp(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Uncompressed 24/32-bit BI_RGB BMP -> (pixels, width, height, channels)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    nch = bpp // 8
    row_bytes = ((w * nch + 3) // 4) * 4
    rows = []
    for r in range(abs(h)):
        start = off + r * row_bytes
        rows.append(np.frombuffer(payload, dtype=np.uint8, count=w * nch, offset=start))
    px = np.concatenate(rows) if rows else np.empty(0, dtype=np.uint8)
    return px.astype(np.float64), w, abs(h), nch


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """PCM16 WAV -> (samples, n_samples, sample_rate, channels)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    fmt = None
    data = None
    rate = 0
    nch = 1
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            fmt = payload[i + 8 : i + 8 + sz]
            audio_fmt = int.from_bytes(fmt[0:2], "little")
            nch = int.from_bytes(fmt[2:4], "little")
            rate = int.from_bytes(fmt[4:8], "little")
            bits = int.from_bytes(fmt[14:16], "little")
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", count=sz // 2, offset=i + 8)
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("truncated WAV")
    return data.astype(np.float64), len(data) // max(nch, 1), rate, nch


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
            return self._decode_strict(payload)
        from hashlib import blake2b

        h = int.from_bytes(blake2b(payload, digest_size=8).digest(), "little")
        with np.errstate(over="ignore"):
            vals = splitmix64(np.uint64(h) ^ self.seeds)
        return (vals.astype(np.float64) / 2**64).astype(np.float32)

    def _decode_strict(self, payload: bytes) -> np.ndarray:
        """Real decode: dispatch on magic bytes, reduce the decoded signal to
        a fixed-dim feature vector [w, h, ch, mean, std, min, max, 8-bin
        histogram...] padded/truncated to ``dim``."""
        if payload[:2] in (b"P6", b"P3"):
            px, w, h, ch = decode_ppm(payload)
            hist_max = 255.0
        elif payload[:2] == b"BM":
            px, w, h, ch = decode_bmp(payload)
            hist_max = 255.0
        elif payload[:4] == b"RIFF":
            px, w, h, ch = decode_wav(payload)  # w=n_samples, h=rate
            hist_max = 32768.0
        else:
            raise ValueError(
                f"unknown payload magic {payload[:4]!r}: jpeg/png/mp4 decode "
                "requires codec libraries not present in this environment"
            )
        if len(px) == 0:
            stats = [0.0, 0.0, 0.0, 0.0]
            hist = np.zeros(8)
        else:
            stats = [float(px.mean()), float(px.std()), float(px.min()), float(px.max())]
            hist, _ = np.histogram(px, bins=8, range=(-hist_max, hist_max))
            hist = hist / len(px)
        feat = np.array([float(w), float(h), float(ch)] + stats + hist.tolist())
        out = np.zeros(self.dim, dtype=np.float64)
        out[: min(self.dim, len(feat))] = feat[: self.dim]
        return out.astype(np.float32)

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


def resize_nearest(
    px: np.ndarray, w: int, h: int, ch: int, out_w: int, out_h: int
) -> np.ndarray:
    """Nearest-neighbour image resize (pure numpy index gather):
    out[y, x] = in[(y*h)//out_h, (x*w)//out_w].  Returns the flat pixel
    array of the (out_h, out_w, ch) image."""
    img = px.reshape(h, w, ch)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs].reshape(-1)


class ImageResizer:
    """Actor stage: (id, payload:binary image) -> (id, payload:resized P6,
    width, height, px_sum).  REAL decode (PPM/BMP) + nearest-neighbour
    resize + P6 re-encode; binary in, binary out — the thumbnailing shape of
    an image-curation pipeline.  Unknown magic raises ValueError (jpeg/png
    need codec libraries absent here)."""

    def __init__(self, *, out_w: int = 4, out_h: int = 3):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col = batch.column_names[0]
        payloads = batch.column("payload").to_pylist()
        outs, sums = [], []
        header = f"P6\n{self.out_w} {self.out_h}\n255\n".encode()
        for p in payloads:
            p = p or b""
            if p[:2] in (b"P6", b"P3"):
                px, w, h, ch = decode_ppm(p)
            elif p[:2] == b"BM":
                px, w, h, ch = decode_bmp(p)
            else:
                raise ValueError(f"unknown image magic {p[:4]!r}")
            small = resize_nearest(px, w, h, ch, self.out_w, self.out_h)
            sums.append(int(small.sum()))
            outs.append(header + np.clip(small, 0, 255).astype(np.uint8).tobytes())
        return pa.table(
            {
                key_col: batch.column(key_col),
                "payload": pa.array(outs, type=pa.large_binary()),
                "width": pa.array(
                    np.full(len(outs), self.out_w, dtype=np.int64)
                ),
                "height": pa.array(
                    np.full(len(outs), self.out_h, dtype=np.int64)
                ),
                "px_sum": pa.array(sums, type=pa.int64()),
            }
        )


class FrameSampler:
    """Actor stage: (id, payload:binary video) -> one row per SAMPLED frame
    (id, frame_idx, width, height, px_sum).  The parseable container here is
    a concatenated-P6 stream (motion-PPM); every ``every``-th frame is kept.
    Real video codecs (mp4/webm) need libraries absent in this environment:
    unknown magic raises NotImplementedError, keeping the Ray-side plumbing
    (row expansion, actor state, binary batches) real and tested."""

    def __init__(self, *, every: int = 2):
        self.every = every

    def _frames(self, payload: bytes):
        i = 0
        idx = 0
        while i < len(payload):
            if payload[i : i + 2] != b"P6":
                raise NotImplementedError(
                    f"unknown video container magic {payload[i:i+4]!r}: "
                    "mp4/webm frame decode requires codec libraries not "
                    "present in this environment"
                )
            # header: P6\n{w} {h}\n255\n
            j = payload.index(b"\n", i)
            w_s, h_s = payload[j + 1 : payload.index(b"\n", j + 1)].split()
            w, h = int(w_s), int(h_s)
            j2 = payload.index(b"\n", j + 1)
            j3 = payload.index(b"\n", j2 + 1)  # end of maxval line
            body = j3 + 1
            n = w * h * 3
            yield idx, w, h, payload[body : body + n]
            i = body + n
            idx += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col = batch.column_names[0]
        keys = batch.column(key_col).to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_k, out_f, out_w, out_h, out_s = [], [], [], [], []
        for kv, p in zip(keys, payloads):
            for idx, w, h, body in self._frames(p or b""):
                if idx % self.every:
                    continue
                out_k.append(kv)
                out_f.append(idx)
                out_w.append(w)
                out_h.append(h)
                out_s.append(int(np.frombuffer(body, dtype=np.uint8).sum()))
        return pa.table(
            {
                key_col: pa.array(out_k, type=batch.column(key_col).type),
                "frame_idx": pa.array(out_f, type=pa.int64()),
                "width": pa.array(out_w, type=pa.int64()),
                "height": pa.array(out_h, type=pa.int64()),
                "px_sum": pa.array(out_s, type=pa.int64()),
            }
        )
