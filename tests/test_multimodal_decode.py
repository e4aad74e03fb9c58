"""Real pure-python decoders (strict slot): PPM / BMP / WAV round-trips."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from dedup_ray.functions.multimodal import (
    BinaryFeatureExtractor,
    decode_bmp,
    decode_ppm,
    decode_wav,
)


def make_ppm(w, h, seed=3):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes(), px


def make_bmp(w, h, seed=4):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = b"".join(r.tobytes().ljust(row_bytes, b"\0") for r in px)
    off = 54
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body, px.reshape(-1)


def make_wav(n, rate=8000, seed=5):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=n, dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body, samples


def test_ppm_roundtrip():
    payload, px = make_ppm(7, 5)
    out, w, h, ch = decode_ppm(payload)
    assert (w, h, ch) == (7, 5, 3)
    np.testing.assert_array_equal(out, px.astype(np.float64))


def test_ppm_ascii():
    vals = list(range(12))
    payload = b"P3\n2 2\n255\n" + " ".join(map(str, vals)).encode()
    out, w, h, ch = decode_ppm(payload)
    assert (w, h, ch) == (2, 2, 3)
    np.testing.assert_array_equal(out, np.array(vals, dtype=np.float64))


def test_ppm_comment_header():
    payload, px = make_ppm(3, 2)
    payload = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    out, w, h, ch = decode_ppm(payload)
    assert (w, h) == (3, 2)
    np.testing.assert_array_equal(out, px.astype(np.float64))


def test_bmp_roundtrip():
    payload, px = make_bmp(5, 4)
    out, w, h, ch = decode_bmp(payload)
    assert (w, h, ch) == (5, 4, 3)
    np.testing.assert_array_equal(out, px.astype(np.float64))


def test_wav_roundtrip():
    payload, samples = make_wav(64)
    out, n, rate, ch = decode_wav(payload)
    assert (n, rate, ch) == (64, 8000, 1)
    np.testing.assert_array_equal(out, samples.astype(np.float64))


def test_strict_extractor_features():
    ex = BinaryFeatureExtractor(dim=16, decoder="strict")
    ppm, px = make_ppm(4, 4)
    f = ex._decode(ppm)
    assert len(f) == 16
    assert f[0] == 4.0 and f[1] == 4.0 and f[2] == 3.0
    assert abs(f[3] - px.mean()) < 0.5  # float32 rounding
    wav, _ = make_wav(32)
    fw = ex._decode(wav)
    assert fw[0] == 32.0 and fw[1] == 8000.0


def test_strict_extractor_rejects_unknown():
    ex = BinaryFeatureExtractor(decoder="strict")
    with pytest.raises(ValueError, match="unknown payload magic"):
        ex._decode(b"\x89PNG\r\n\x1a\n....")


def test_strict_batch():
    ex = BinaryFeatureExtractor(dim=16, decoder="strict")
    payloads = [make_ppm(3, 3)[0], make_bmp(4, 2)[0], make_wav(16)[0]]
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )
    out = ex(batch)
    assert out.num_rows == 3
    assert out.column_names == ["doc_id", "n_bytes", "features"]
    assert out.column("n_bytes").to_pylist() == [len(p) for p in payloads]


def test_resize_nearest_math():
    import numpy as np

    from dedup_ray.functions.multimodal import resize_nearest

    # 2x2 grayscale-ish (ch=1): out 4x4 should replicate each pixel 2x2
    px = np.array([1.0, 2.0, 3.0, 4.0])
    out = resize_nearest(px, 2, 2, 1, 4, 4).reshape(4, 4)
    assert (out[:2, :2] == 1).all() and (out[:2, 2:] == 2).all()
    assert (out[2:, :2] == 3).all() and (out[2:, 2:] == 4).all()
    # identity resize
    assert (resize_nearest(px, 2, 2, 1, 2, 2) == px).all()


def test_image_resizer_ppm_and_bmp():
    from dedup_ray.functions.multimodal import ImageResizer, decode_ppm

    rz = ImageResizer(out_w=4, out_h=3)
    payloads = [make_ppm(8, 6)[0], make_bmp(5, 4)[0]]
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )
    out = rz(batch)
    assert out.column("width").to_pylist() == [4, 4]
    assert out.column("height").to_pylist() == [3, 3]
    # the emitted payload is itself a decodable P6 of the right dims
    for p, s in zip(out.column("payload").to_pylist(), out.column("px_sum").to_pylist()):
        px, w, h, ch = decode_ppm(p)
        assert (w, h, ch) == (4, 3, 3)
        assert int(px.sum()) == s
    with pytest.raises(ValueError, match="unknown image magic"):
        rz(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "payload": pa.array([b"\xff\xd8\xff\xe0JFIF"], type=pa.large_binary()),
                }
            )
        )


def test_frame_sampler():
    import numpy as np

    from dedup_ray.functions.multimodal import FrameSampler

    # 3 frames of 2x1: bodies [0..5], [6..11], [12..17]
    header = b"P6\n2 1\n255\n"
    frames = [bytes(range(f * 6, f * 6 + 6)) for f in range(3)]
    stream = b"".join(header + f for f in frames)
    fs = FrameSampler(every=2)
    out = fs(
        pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "payload": pa.array([stream], type=pa.large_binary()),
            }
        )
    )
    assert out.column("frame_idx").to_pylist() == [0, 2]
    assert out.column("px_sum").to_pylist() == [
        int(np.frombuffer(frames[0], np.uint8).sum()),
        int(np.frombuffer(frames[2], np.uint8).sum()),
    ]
    with pytest.raises(NotImplementedError, match="codec libraries"):
        fs(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "payload": pa.array([b"\x00\x00\x00 ftypmp42"], type=pa.large_binary()),
                }
            )
        )
