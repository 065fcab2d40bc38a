"""PNG codec: native round-trip, every filter type, python-fallback parity."""

import struct
import zlib

import numpy as np
import pytest

from stopthepop_tpu.io import images as im


def _rand_img(h, w, c, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, c), dtype=np.uint8
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip(tmp_path, channels):
    img = _rand_img(23, 17, channels, seed=channels)
    p = str(tmp_path / f"rt{channels}.png")
    im.write_png(p, img)
    back = im.read_png(p)
    np.testing.assert_array_equal(back, img)
    # The pure-python decoder must agree with the native one.
    np.testing.assert_array_equal(im._read_png_python(p), img)


def _encode_with_filters(img, filters):
    """Hand-build a PNG whose scanlines use the given per-row filter types."""
    h, w, c = img.shape
    x = img.astype(np.int32)
    rows = []
    for y in range(h):
        cur = x[y].reshape(-1)
        prev = x[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        ft = filters[y % len(filters)]
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        rows.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
    raw = b"".join(rows)

    def chunk(t, payload):
        return (struct.pack(">I", len(payload)) + t + payload
                + struct.pack(">I", zlib.crc32(t + payload) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filter_types(tmp_path, filters):
    img = _rand_img(12, 9, 3, seed=sum(filters) + 1)
    p = str(tmp_path / "f.png")
    with open(p, "wb") as f:
        f.write(_encode_with_filters(img, filters))
    np.testing.assert_array_equal(im.read_png(p), img)
    np.testing.assert_array_equal(im._read_png_python(p), img)


def test_read_batch(tmp_path):
    paths = []
    for i in range(5):
        img = _rand_img(8, 8, 4, seed=i)
        p = str(tmp_path / f"b{i}.png")
        im.write_png(p, img)
        paths.append(p)
    out = im.read_png_batch(paths, n_threads=4)
    assert len(out) == 5
    np.testing.assert_array_equal(out[3], im.read_png(paths[3]))


def test_to_float_rgb_alpha_composite():
    img = np.zeros((2, 2, 4), np.uint8)
    img[..., 0] = 255          # red
    img[..., 3] = 128          # half alpha
    bg = np.array([0.0, 0.0, 1.0], np.float32)
    out = im.to_float_rgb(img, bg)
    a = 128.0 / 255.0
    np.testing.assert_allclose(out[0, 0], [a, 0.0, 1.0 - a], atol=1e-6)
    # gray -> replicated to 3 channels
    g = np.full((2, 2, 1), 100, np.uint8)
    np.testing.assert_allclose(im.to_float_rgb(g)[0, 0], [100 / 255.0] * 3)


def test_unsupported_reports_clearly(tmp_path):
    # 16-bit PNG must raise ValueError, not silently mis-decode.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def chunk(t, payload):
        return (struct.pack(">I", len(payload)) + t + payload
                + struct.pack(">I", zlib.crc32(t + payload) & 0xFFFFFFFF))

    raw = zlib.compress(bytes(2 * (1 + 2 * 3 * 2)))
    p = str(tmp_path / "u.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        im.read_png(p)
