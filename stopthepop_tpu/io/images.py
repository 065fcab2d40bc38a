"""Dataset image IO: 8-bit PNG read/write.

Runtime component of the training half the reference delegates to its
consuming 3DGS trainer (the reference repo itself has no image IO). Decoding
is done by the native codec in ``native/png_io.cpp`` (zlib inflate + scanline
unfilter, C ABI via ctypes); batches of frames decode in a thread pool since
the native call releases the GIL. A pure numpy+zlib fallback keeps the API
working when no C++ toolchain is available.

Supported subset: 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced —
every frame in the NeRF-synthetic and MipNeRF-360 benchmark datasets.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

_NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "png_io.cpp",
)

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_native():
    """Build (once) and load the native codec; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so_path = os.path.join(os.path.dirname(_NATIVE_SRC), "png_io.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(_NATIVE_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _NATIVE_SRC, "-o", so_path, "-lz"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so_path)
            lib.png_read_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.png_read.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.png_write.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def read_png(path: str) -> np.ndarray:
    """Read an 8-bit PNG into a [H, W, C] uint8 array."""
    lib = _load_native()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        rc = lib.png_read_info(
            path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)
        )
        if rc == 0:
            out = np.empty((h.value, w.value, c.value), np.uint8)
            rc = lib.png_read(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc == 0:
                return out
        if rc == -3:
            raise ValueError(
                f"{path}: unsupported PNG (need 8-bit non-interlaced "
                "gray/RGB/RGBA)"
            )
        if rc is not None and rc != 0:
            raise IOError(f"{path}: PNG decode failed (rc={rc})")
    return _read_png_python(path)


def write_png(path: str, img: np.ndarray) -> None:
    """Write a [H, W, C] or [H, W] uint8 array as an 8-bit PNG."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("write_png expects uint8")
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    lib = _load_native()
    if lib is not None:
        rc = lib.png_write(
            path.encode(),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, c,
        )
        if rc == 0:
            return
        raise IOError(f"{path}: PNG encode failed (rc={rc})")
    _write_png_python(path, img)


def read_image(path: str) -> np.ndarray:
    """Read any supported image into [H, W, C] uint8.

    PNG goes through the native zlib codec; other formats (JPEG in COLMAP /
    MipNeRF-360 captures) decode via Pillow when available.
    """
    if path.lower().endswith(".png"):
        return read_png(path)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - Pillow is in the image
        raise IOError(f"{path}: non-PNG images need Pillow") from e
    with Image.open(path) as im:
        if im.mode not in ("L", "RGB", "RGBA"):
            im = im.convert("RGB")
        arr = np.asarray(im, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def read_png_batch(paths: List[str], n_threads: int = 8) -> List[np.ndarray]:
    """Decode many images in parallel (native decode releases the GIL)."""
    if len(paths) <= 1:
        return [read_image(p) for p in paths]
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        return list(ex.map(read_image, paths))


def to_float_rgb(
    img: np.ndarray, bg: Optional[np.ndarray] = None
) -> np.ndarray:
    """uint8 [H,W,C] -> float32 [H,W,3] in [0,1], alpha composited on ``bg``.

    Matches the standard 3DGS loader: NeRF-synthetic frames are RGBA and get
    premultiplied onto the training background color.
    """
    x = img.astype(np.float32) / 255.0
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[2] == 1:
        return np.repeat(x, 3, axis=2)
    if x.shape[2] == 2:  # gray + alpha
        rgb = np.repeat(x[:, :, :1], 3, axis=2)
        a = x[:, :, 1:2]
    elif x.shape[2] == 4:
        rgb, a = x[:, :, :3], x[:, :, 3:4]
    else:
        return x[:, :, :3]
    if bg is None:
        bg = np.zeros(3, np.float32)
    return rgb * a + np.asarray(bg, np.float32) * (1.0 - a)


# ---------------------------------------------------------------------------
# Pure-Python fallback (numpy + zlib)
# ---------------------------------------------------------------------------

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _read_png_python(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG file")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError(f"{path}: missing IHDR")
    w, h, depth, color, _, _, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"{path}: unsupported PNG (need 8-bit non-interlaced "
            "gray/RGB/RGBA)"
        )
    c = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * c
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    for y in range(h):
        ft, row = int(filters[y]), lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if ft == 0:
            out[y] = row
        elif ft == 1:
            for x in range(c, stride):
                row[x] = (row[x] + row[x - c]) & 0xFF
            out[y] = row
        elif ft == 2:
            out[y] = (row + prev) & 0xFF
        elif ft == 3:
            for x in range(stride):
                a = row[x - c] if x >= c else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
            out[y] = row
        elif ft == 4:
            for x in range(stride):
                a = row[x - c] if x >= c else 0
                b = prev[x]
                d = prev[x - c] if x >= c else 0
                p = a + b - d
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - d)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else d)
                row[x] = (row[x] + pred) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"{path}: bad filter {ft}")
    return out.astype(np.uint8).reshape(h, w, c)


def _write_png_python(path: str, img: np.ndarray) -> None:
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(_SIG)
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
