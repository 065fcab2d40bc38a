"""PLY model IO: native multithreaded loader with a numpy fallback.

The 3DGS ecosystem (the trainers consuming the reference rasterizer) stores
Gaussian models as binary-little-endian PLY with an all-float32 vertex
element: x y z nx ny nz f_dc_0..2 f_rest_0..(3M-4) opacity scale_0..2
rot_0..3. This module loads/saves that format:

  * the hot path is a C++ shared library (native/ply_io.cpp) built on first
    use with g++ — header parse + threaded pread straight into a [N, P]
    float32 array (a 5M-Gaussian garden-scale model is ~1.4 GB; parsing it
    in Python would dominate load time);
  * a pure-numpy fallback covers environments without a toolchain.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading
from typing import Dict

import numpy as np

_NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "ply_io.cpp",
)
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_native():
    """Build (once) and load the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        so_path = os.path.join(os.path.dirname(_NATIVE_SRC), "ply_io.so")
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(_NATIVE_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     "-std=c++17", _NATIVE_SRC, "-o", so_path],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so_path)
            lib.ply_read_header.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.ply_read_data.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            lib.ply_write.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def read_ply(path: str, n_threads: int = 8) -> Dict[str, np.ndarray]:
    """Read an all-float32 binary-LE PLY into {property: [N] float32}."""
    lib = _load_native()
    if lib is not None:
        names_buf = ctypes.create_string_buffer(1 << 16)
        n_verts = ctypes.c_long()
        n_props = ctypes.c_int()
        offset = ctypes.c_long()
        rc = lib.ply_read_header(
            path.encode(), names_buf, len(names_buf),
            ctypes.byref(n_verts), ctypes.byref(n_props), ctypes.byref(offset),
        )
        if rc == 0:
            names = names_buf.value.decode().split("\n")
            data = np.empty((n_verts.value, n_props.value), np.float32)
            rc = lib.ply_read_data(
                path.encode(), offset.value, n_verts.value, n_props.value,
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_threads,
            )
            if rc == 0:
                return {name: data[:, i] for i, name in enumerate(names)}
    return _read_ply_numpy(path)


def _read_ply_numpy(path: str) -> Dict[str, np.ndarray]:
    """Pure-numpy fallback (same all-float32 binary-LE subset)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        names = []
        n_verts = 0
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated PLY header")
            parts = line.split()
            if parts[0] == b"format":
                assert parts[1] == b"binary_little_endian", parts[1]
            elif parts[0] == b"element" and parts[1] == b"vertex":
                n_verts = int(parts[2])
            elif parts[0] == b"property":
                assert parts[1] in (b"float", b"float32"), parts[1]
                names.append(parts[2].decode())
            elif parts[0] == b"end_header":
                break
        data = np.fromfile(f, dtype="<f4", count=n_verts * len(names))
    data = data.reshape(n_verts, len(names))
    return {name: data[:, i] for i, name in enumerate(names)}


def write_ply(path: str, props: Dict[str, np.ndarray]):
    """Write {property: [N] float32} as binary-LE PLY (column order kept)."""
    names = list(props.keys())
    data = np.stack(
        [np.asarray(props[n], np.float32) for n in names], axis=1
    )
    data = np.ascontiguousarray(data, np.float32)
    lib = _load_native()
    if lib is not None:
        rc = lib.ply_write(
            path.encode(), "\n".join(names).encode(),
            data.shape[0], data.shape[1],
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {data.shape[0]}\n".encode())
        for n in names:
            f.write(f"property float {n}\n".encode())
        f.write(b"end_header\n")
        data.astype("<f4").tofile(f)


# --------------------------------------------------------------------------
# GaussianModel <-> 3DGS PLY layout
# --------------------------------------------------------------------------

def load_gaussian_model(path: str, n_threads: int = 8):
    """Load a 3DGS-format PLY into a GaussianModel (raw parameters)."""
    import jax.numpy as jnp

    from ..models.gaussians import GaussianModel

    p = read_ply(path, n_threads=n_threads)
    n = p["x"].shape[0]
    means = np.stack([p["x"], p["y"], p["z"]], axis=1)
    sh_dc = np.stack(
        [p["f_dc_0"], p["f_dc_1"], p["f_dc_2"]], axis=1
    )[:, None, :]  # [N, 1, 3]
    rest_names = sorted(
        (k for k in p if k.startswith("f_rest_")),
        key=lambda k: int(k.split("_")[-1]),
    )
    if rest_names:
        # 3DGS layout: f_rest is channel-major [3, M-1] flattened.
        rest = np.stack([p[k] for k in rest_names], axis=1)  # [N, 3*(M-1)]
        m1 = len(rest_names) // 3
        sh_rest = rest.reshape(n, 3, m1).transpose(0, 2, 1)  # [N, M-1, 3]
    else:
        sh_rest = np.zeros((n, 0, 3), np.float32)
    scales_log = np.stack(
        [p["scale_0"], p["scale_1"], p["scale_2"]], axis=1
    )
    rots = np.stack(
        [p["rot_0"], p["rot_1"], p["rot_2"], p["rot_3"]], axis=1
    )
    return GaussianModel(
        means3d=jnp.asarray(means),
        scales_log=jnp.asarray(scales_log),
        rotations=jnp.asarray(rots),
        opacity_logit=jnp.asarray(p["opacity"]),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
    )


def save_gaussian_model(path: str, model):
    """Save a GaussianModel in the standard 3DGS PLY layout."""
    n = model.num_gaussians
    means = np.asarray(model.means3d, np.float32)
    props = {
        "x": means[:, 0], "y": means[:, 1], "z": means[:, 2],
        "nx": np.zeros(n, np.float32),
        "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    sh_dc = np.asarray(model.sh_dc, np.float32)
    for c in range(3):
        props[f"f_dc_{c}"] = sh_dc[:, 0, c]
    sh_rest = np.asarray(model.sh_rest, np.float32)  # [N, M-1, 3]
    rest_cm = sh_rest.transpose(0, 2, 1).reshape(n, -1)  # channel-major
    for i in range(rest_cm.shape[1]):
        props[f"f_rest_{i}"] = rest_cm[:, i]
    props["opacity"] = np.asarray(model.opacity_logit, np.float32)
    scales = np.asarray(model.scales_log, np.float32)
    for c in range(3):
        props[f"scale_{c}"] = scales[:, c]
    rots = np.asarray(model.rotations, np.float32)
    for c in range(4):
        props[f"rot_{c}"] = rots[:, c]
    write_ply(path, props)
