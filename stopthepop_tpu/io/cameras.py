"""Dataset camera loading (NeRF-synthetic / Blender ``transforms.json``).

The reference repo contains no dataset code (it is the rasterizer of a larger
3DGS trainer); this supplies the camera half of that trainer for the standard
NeRF-synthetic format (BASELINE config 2, lego), producing matrices in the
torch-3DGS transposed convention the rasterizer expects (config.py).

Camera math mirrors the standard 3DGS loader: the Blender ``transform_matrix``
is camera-to-world in OpenGL convention (camera looks down -z, y up); flip
the y/z axes to the COLMAP-style convention, invert to world-to-view, and
compose with the z-in-[0,1] perspective projection.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, NamedTuple, Optional, Tuple

import numpy as np


class DatasetCamera(NamedTuple):
    viewmatrix: np.ndarray          # [4, 4] transposed world-to-view
    projmatrix: np.ndarray          # [4, 4] transposed world-to-clip
    inv_viewprojmatrix: np.ndarray  # [4, 4]
    campos: np.ndarray              # [3]
    tanfovx: float
    tanfovy: float
    width: int
    height: int
    image_path: Optional[str]       # dataset frame file (if any)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def _projection(znear, zfar, tanfovx, tanfovy) -> np.ndarray:
    """z-in-[0,1] perspective (math convention, pre-transpose)."""
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = 1.0 / tanfovx
    p[1, 1] = 1.0 / tanfovy
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    p[3, 2] = 1.0
    return p


def camera_from_c2w(
    c2w_opengl: np.ndarray,
    fovx: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    image_path: Optional[str] = None,
) -> DatasetCamera:
    """Build a DatasetCamera from an OpenGL camera-to-world matrix."""
    c2w = np.array(c2w_opengl, dtype=np.float64)
    c2w[:3, 1:3] *= -1.0  # OpenGL -> COLMAP-style axes (3DGS convention)
    w2c = np.linalg.inv(c2w)
    campos = c2w[:3, 3].astype(np.float32)

    tanfovx = math.tan(fovx / 2.0)
    fovy = focal2fov(fov2focal(fovx, width), height)
    tanfovy = math.tan(fovy / 2.0)
    proj = _projection(znear, zfar, tanfovx, tanfovy)
    full = proj @ w2c
    return DatasetCamera(
        viewmatrix=w2c.T.astype(np.float32),
        projmatrix=full.T.astype(np.float32),
        inv_viewprojmatrix=np.linalg.inv(full).T.astype(np.float32),
        campos=campos,
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        width=width,
        height=height,
        image_path=image_path,
    )


def load_nerf_synthetic(
    transforms_path: str,
    width: int = 800,
    height: int = 800,
) -> List[DatasetCamera]:
    """Load a Blender transforms_{train,test}.json into DatasetCameras."""
    with open(transforms_path) as f:
        meta = json.load(f)
    fovx = float(meta["camera_angle_x"])
    # Optional size keys (instant-ngp-style datasets and our synthetic
    # generator carry them; classic Blender scenes are 800x800).
    width = int(meta.get("w", width))
    height = int(meta.get("h", height))
    root = os.path.dirname(os.path.abspath(transforms_path))
    cams = []
    for frame in meta["frames"]:
        img = frame.get("file_path")
        if img is not None:
            img = os.path.join(root, img)
            for ext in ("", ".png", ".jpg"):
                if os.path.exists(img + ext):
                    img = img + ext
                    break
        cams.append(
            camera_from_c2w(
                np.asarray(frame["transform_matrix"]),
                fovx, width, height, image_path=img,
            )
        )
    return cams


def to_camera_arrays(cam: DatasetCamera):
    """DatasetCamera -> train.trainer.CameraArrays (jnp)."""
    import jax.numpy as jnp

    from ..train.trainer import CameraArrays

    return CameraArrays(
        viewmatrix=jnp.asarray(cam.viewmatrix),
        projmatrix=jnp.asarray(cam.projmatrix),
        inv_viewprojmatrix=jnp.asarray(cam.inv_viewprojmatrix),
        campos=jnp.asarray(cam.campos),
    )


def orbit_camera(
    theta: float,
    fovx: float,
    width: int,
    height: int,
    radius: float = 4.0,
    cam_height: float = 0.5,
    target=(0.0, 0.0, 0.0),
) -> DatasetCamera:
    """Camera orbiting ``target`` at ``radius``, looking inward (OpenGL
    camera-to-world built from a look-at frame, then converted like the
    Blender loader)."""
    target = np.asarray(target, np.float64)
    pos = target + np.array(
        [radius * math.sin(theta), cam_height, radius * math.cos(theta)]
    )
    forward = target - pos
    forward = forward / np.linalg.norm(forward)
    z = -forward  # OpenGL camera looks down -z
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return camera_from_c2w(c2w, fovx, width, height)
