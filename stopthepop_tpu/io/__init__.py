"""Model and dataset IO: PLY checkpoints, dataset camera loading."""

from .cameras import (
    DatasetCamera,
    camera_from_c2w,
    focal2fov,
    fov2focal,
    load_nerf_synthetic,
    to_camera_arrays,
)
from .colmap import (
    ColmapCamera,
    ColmapImage,
    ColmapPoints,
    camera_from_colmap,
    load_colmap,
    qvec2rotmat,
)
from .images import (
    read_png,
    read_png_batch,
    to_float_rgb,
    write_png,
)
from .ply import (
    load_gaussian_model,
    read_ply,
    save_gaussian_model,
    write_ply,
)

__all__ = [
    "ColmapCamera",
    "ColmapImage",
    "ColmapPoints",
    "DatasetCamera",
    "camera_from_c2w",
    "camera_from_colmap",
    "load_colmap",
    "qvec2rotmat",
    "focal2fov",
    "fov2focal",
    "load_gaussian_model",
    "load_nerf_synthetic",
    "read_png",
    "read_png_batch",
    "read_ply",
    "to_float_rgb",
    "write_png",
    "save_gaussian_model",
    "to_camera_arrays",
    "write_ply",
]
