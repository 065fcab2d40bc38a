"""stopthepop_tpu: TPU-native sorted Gaussian-splatting rasterization.

A from-scratch JAX/Pallas re-design of the capabilities of
r4dl/StopThePop-Rasterization (StopThePop, Radl et al., TOG 2024): hierarchical
per-pixel depth-sorted Gaussian splatting with tight culling — built for TPU
(static shapes, masked prefix products instead of sequential early-exit loops,
XLA sorts instead of CUB radix sort, psum/scatter-add instead of atomicAdd).
"""

from .config import (  # noqa: F401
    CullingSettings,
    DebugVisualization,
    ExtendedSettings,
    GaussianRasterizationSettings,
    GlobalSortOrder,
    SortMode,
    SortQueueSizes,
    SortSettings,
)

from .render.rasterize import (  # noqa: F401
    GaussianRasterizer,
    RenderOutput,
    rasterize_gaussians,
    suggest_capacities,
)
from .ops.transforms import mark_visible  # noqa: F401

__version__ = "0.1.0"
