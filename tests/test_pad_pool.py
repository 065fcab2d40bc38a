"""Shared alignment-padding pool: equivalence, sizing, overflow reporting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
)
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.render.duplicate import sort_stream_aligned
from stopthepop_tpu.render.rasterize import rasterize_gaussians
from stopthepop_tpu.utils.testing import make_camera


def _stream(seed=0, capacity=1024, num_tiles=16):
    rng = np.random.default_rng(seed)
    n = 700
    tile = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    tile[:n] = rng.integers(0, num_tiles, n)
    depth = np.full(capacity, np.inf, np.float32)
    depth[:n] = rng.random(n, dtype=np.float32)
    g = np.zeros(capacity, np.int32)
    g[:n] = rng.integers(0, 50, n)
    counts = np.bincount(tile[:n], minlength=num_tiles).astype(np.int32)
    from stopthepop_tpu.constants import INVALID_TILE_ID

    tile[n:] = INVALID_TILE_ID
    return (jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(g),
            jnp.asarray(counts))


def test_tight_pool_matches_worst_case_layout():
    tile, depth, g, counts = _stream()
    num_tiles, align = 16, 128
    pad_exact = int(jnp.sum((-counts) % align))
    full_pairs, full_segs = sort_stream_aligned(
        tile, depth, g, counts, num_tiles=num_tiles, align=align,
        num_rendered=jnp.int32(700), overflow=jnp.array(False),
    )
    tight_pairs, tight_segs = sort_stream_aligned(
        tile, depth, g, counts, num_tiles=num_tiles, align=align,
        num_rendered=jnp.int32(700), overflow=jnp.array(False),
        pad_capacity=pad_exact,
    )
    assert not bool(tight_pairs.overflow)
    # Same segment layout; identical content over every tile's range.
    np.testing.assert_array_equal(np.asarray(full_pairs.starts),
                                  np.asarray(tight_pairs.starts))
    np.testing.assert_array_equal(np.asarray(full_pairs.ends),
                                  np.asarray(tight_pairs.ends))
    end = int(full_pairs.ends[-1])
    for arr in ("tile_id", "depth", "gauss_id", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full_pairs, arr))[:end],
            np.asarray(getattr(tight_pairs, arr))[:end], err_msg=arr)
    # The tight layout is genuinely smaller.
    assert tight_pairs.tile_id.shape[0] < full_pairs.tile_id.shape[0]


def test_pool_overflow_flag_and_memory_safety():
    tile, depth, g, counts = _stream()
    pad_exact = int(jnp.sum((-counts) % 128))
    pairs, segs = sort_stream_aligned(
        tile, depth, g, counts, num_tiles=16, align=128,
        num_rendered=jnp.int32(700), overflow=jnp.array(False),
        pad_capacity=max(pad_exact - 128, 0),
    )
    assert bool(pairs.overflow)
    total = pairs.tile_id.shape[0]
    aligned = np.asarray(pairs.ends - pairs.starts)  # counts per tile
    starts = np.asarray(pairs.starts)
    assert (starts >= 0).all()
    assert (starts + ((aligned + 127) // 128) * 128 <= total).all()


@pytest.mark.slow
def test_render_with_exact_pool_bitwise_equal():
    from stopthepop_tpu.render.duplicate import rect_histogram
    from stopthepop_tpu.render.pipeline import tile_grid
    from stopthepop_tpu.render.preprocess import preprocess

    W = H = 64
    cam = make_camera(W, H, campos=(0.0, 0.0, -4.0))
    model = init_random(jax.random.PRNGKey(2), 400, extent=1.2)
    model = model._replace(scales_log=model.scales_log - 1.0)
    rs = GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=0,
        campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
    )
    prep = preprocess(
        model.means3d, model.opacities(), scales=model.scales(),
        rotations=model.rotations_normalized(), shs=model.shs(),
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        image_width=W, image_height=H, sh_degree=0,
    )
    gx, gy = tile_grid(W, H)
    pad_exact = int(jnp.sum((-rect_histogram(prep, gx, gy)) % 128))

    def render(pad_capacity):
        def f(means):
            color, _ = rasterize_gaussians(
                means, None, model.shs(), None, model.opacities()[:, None],
                model.scales(), model.rotations_normalized(), None, rs,
                pair_capacity=4096, pad_capacity=pad_capacity,
                interpret=True,
            )
            return color

        img, vjp = jax.vjp(f, model.means3d)
        (d_means,) = vjp(jnp.ones_like(img))
        return np.asarray(img), np.asarray(d_means)

    img_full, g_full = render(None)
    img_tight, g_tight = render(pad_exact)
    np.testing.assert_array_equal(img_full, img_tight)
    np.testing.assert_array_equal(g_full, g_tight)
