"""Tiled pipeline (duplication + sort + Pallas blend) vs the naive oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.config import GlobalSortOrder
from stopthepop_tpu.constants import INVALID_TILE_ID
from stopthepop_tpu.render.duplicate import build_pairs, count_pairs
from stopthepop_tpu.render.naive import render_global_naive
from stopthepop_tpu.render.pipeline import render_tiled, tile_grid
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene
from stopthepop_tpu.utils.testing import bucket_pair_capacity


def _prep(scene, cam, **kw):
    return preprocess(
        scene.means3d,
        scene.opacities,
        scales=scene.scales,
        rotations=scene.rotations,
        shs=scene.shs,
        viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        campos=cam.campos,
        tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy,
        image_width=cam.width,
        image_height=cam.height,
        sh_degree=3,
        **kw,
    )


def test_pair_expansion_matches_bruteforce():
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(0), 100)
    prep = _prep(scene, cam)
    gx, gy = tile_grid(64, 64)
    total = int(count_pairs(prep))
    pairs = build_pairs(prep, capacity=total + 7, grid_x=gx, grid_y=gy)
    assert int(pairs.num_rendered) == total
    assert not bool(pairs.overflow)

    # Brute force: every valid Gaussian emits one pair per rect tile.
    expected = set()
    rect_min = np.asarray(prep.rect_min)
    rect_max = np.asarray(prep.rect_max)
    valid = np.asarray(prep.valid)
    for g in range(100):
        if not valid[g]:
            continue
        for ty in range(rect_min[g, 1], rect_max[g, 1]):
            for tx in range(rect_min[g, 0], rect_max[g, 0]):
                expected.add((ty * gx + tx, g))
    got = set()
    tids = np.asarray(pairs.tile_id)
    gids = np.asarray(pairs.gauss_id)
    for i in range(total + 7):
        if tids[i] != INVALID_TILE_ID:
            got.add((int(tids[i]), int(gids[i])))
    assert got == expected

    # Sorted by tile, then depth within tile.
    depths = np.asarray(pairs.depth)
    for i in range(1, total):
        assert tids[i] >= tids[i - 1]
        if tids[i] == tids[i - 1]:
            assert depths[i] >= depths[i - 1]

    # Ranges are consistent.
    starts = np.asarray(pairs.starts)
    ends = np.asarray(pairs.ends)
    for t in range(gx * gy):
        seg = tids[starts[t]:ends[t]]
        assert (seg == t).all()


def test_pair_overflow_detected():
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(1), 100)
    prep = _prep(scene, cam)
    gx, gy = tile_grid(64, 64)
    pairs = build_pairs(prep, capacity=8, grid_x=gx, grid_y=gy)
    assert bool(pairs.overflow)


@pytest.mark.parametrize("size", [(64, 64), (80, 48)])
def test_tiled_matches_oracle(size):
    w, h = size
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(2), 300)
    prep = _prep(scene, cam)
    bg = jnp.array([0.2, 0.3, 0.1])
    img_o, T_o, n_o = render_global_naive(prep, bg, w, h)
    cap = bucket_pair_capacity(prep)
    img_t, T_t, n_t, pairs, _ = render_tiled(
        prep, bg, image_width=w, image_height=h, capacity=cap, interpret=True
    )
    assert not bool(pairs.overflow)
    np.testing.assert_allclose(
        np.asarray(img_t), np.asarray(img_o), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(T_t).reshape(-1), np.asarray(T_o), atol=2e-5
    )


def test_tiled_tile_based_culling_close_to_uncull():
    # Tile-based culling only removes non-contributing pairs: image must be
    # essentially unchanged.
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(3), 200)
    prep = _prep(scene, cam)
    bg = jnp.zeros(3)
    cap = bucket_pair_capacity(prep)
    img_a, _, _, _, _ = render_tiled(
        prep, bg, image_width=64, image_height=64, capacity=cap, interpret=True
    )
    img_b, _, _, pairs_b, _ = render_tiled(
        prep, bg, image_width=64, image_height=64, capacity=cap,
        tile_based_culling=True, interpret=True,
    )
    # Culling must actually drop some pairs on a random scene...
    assert int(pairs_b.valid.sum()) < int(count_pairs(prep))
    # ...while leaving the image numerically intact (tolerance: the bound is
    # conservative at the alpha threshold boundary).
    assert np.abs(np.asarray(img_a) - np.asarray(img_b)).max() < 5e-3


def test_tiled_per_tile_depth_orders_match_oracle():
    from stopthepop_tpu.render.naive import render_global_order_naive

    cam = make_camera(48, 48)
    scene = random_scene(jax.random.PRNGKey(4), 100)
    prep = _prep(scene, cam)
    bg = jnp.array([0.1, 0.2, 0.05])
    cap = bucket_pair_capacity(prep)
    for order in (GlobalSortOrder.PTD_CENTER, GlobalSortOrder.PTD_MAX):
        img, T, n, pairs, _ = render_tiled(
            prep, bg, image_width=48, image_height=48, capacity=cap,
            sort_order=order, campos=cam.campos,
            inverse_vp=cam.inv_viewprojmatrix, interpret=True,
        )
        img_o, T_o, n_o = render_global_order_naive(
            prep, bg, 48, 48, cam.campos, cam.inv_viewprojmatrix,
            sort_order=order,
        )
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(img_o), atol=5e-5,
            err_msg=f"GLOBAL image mismatch vs oracle for {order.name}",
        )
        np.testing.assert_allclose(
            np.asarray(T).reshape(-1), np.asarray(T_o), atol=5e-5
        )
        mismatched = (
            np.asarray(n).reshape(-1) != np.asarray(n_o)
        ).mean()
        assert mismatched < 0.02  # near-threshold commit flips only


@pytest.mark.slow
def test_recon_gather_vjp_matches_carried_slot():
    # The slot-reconstruction path (make_segment_gather_recon) must produce
    # the same forward bitwise (lax.sort is stable, so dropping the carried
    # slot operand cannot change the pair order) and the same gradients up
    # to float-summation blocking: the recon table rides the payload table,
    # so the MXU-blocked cumsum sees two extra rows and may tile the
    # reduction differently (observed: 1-ulp differences).
    from stopthepop_tpu.render.duplicate import (
        build_pairs_aligned,
        make_segment_gather_recon,
        recon_table_columns,
        segment_gather,
    )

    cam = make_camera(80, 64)
    scene = random_scene(jax.random.PRNGKey(7), 250)
    prep = _prep(scene, cam)
    gx, gy = tile_grid(80, 64)
    cap = int(count_pairs(prep)) + 32
    table = jax.random.normal(jax.random.PRNGKey(8), (250, 6))

    pairs_c, segs_c = build_pairs_aligned(
        prep, capacity=cap, grid_x=gx, grid_y=gy, align=8, carry_slot=True
    )
    pairs_r, segs_r = build_pairs_aligned(
        prep, capacity=cap, grid_x=gx, grid_y=gy, align=8, carry_slot=False
    )
    assert segs_r.orig_slot is None
    np.testing.assert_array_equal(
        np.asarray(segs_c.gauss_id), np.asarray(segs_r.gauss_id)
    )

    def f_carried(t):
        out = segment_gather(
            t, segs_c.gauss_id, segs_c.orig_slot, segs_c.gauss_offsets,
            capacity=cap,
        )
        return out * jnp.arange(out.shape[1])[None, :]

    def f_recon(t):
        t2 = jnp.concatenate(
            [t, jax.lax.stop_gradient(recon_table_columns(prep))], axis=1
        )
        out = make_segment_gather_recon(cap, gx)(
            t2, segs_r.gauss_id, pairs_r.tile_id, pairs_r.valid,
            segs_r.gauss_offsets,
        )[:-4]
        return out * jnp.arange(out.shape[1])[None, :]

    out_c, vjp_c = jax.vjp(f_carried, table)
    out_r, vjp_r = jax.vjp(f_recon, table)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_r))
    ct = jax.random.normal(jax.random.PRNGKey(9), out_c.shape)
    (d_c,) = vjp_c(ct)
    (d_r,) = vjp_r(ct)
    np.testing.assert_allclose(
        np.asarray(d_c), np.asarray(d_r), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_rank_key_sort_bitwise_identical():
    # The packed single-key sort (tile << rank_bits | depth_rank) must be
    # bitwise-identical to the (tile, depth) two-key sort: the rank is a
    # stable total order over per-Gaussian depths and the pair stream is
    # gid-major, so ties resolve identically. Checked end to end: same
    # sorted stream, same image, same gradients.
    from stopthepop_tpu.render.duplicate import rank_key_bits

    assert rank_key_bits(8160, 500_000) == 19
    assert rank_key_bits(8160, 600_000) is None  # P too big for 19 bits
    assert rank_key_bits(32640, 100_000) == 17   # 4K grid still packs

    cam = make_camera(80, 64)
    scene = random_scene(jax.random.PRNGKey(11), 220)
    prep = _prep(scene, cam)
    bg = jnp.array([0.05, 0.1, 0.2])
    cap = int(count_pairs(prep)) + 16

    # Stream-level identity.
    from stopthepop_tpu.render.duplicate import build_pairs_aligned
    gx, gy = tile_grid(80, 64)
    pc, sc = build_pairs_aligned(
        prep, capacity=cap, grid_x=gx, grid_y=gy, align=128, carry_slot=False
    )
    pr, sr = build_pairs_aligned(
        prep, capacity=cap, grid_x=gx, grid_y=gy, align=128,
        carry_slot=False, rank_key=True,
    )
    assert pr.depth is None
    np.testing.assert_array_equal(np.asarray(pc.gauss_id), np.asarray(pr.gauss_id))
    np.testing.assert_array_equal(np.asarray(pc.tile_id), np.asarray(pr.tile_id))
    np.testing.assert_array_equal(np.asarray(pc.valid), np.asarray(pr.valid))
    np.testing.assert_array_equal(np.asarray(sc.starts), np.asarray(sr.starts))

    # Image + gradient identity through the full GLOBAL path.
    def loss(prep_means, rank_key):
        p2 = prep._replace(mean2d=prep_means)
        img, T, n, pairs, _ = render_tiled(
            p2, bg, image_width=80, image_height=64, capacity=cap,
            rank_key=rank_key, interpret=True,
        )
        return jnp.sum(img * img), img

    (l0, img0), g0 = jax.value_and_grad(loss, has_aux=True)(prep.mean2d, False)
    (l1, img1), g1 = jax.value_and_grad(loss, has_aux=True)(prep.mean2d, True)
    np.testing.assert_array_equal(np.asarray(img0), np.asarray(img1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_halves_transport_matches_value_packed(monkeypatch):
    """The expansion gather's two int transports (value-packed default vs
    16-bit-halves fallback for >=2^24 capacities / >1024-tile grids) must
    produce identical pair streams — images bitwise equal."""
    cam = make_camera(48, 48)
    scene = random_scene(jax.random.PRNGKey(9), 80)
    prep = _prep(scene, cam)
    bg = jnp.array([0.2, 0.1, 0.3])
    cap = bucket_pair_capacity(prep)

    def run():
        img, T, n, pairs, _ = render_tiled(
            prep, bg, image_width=48, image_height=48, capacity=cap,
            rank_key=True, interpret=True,
        )
        return np.asarray(img), np.asarray(T), np.asarray(n)

    packed = run()
    monkeypatch.setenv("STP_FORCE_HALVES_TRANSPORT", "1")
    halves = run()
    for a, b in zip(packed, halves):
        np.testing.assert_array_equal(a, b)


def test_division_free_rect_decode_exhaustive():
    """The expand_pairs float-reciprocal quotient must equal // exactly for
    every reachable (local, width): width in [1, 2048], local < 2^22
    (rect_w * rect_h bound). Checked on an adversarial grid including the
    exact multiples where floor(local * (1/w)) is most fragile."""
    widths = np.concatenate([
        np.arange(1, 260), np.array([511, 512, 513, 1023, 1024, 2047, 2048])
    ]).astype(np.int64)
    # Adversarial locals: around multiples of each width near the 2^22 cap.
    qs = np.array([0, 1, 2, 3, 100, 4095, 65535, (1 << 22) // 2049])
    local = (qs[None, :] * widths[:, None]).astype(np.int64)
    local = np.concatenate([local, local + 1,
                            np.maximum(local - 1, 0)], axis=1)
    local = np.minimum(local, (1 << 22) - 1)
    w = np.broadcast_to(widths[:, None], local.shape)

    lf = local.astype(np.float32)
    recip = (1.0 / w.astype(np.float32)).astype(np.float32)
    q = np.floor((lf * recip).astype(np.float32)).astype(np.int64)
    r = local - q * w
    q = q + (r >= w) - (r < 0)
    r = local - q * w
    np.testing.assert_array_equal(q, local // w)
    np.testing.assert_array_equal(r, local % w)
