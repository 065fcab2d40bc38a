"""K-buffer backward: stale-source routing on an adversarial stream.

The backward kernel's fast path routes pop moments only within a sliding
two-chunk window of stream sources; entries that linger in the resort window
across more chunk boundaries take the staged slow path. This test builds a
single-tile stream engineered so far entries inserted in chunk 0 survive
until chunk 4 (and drain), and checks the kernel's payload gradients against
jax.grad of a jnp scan implementing the identical window semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stopthepop_tpu.constants import TILE_PIXELS
from stopthepop_tpu.kernels.blend_vjp import make_blend_kbuffer
from stopthepop_tpu.kernels.kbuffer_blend import (
    _chunk_alpha_depth,
    _tile_pixels_sublanes,
    _view_rays,
)
from stopthepop_tpu.utils.testing import make_camera

K = 4
CHUNK = 128
C = 5 * CHUNK  # 5 stream chunks in one tile


def _payload_and_cam():
    cam = make_camera(16, 16)
    rng = np.random.default_rng(3)
    # Depth profile: chunk 0 holds a handful of FAR entries (~100) among
    # near ones; chunks 1-3 are mid-range; chunk 4 is very far (~1000), so
    # the chunk-0 far entries pop 4 chunks stale.
    d0 = rng.uniform(1.0, 2.0, C).astype(np.float32)
    far_idx = np.arange(8) * 3  # early far entries
    d0[far_idx] = rng.uniform(90.0, 110.0, far_idx.size)
    d0[CHUNK:4 * CHUNK] = rng.uniform(2.0, 3.0, 3 * CHUNK)
    d0[4 * CHUNK:] = rng.uniform(900.0, 1100.0, CHUNK)

    pay = np.zeros((32, C + CHUNK), np.float32)
    pay[0, :C] = 8.0 + rng.uniform(-2, 2, C)   # x near tile center
    pay[1, :C] = 8.0 + rng.uniform(-2, 2, C)   # y
    pay[2, :C] = 1e-6                          # conic a (flat -> alpha ~ opw)
    pay[3, :C] = 0.0                           # conic b
    pay[4, :C] = 1e-6                          # conic c
    pay[5, :C] = rng.uniform(0.2, 0.5, C)      # opacity
    pay[6:9, :C] = rng.uniform(0.0, 1.0, (3, C))  # rgb
    pay[9, :C] = pay[12, :C] = pay[14, :C] = 1.0  # inv-cov = I
    pay[17, :C] = d0                           # u = (0, 0, depth)
    cam_vec = jnp.concatenate(
        [cam.inv_viewprojmatrix.reshape(-1), cam.campos.reshape(-1)]
    ).astype(jnp.float32)
    return jnp.asarray(pay), cam_vec, cam


def _oracle_packed(payload, cam_vec, bg):
    """jnp scan with the exact window semantics (alpha/depth from the same
    helper the kernel uses), differentiable in the payload."""
    pixf_x, pixf_y = _tile_pixels_sublanes(0, 0)
    vd = _view_rays(cam_vec, pixf_x, pixf_y, 16, 16)
    a_all, d_all = _chunk_alpha_depth(
        payload[:, :C], pixf_x, pixf_y, vd, jnp.int32(C)
    )  # [256, C]
    d_all = jax.lax.stop_gradient(d_all)
    rgb = payload[6:9, :C]  # [3, C]

    from stopthepop_tpu.constants import T_THRESHOLD

    win0 = (
        jnp.full((K, TILE_PIXELS), jnp.inf),
        jnp.zeros((K, TILE_PIXELS)),
        jnp.zeros((K, TILE_PIXELS)),
        jnp.zeros((K, TILE_PIXELS)),
        jnp.zeros((K, TILE_PIXELS)),
    )
    state0 = (
        win0,
        jnp.zeros((TILE_PIXELS,), jnp.int32),
        jnp.ones((TILE_PIXELS,)),
        jnp.zeros((3, TILE_PIXELS)),
        jnp.zeros((TILE_PIXELS,), bool),
    )

    def pop(win, fill, T, Cc, done, popm):
        dw, aw, rw, gw, bw = win
        a0 = aw[0]
        U = T * (1.0 - a0)
        commit = popm & ~done & (U >= T_THRESHOLD)
        done = done | (popm & (U < T_THRESHOLD))
        w = jnp.where(commit, a0 * T, 0.0)
        Cc = Cc + w[None, :] * jnp.stack([rw[0], gw[0], bw[0]])
        T = jnp.where(commit, U, T)

        def sh(x, pad):
            s = jnp.concatenate([x[1:], jnp.full_like(x[:1], pad)], axis=0)
            return jnp.where(popm[None, :], s, x)

        win = (sh(dw, jnp.inf), sh(aw, 0.0), sh(rw, 0.0), sh(gw, 0.0),
               sh(bw, 0.0))
        return win, fill - popm.astype(jnp.int32), T, Cc, done

    def ins(win, fill, v, d_i, a_i, rgb_i):
        dw = win[0]
        pos = jnp.sum(dw <= d_i[None, :], axis=0)
        ik = jnp.arange(K)[:, None]

        def put(x, nv):
            s = jnp.concatenate([x[:1], x[:-1]], axis=0)
            out = jnp.where(
                ik < pos[None, :], x,
                jnp.where(ik == pos[None, :], nv[None, :], s),
            )
            return jnp.where(v[None, :], out, x)

        win = (put(win[0], d_i), put(win[1], a_i), put(win[2], rgb_i[0]),
               put(win[3], rgb_i[1]), put(win[4], rgb_i[2]))
        return win, fill + v.astype(jnp.int32)

    def step(state, xs):
        a_i, d_i, rgb_i = xs
        win, fill, T, Cc, done = state
        v = a_i > 0.0
        popm = (fill == K) & v
        win, fill, T, Cc, done = pop(win, fill, T, Cc, done, popm)
        win, fill = ins(win, fill, v, d_i, a_i, rgb_i)
        return (win, fill, T, Cc, done), None

    xs = (a_all.T, d_all.T, jnp.broadcast_to(rgb[:, :, None],
                                             (3, C, TILE_PIXELS)).swapaxes(0, 1))
    state, _ = jax.lax.scan(step, state0, xs)

    def drain(state, _):
        win, fill, T, Cc, done = state
        popm = fill > 0
        win, fill, T, Cc, done = pop(win, fill, T, Cc, done, popm)
        return (win, fill, T, Cc, done), None

    state, _ = jax.lax.scan(drain, state, None, length=K)
    _, _, T, Cc, _ = state
    out = jnp.concatenate(
        [Cc + T[None, :] * bg[:, None], T[None, :]], axis=0
    )
    return out  # [4, 256]


def test_kbuffer_backward_stale_sources_match_oracle():
    payload, cam_vec, cam = _payload_and_cam()
    bg = jnp.array([0.3, 0.1, 0.2])
    starts = jnp.array([0], jnp.int32)
    counts = jnp.array([C], jnp.int32)
    weights = jax.random.normal(jax.random.PRNGKey(7), (4, TILE_PIXELS))

    blend = make_blend_kbuffer(1, 1, K, 16, 16, CHUNK, 1024, True)

    def loss_kernel(pay):
        packed = blend(pay, starts, counts, bg, cam_vec)
        return jnp.sum(packed[0, 0:4, :] * weights)

    def loss_oracle(pay):
        return jnp.sum(_oracle_packed(pay, cam_vec, bg) * weights)

    v_k, g_k = jax.value_and_grad(loss_kernel)(payload)
    v_o, g_o = jax.value_and_grad(loss_oracle)(payload)
    np.testing.assert_allclose(float(v_k), float(v_o), rtol=1e-5)
    a = np.asarray(g_o)[:9, :C]
    b = np.asarray(g_k)[:9, :C]
    scale = np.abs(a).max() + 1e-8
    np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3)
    # The crafted stream must actually exercise stale pops: far chunk-0
    # entries must contribute gradient (they blend only once chunk 4 runs).
    far_cols = np.arange(8) * 3
    assert np.abs(a[:, far_cols]).max() > 0
