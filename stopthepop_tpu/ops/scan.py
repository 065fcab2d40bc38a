"""MXU-blocked prefix sums.

XLA lowers ``jnp.cumsum`` over multi-million-element arrays to a serial
reduce-window that runs two orders of magnitude below HBM bandwidth on TPU
(measured ~10 ms for the [3.2M, 9] gradient-reduction scan of a 1080p/500K
train step). The classic fix is a Blelchloch-style blocked scan — and on TPU
the natural block primitive is a triangular matmul: multiplying a [*, 128]
reshape by an upper-triangular ones matrix computes 128 inclusive prefixes
per row on the MXU in one pass. Carries across 128-blocks recurse on an
array 128x smaller, so the whole scan is ~log_128(n) matmul passes of
n*128*2 flops — well under a millisecond where XLA's scan took ten.

Used by render/duplicate.py's rank_expand (pair-rank expansion, the analog
of the reference's CUB DeviceScan::InclusiveSum, rasterizer_impl.cu:313)
and the carry-sort gradient reduction (the analog of the reference's
atomicAdd accumulation, backward.cu:561-592).

f32 accumulation note: sums stay exact for integer-valued inputs below 2^24
(rank_expand's 0/1 marks); for gradient columns the block-dot association
differs from a serial sum by normal f32 reorder noise, which the gradient
oracles' tolerances already cover.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

_BLK = 128


@functools.lru_cache(maxsize=None)
def _tri(n: int):
    """Upper-triangular ones [n, n]: (x @ tri)[j] = sum_{i<=j} x[i].

    Cached as a host numpy constant, NOT a jnp array: a device array built
    inside a shard_map trace is pinned to that trace's mesh, and reusing it
    under a different mesh fails ("context mesh should match the aval mesh").
    """
    i, j = np.indices((n, n))
    return (i <= j).astype(np.float32)


def cumsum_mxu(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the LAST axis, f32, MXU-blocked.

    Equivalent to ``jnp.cumsum(x, axis=-1)`` for f32 inputs; any leading
    axes are batched. Prefer feature-major layouts ([features, n]) so the
    scanned axis is the long one.
    """
    x = x.astype(jnp.float32)
    n = x.shape[-1]
    if n <= _BLK:
        return jnp.cumsum(x, axis=-1)
    lead = x.shape[:-1]
    ng = (n + _BLK - 1) // _BLK
    pad = ng * _BLK - n
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    xg = x.reshape(lead + (ng, _BLK))
    intra = jax.lax.dot_general(
        xg, _tri(_BLK),
        (((xg.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [..., ng, 128] inclusive within each block
    gsum = intra[..., -1]                      # [..., ng]
    gpre = cumsum_mxu(gsum) - gsum             # exclusive block carries
    out = intra + gpre[..., None]
    return out.reshape(lead + (ng * _BLK,))[..., :n]
