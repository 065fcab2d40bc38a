"""Gather-rate vs index-adjacency probe (round 5).

The backward per-Gaussian segment gather (``cs0[offsets]``, [5M, 9] rows
from a 7.3M-row table) measures 104 ms — 21 ns/row where sort_micro's
9-column random gather runs 11.8. This probe isolates why, on the chip:

    sorted idx        21.0 ns/row      (the production case: offsets are
                                        an inclusive cumsum -> adjacent)
    consecutive idx   21.7              (arange: perfect adjacency)
    regular stride    21.6              (reshape-transpose interleave)
    RANDOM idx        11.9  (x2 reps)   (scattered across banks)
    untranspose [A,B,9] -> [B,A,9]      0.09 ns/row (layout moves are free)

Conclusion: the TPU gather engine serializes when consecutive indices hit
adjacent HBM addresses (bank conflicts) and pipelines when scattered; it
does NOT exploit locality (a contiguous arange gather could be a 0.45 ms
copy and instead costs 108 ms). No cheap fix exists: breaking adjacency
needs an irregular permutation, and applying one to the index array (or
un-permuting the output) is itself a gather at the very rate it would
save. The production op is therefore AT its hardware floor; the lever
would be needing fewer/narrower gathered rows, not reordering.

    PYTHONPATH=$PYTHONPATH:/root/repo python benchmarks/gather_locality_probe.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo/benchmarks")

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from profile_step import device_exclusive_totals  # noqa: E402

P, CAP = 5_000_000, 7_310_209
A = 1024
B = -(-P // A)
PP = A * B


def timed(fn, args, iters=10):
    @jax.jit
    def run(a):
        def it(i, acc):
            return acc + fn(i, a)
        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    jax.block_until_ready(run(args))
    d = tempfile.mkdtemp()
    try:
        with jax.profiler.trace(d, create_perfetto_trace=True):
            jax.block_until_ready(run(args))
        _, top_us = device_exclusive_totals(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return top_us / 1e6 / iters


def main():
    table = jax.random.uniform(jax.random.PRNGKey(0), (CAP, 9))
    off = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(1), (P,), 0, CAP, jnp.int32)
    )
    rnd = jax.random.randint(jax.random.PRNGKey(2), (P,), 0, CAP, jnp.int32)
    off_pad = jnp.pad(off, (0, PP - P))
    offp = jax.jit(lambda o: o.reshape(B, A).T.reshape(-1))(off_pad)
    big = jax.random.uniform(jax.random.PRNGKey(3), (PP, 9))

    cases = {
        "sorted idx": lambda i, a: (a[0] + (i % 2))[a[1]].sum(),
        "random idx": lambda i, a: (a[0] + (i % 2))[a[2]].sum(),
        "consecutive idx": lambda i, a: (
            a[0] + (i % 2))[jnp.arange(P, dtype=jnp.int32) + 1].sum(),
        "regular-stride idx": lambda i, a: (a[0] + (i % 2))[a[3]].sum(),
        "untranspose [A,B,9]": lambda i, a: (
            a[4] + (i % 2)).reshape(A, B, 9).transpose(1, 0, 2).sum(),
    }
    for name, fn in cases.items():
        dt = timed(fn, (table, off, rnd, offp, big))
        print(json.dumps({
            "case": name, "ms": round(dt * 1e3, 2),
            "ns_per_row": round(dt / P * 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
