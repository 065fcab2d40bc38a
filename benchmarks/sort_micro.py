"""Microbenchmarks behind the global-sort design decision (VERDICT #3).

The reference's cheap stage is a CUB radix sort (rasterizer_impl.cu:344-362);
the suggested TPU analog was a Pallas tile-bucketed counting sort. A counting
sort's distribution phase is a *random scatter* of millions of rows — and TPU
has no scatter primitive: XLA lowers it to a serial per-row loop, and a
Pallas kernel could only emulate it with per-row DMAs (~µs each). This
harness measures the actual primitive rates at production sizes so the
tradeoff is recorded with numbers rather than folklore:

  * lax.sort with 2 keys + N carried values (the fused pad-into-sort path);
  * lax.sort with 1 key (what a pre-bucketed merge would still need per
    bucket, amortized);
  * scatter (at[].set) of the same rows — the counting sort's distribution;
  * row gather at the same width — the permutation-apply alternative.

Run on the real chip; timing is PROFILER DEVICE DURATION, not wall-clock —
the axon tunnel memoizes repeated executions, so wall-clock on a cached
repeat reads ~0 regardless of the device work (round-2 verdict weak #3).
Each case runs once warm, then once under ``jax.profiler.trace``; the
reported ms is the trace's top-level device-busy time per iteration.

    PYTHONPATH=/root/repo python benchmarks/sort_micro.py --n 3240000
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from profile_step import device_exclusive_totals  # noqa: E402 (sibling)


def timed(fn, args, iters=10):
    """Device-time per iteration, from the profiler trace."""
    @jax.jit
    def run(a):
        def it(i, carry):
            acc, a = carry
            out = fn(i, a)
            return acc + out, a
        acc, _ = jax.lax.fori_loop(0, iters, it, (jnp.float32(0.0), a))
        return acc

    jax.block_until_ready(run(args))
    trace_dir = tempfile.mkdtemp(prefix="stp_sortmicro_")
    try:
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            jax.block_until_ready(run(args))
        _, top_us = device_exclusive_totals(trace_dir)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    return top_us / 1e6 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3_240_000)
    ap.add_argument("--tiles", type=int, default=8160)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    n, T = args.n, args.tiles
    key = jax.random.PRNGKey(0)
    tile = jax.random.randint(key, (n,), 0, T, jnp.int32)
    depth = jax.random.uniform(jax.random.PRNGKey(1), (n,))
    vals = [
        jax.random.uniform(jax.random.PRNGKey(2 + j), (n,)) for j in range(9)
    ]
    perm = jax.random.permutation(jax.random.PRNGKey(11), n)
    table = jax.random.uniform(jax.random.PRNGKey(12), (n, 9))

    def vary(i, x):
        # Perturb so the tunnel/jit cache can't return memoized results.
        return x + (i % 2).astype(x.dtype) if x.dtype != jnp.int32 else x

    cases = {
        "sort 2key+2val": lambda i, a: jax.lax.sort(
            (a[0], vary(i, a[1]), jnp.arange(n, dtype=jnp.int32),
             jnp.arange(n, dtype=jnp.int32)), num_keys=2)[1].sum(),
        "sort 2key+1val": lambda i, a: jax.lax.sort(
            (a[0], vary(i, a[1]), jnp.arange(n, dtype=jnp.int32)),
            num_keys=2)[1].sum(),
        "sort 1key+5val": lambda i, a: jax.lax.sort(
            tuple([a[0]] + [vary(i, v) for v in a[2][:5]]),
            num_keys=1)[1].sum(),
        "sort 1key+9val": lambda i, a: jax.lax.sort(
            tuple([a[0]] + [vary(i, v) for v in a[2]]), num_keys=1)[1].sum(),
        "scatter n rows (set)": lambda i, a: jnp.zeros((n,)).at[a[3]].set(
            vary(i, a[1])).sum(),
        "scatter-add n rows": lambda i, a: jnp.zeros((n,)).at[a[3]].add(
            vary(i, a[1])).sum(),
        "gather n x 9 rows": lambda i, a: (a[4] + vary(i, a[1])[:, None])[
            a[3]].sum(),
        # Row-gather WIDTH scaling (round 4): does the 23.6 ns/row cost
        # follow the row byte-width or the row count? Decides whether
        # packing the forward payload (10 f32 -> 5 bf16-pair carriers)
        # buys anything on the dominant config-3 op.
        "gather n x 1 rows": lambda i, a: (
            a[4][:, :1] + vary(i, a[1])[:, None])[a[3]].sum(),
        "gather n x 2 rows": lambda i, a: (
            a[4][:, :2] + vary(i, a[1])[:, None])[a[3]].sum(),
        "gather n x 5 rows": lambda i, a: (
            a[4][:, :5] + vary(i, a[1])[:, None])[a[3]].sum(),
        "gather n x 18 rows": lambda i, a: (jnp.concatenate(
            [a[4], a[4]], axis=1) + vary(i, a[1])[:, None])[a[3]].sum(),
        "gather n x 5 rows i32": lambda i, a: (
            a[4][:, :5].astype(jnp.int32) + (i % 2))[a[3]].sum()
            .astype(jnp.float32),
        # Row-scatter WIDTH scaling (round 5): the gradient segment
        # reduction currently rides carry-sort + cumsum + per-Gaussian
        # gather (~158 ms at 5M); a direct .at[gauss_id].add of the pair
        # cotangent rows replaces all three IF row scatter-add runs near
        # the row-gather rate rather than the serial-loop folklore rate.
        "scatter-add n x 9 rows (dup idx)": lambda i, a: jnp.zeros(
            (n, 9)).at[a[6]].add(a[4] + vary(i, a[1])[:, None]).sum(),
        "scatter-add n x 5 rows (dup idx)": lambda i, a: jnp.zeros(
            (n, 5)).at[a[6]].add(a[4][:, :5] + vary(i, a[1])[:, None]).sum(),
        "tile histogram (scatter-add)": lambda i, a: jnp.zeros(
            (T,), jnp.int32).at[a[0]].add(1, mode="drop").sum()
            + vary(i, a[1]).sum() * 0,
        # The production fwd-sort shapes, before/after the round-2 levers:
        # 2key+2val above = carried-slot; these three = recon (9d14785),
        # rank-key (4cd4066), and the hypothetical gid-in-table floor.
        "sort 2key+1val (recon)": lambda i, a: jax.lax.sort(
            (a[0], vary(i, a[1]), jnp.arange(n, dtype=jnp.int32)),
            num_keys=2)[2].sum(),
        "sort u32key+1val (rank)": lambda i, a: jax.lax.sort(
            (a[5] + (i % 2).astype(jnp.uint32),
             jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1].sum(),
        "sort u32key only": lambda i, a: jax.lax.sort(
            (a[5] + (i % 2).astype(jnp.uint32),), num_keys=1)[0].sum()
            .astype(jnp.float32),
        # (i64-packed carriers were considered and dropped: without x64 the
        # pack truncates, and TPU emulates 64-bit lanes — not a lever.)
        # Rank production cost: two [P]-element 2-operand sorts at P=n/6.5
        # (the 500K-Gaussian : 3.24M-pair ratio).
        "rank sorts 2x[P]": lambda i, a: jax.lax.sort(
            (jax.lax.sort(
                (vary(i, a[1])[: n // 6], a[3][: n // 6].astype(jnp.int32)),
                num_keys=1)[1],
             jnp.arange(n // 6, dtype=jnp.int32)), num_keys=1)[1].sum(),
    }
    rank_bits = 19
    ukey = (
        (tile.astype(jnp.uint32) << rank_bits)
        | jax.random.randint(
            jax.random.PRNGKey(13), (n,), 0, (1 << rank_bits) - 1, jnp.int32
        ).astype(jnp.uint32)
    )
    # Duplicate-bearing indices like gauss_id in the sorted pair stream
    # (~1.5 pairs per Gaussian at production ratios).
    gid = jax.random.randint(
        jax.random.PRNGKey(14), (n,), 0, max(2 * n // 3, 1), jnp.int32
    )
    packed = (tile, depth, vals, perm, table, ukey, gid)
    for name, fn in cases.items():
        dt = timed(fn, packed, args.iters)
        print(json.dumps({
            "case": name,
            "ms": round(dt * 1000, 2),
            "ns_per_row": round(dt / n * 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
