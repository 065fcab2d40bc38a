"""Stage timing & profiling.

Mirror of the reference's ``Timer`` (rasterizer_impl.h:77-147): a per-stage
wall-clock accumulator over the pipeline stages {Preprocess, Duplicate, Sort,
Render}, averaged over 128-frame intervals and reported as a text block (the
reference emits into DebugVisualizationData::timings_text every 128 frames,
rasterizer_impl.cu:389-400).

TPU differences: kernels are asynchronous under jit, so stage timing either
(a) wraps each stage in its own dispatch with ``jax.block_until_ready``
(``StageTimer.time``) — the analog of cudaEvent pairs per kernel — or
(b) uses the XLA profiler for intra-jit kernel breakdown (``trace``),
which is the production tool (`jax.profiler` traces show per-fusion and
per-Pallas-kernel device times in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable

import jax

REPORT_INTERVAL = 128  # frames, like the reference (rasterizer_impl.h:80)

STAGES = ("Preprocess", "Duplicate", "Sort", "Render")  # reference stage names


class StageTimer:
    """Accumulates per-stage wall time; reports 128-frame averages."""

    def __init__(self, enabled: bool = True, interval: int = REPORT_INTERVAL):
        self.enabled = enabled
        self.interval = interval
        self._acc = defaultdict(float)   # stage -> seconds in this interval
        self._order = []
        self._frames = 0
        self.timings_text = ""

    def time(self, stage: str, fn: Callable, *args, **kw):
        """Run ``fn`` as one timed stage (blocks on its outputs)."""
        if not self.enabled:
            return fn(*args, **kw)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        self._record(stage, time.perf_counter() - t0)
        return out

    @contextlib.contextmanager
    def stage(self, stage: str):
        """Context-manager form; the caller must block inside the context."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        self._record(stage, time.perf_counter() - t0)

    def _record(self, stage: str, dt: float):
        if stage not in self._acc:
            self._order.append(stage)
        self._acc[stage] += dt

    def frame(self):
        """Mark a frame boundary; refresh the report every ``interval``."""
        if not self.enabled:
            return
        self._frames += 1
        if self._frames >= self.interval:
            lines = [
                f"{s}: {1000.0 * self._acc[s] / self._frames:.3f} ms"
                for s in self._order
            ]
            self.timings_text = "\n".join(lines)
            self._acc = defaultdict(float)
            self._order = []
            self._frames = 0

    def report(self) -> str:
        """Immediate report of the current (partial) interval."""
        n = max(self._frames, 1)
        return "\n".join(
            f"{s}: {1000.0 * self._acc[s] / n:.3f} ms" for s in self._order
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace: per-kernel device timings viewable in xprof.

    The production profiling path (replaces CUDA events with the TPU's
    hardware trace).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
