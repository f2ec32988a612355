"""Profiling / tracing — formalizing the reference's stdout stage timers.

The reference prints per-stage wall-times around every CUDA wrapper
(myApp.cu:885-907: updatePrimaryRayDirection / getSampleColors /
blendSampleColors) and the octree build time (myApp.cu:308-312).  Here the
same intent is covered by:

  * :class:`StageTimer` — named wall-clock stages with a report table
    (blocks on device results so times are real).
  * :func:`trace` — context manager around ``jax.profiler`` traces for
    XLA/TPU timeline capture (viewable in XProf/TensorBoard).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple

import jax


class StageTimer:
    def __init__(self) -> None:
        self.stages: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            for v in out.values():
                jax.block_until_ready(v)
            self.stages.append((name, time.perf_counter() - t0))

    def record(self, name: str, seconds: float) -> None:
        self.stages.append((name, seconds))

    def report(self) -> str:
        width = max((len(n) for n, _ in self.stages), default=5)
        lines = [f"{n:<{width}}  {t * 1e3:10.2f} ms" for n, t in self.stages]
        total = sum(t for _, t in self.stages)
        lines.append(f"{'total':<{width}}  {total * 1e3:10.2f} ms")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.stages)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open in XProf / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
