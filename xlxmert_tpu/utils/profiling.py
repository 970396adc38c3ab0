"""Tracing / profiling — first-class, unlike the reference (which has
only wall-clock prints, SURVEY.md §5).

- `trace(logdir)`: jax.profiler trace context (view in TensorBoard /
  Perfetto).
- `StepTimer`: per-step wall timing with warm-up skip and percentile
  summary; forces completion via a host fetch (the axon tunnel makes
  block_until_ready unreliable — see .claude/skills/verify/SKILL.md).
- `annotate(name)`: named profiler region for host-side phases.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times: List[float] = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self._n += 1
        if self._n > self.skip_first:
            self.times.append(dt)

    @staticmethod
    def force(x) -> None:
        """Force device completion by fetching to the host (more reliable
        than block_until_ready through the axon tunnel)."""
        import jax

        for leaf in jax.tree.leaves(x):
            np.asarray(leaf)
            break

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
            "n": len(arr),
        }
