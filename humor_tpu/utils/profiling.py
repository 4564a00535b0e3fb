"""Profiling / tracing helpers (SURVEY.md §5: the reference has only
wall-clock timers; here jax.profiler traces are first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(out_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace of the enclosed block:

        with profiling.trace("/tmp/humor_trace"):
            runner(observed)
    """
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock sections with device synchronization."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.times[name] = (self.times.get(name, 0.0)
                                + time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.0f}%)"
                 for k, v in sorted(self.times.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)
