"""Tracing and per-stage timing.

The reference has no profiling framework — only ad-hoc commented ``clock()``
deltas around message handling (OrganizedScanRegistration.cpp:60-79), a wall
-clock printout per g2o optimize (solver_g2o.cpp:89-94), and lifetime
counters printed in destructors (ScanMatch.cpp:35-40, LaserOdometry.cpp:
129-132).  This module is the framework replacement (SURVEY.md §5
"Tracing / profiling"):

* ``StageTimer`` — named wall-clock accumulators with call counts; the
  destructor-counter idiom as an explicit report.
* ``time_stage`` — context manager that blocks on device work so a stage's
  device time is attributed to it, not to the next host sync.
* ``xla_trace`` — wraps ``jax.profiler.trace`` for TensorBoard-viewable XLA
  traces of the jitted solves (per-kernel timing the reference never had).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StageTimer:
    """Accumulates wall time and call counts per named pipeline stage."""

    def __init__(self) -> None:
        self.total_s: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)
        self.first_s: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None) -> Iterator[None]:
        """Time a block.  Pass the block's output pytree via ``sync`` — a
        callable returning it — to block until device work completes."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync())
            dt = time.perf_counter() - t0
            self.total_s[name] += dt
            self.calls[name] += 1
            self.first_s.setdefault(name, dt)

    def report(self) -> str:
        """The reference's destructor-counter printout, on demand.

        ``steady`` excludes each stage's FIRST call: on TPU that call pays
        the (remote) XLA/Mosaic compile, so the raw mean can overstate the
        per-call cost by an order of magnitude for rarely-called stages.
        """
        lines = []
        for name in sorted(self.total_s, key=self.total_s.get, reverse=True):
            n = self.calls[name]
            tot = self.total_s[name]
            line = (
                f"{name:<28s} {n:6d} calls  {tot * 1e3:10.1f} ms total"
                f"  {tot / max(n, 1) * 1e3:8.2f} ms/call"
            )
            if n > 1:
                steady = (tot - self.first_s[name]) / (n - 1)
                line += f"  {steady * 1e3:8.2f} ms/call steady"
            lines.append(line)
        return "\n".join(lines)

    def reset(self) -> None:
        self.total_s.clear()
        self.calls.clear()
        self.first_s.clear()


@contextlib.contextmanager
def time_stage(name: str, timer: Optional[StageTimer] = None) -> Iterator[None]:
    """Standalone stage timer: prints when no StageTimer is given."""
    if timer is not None:
        with timer.stage(name):
            yield
        return
    t0 = time.perf_counter()
    yield
    print(f"[{name}] {(time.perf_counter() - t0) * 1e3:.1f} ms")


@contextlib.contextmanager
def xla_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace (view with TensorBoard's profile tab)."""
    with jax.profiler.trace(log_dir):
        yield
