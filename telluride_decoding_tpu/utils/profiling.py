"""Per-stage timing and device-trace profiling.

The reference has no tracing/profiling at all (SURVEY.md §5); this
module adds the observability layer the rebuild calls for:

  * StageTimer: lightweight named-stage wall-clock accumulation with a
    one-line report; used by the experiment drivers.
  * trace(): context manager around jax.profiler.trace, writing a
    TensorBoard-loadable device trace when a log dir is given and
    degrading to a no-op otherwise.
  * timed_block(): time one block with an optional device-sync
    function so asynchronous dispatch does not fake speedups (on the
    tunneled TPU backend block_until_ready can return early; pass a
    readback lambda as ``sync``).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage across repeated calls."""

    def __init__(self, name: str = 'pipeline'):
        self.name = name
        self._totals: Dict[str, float] = collections.defaultdict(float)
        self._counts: Dict[str, int] = collections.defaultdict(int)
        self._order = []

    @contextlib.contextmanager
    def stage(self, stage_name: str,
              sync: Optional[Callable[[], None]] = None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            elapsed = time.perf_counter() - start
            if stage_name not in self._totals:
                self._order.append(stage_name)
            self._totals[stage_name] += elapsed
            self._counts[stage_name] += 1

    def total(self, stage_name: str) -> float:
        # .get, not [ ]: indexing a defaultdict would insert a phantom
        # 0.0 entry that later hides the stage from report()'s order.
        return self._totals.get(stage_name, 0.0)

    def report(self) -> str:
        lines = ['%s timing:' % self.name]
        grand = sum(self._totals.values())
        for stage_name in self._order:
            total = self._totals[stage_name]
            count = self._counts[stage_name]
            lines.append('  %-24s %8.1f ms  (%d call%s, %.0f%%)' %
                         (stage_name, total * 1000, count,
                          's' if count != 1 else '',
                          100 * total / grand if grand else 0))
        lines.append('  %-24s %8.1f ms' % ('TOTAL', grand * 1000))
        return '\n'.join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self._totals)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler device trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed_block(label: str, results: Optional[Dict[str, float]] = None,
                sync: Optional[Callable[[], None]] = None,
                verbose: bool = False):
    start = time.perf_counter()
    yield
    if sync is not None:
        sync()
    elapsed = time.perf_counter() - start
    if results is not None:
        results[label] = elapsed
    if verbose:
        print('%s: %.1f ms' % (label, elapsed * 1000))
