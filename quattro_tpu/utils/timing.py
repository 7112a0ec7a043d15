"""Phase timing and profiling utilities.

TPU-aware replacement for the reference's wall-clock decorators
(quattro_ilqr_tf.py:16-42, §5.1): JAX dispatch is asynchronous, so honest
timing must ``block_until_ready`` on the phase's outputs. Also bundles a
``jax.profiler`` trace context for on-device analysis.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, List

import jax


class PhaseTimer:
    """Accumulates per-phase wall times; the ``get_time()`` equivalent.

    Usage:
        timer = PhaseTimer()
        result_box = []
        with timer.phase("backward", outputs=lambda: result_box):
            result_box.append(backward(...))
        # or, simpler, for a single call:
        result = timer.timed("backward", backward, ...)
        timer.summary()  # {phase: {count, total_s, mean_s, p50_s, p99_s}}

    JAX dispatch is asynchronous: without blocking, a phase records only
    dispatch time (microseconds) while the device work runs after the
    ``with`` block exits. ``phase(..., outputs=...)`` blocks on the callable's
    result at exit; ``timed`` blocks on the function's return value. A bare
    ``phase(name)`` is honest only around host-synchronous work (pure
    Python/numpy, or code that already fetched a result to the host).
    """

    def __init__(self) -> None:
        self.records: Dict[str, List[float]] = collections.defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, outputs=None):
        """Time a block; ``outputs`` (a zero-arg callable returning the
        block's jax outputs, e.g. a list the block appends to) is blocked on
        before the clock stops, so async device work is included."""
        start = time.perf_counter()
        try:
            yield
        finally:
            if outputs is not None:
                jax.block_until_ready(outputs())
            self.records[name].append(time.perf_counter() - start)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its outputs, record elapsed time."""
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        self.records[name].append(time.perf_counter() - start)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        result = {}
        for name, times in self.records.items():
            arr = np.asarray(times)
            result[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p99_s": float(np.percentile(arr, 99)),
            }
        return result

    def reset(self) -> None:
        self.records.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope — open the dump with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_nnz_per_sec(num_blocks: int, elapsed_s: float, bands: int = 3) -> float:
    """North-star throughput metric: block-nonzeros processed per second for a
    block-tridiagonal factorization (diag + 2 off-diag bands per row)."""
    nnz = num_blocks + 2 * (num_blocks - 1) if bands == 3 else num_blocks * bands
    return nnz / elapsed_s
