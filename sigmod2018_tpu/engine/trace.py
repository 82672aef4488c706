"""Per-operator tracing (SURVEY §5: the reference has only commented-out
clock() calls, handler.c:65,98; here tracing is a first-class debug mode).

With `EngineConfig.trace` on, every device operator is timed wall-clock
(blocking — tracing intentionally serializes the pipeline; never enable it
when benchmarking) and a per-query report goes to stderr: operator name,
input shapes, and milliseconds.  Speed-of-light accounting: each record
also carries the bytes the operator touches, so `report()` can print the
achieved fraction of HBM bandwidth.
"""

from __future__ import annotations

import sys
import time
from typing import Any, List, Tuple

import jax

# v5e HBM ≈ 819 GB/s; used only for the speed-of-light column.
HBM_BYTES_PER_SEC = 819e9


def _nbytes(x: Any) -> int:
    if isinstance(x, jax.Array):
        return x.size * x.dtype.itemsize
    if isinstance(x, (tuple, list)):
        return sum(_nbytes(v) for v in x)
    return 0


class Tracer:
    def __init__(self, out=None):
        self.out = out or sys.stderr
        self.records: List[Tuple[str, str, float, int]] = []

    def reset(self) -> None:
        self.records = []

    def record(self, name: str, args, result, ms: float) -> None:
        shapes = ",".join(
            str(tuple(a.shape)) for a in args if isinstance(a, jax.Array)
        )
        self.records.append((name, shapes, ms, _nbytes(args) + _nbytes(result)))

    def report(self, label: str = "") -> None:
        total = sum(ms for _, _, ms, _ in self.records)
        print(f"-- trace {label}: {total:.2f} ms total", file=self.out)
        for name, shapes, ms, nbytes in self.records:
            sol = nbytes / HBM_BYTES_PER_SEC * 1e3  # ms at HBM roofline
            frac = f" sol={sol/ms*100:5.1f}%" if ms > 0 and sol > 0 else ""
            print(f"--   {name:22s} {ms:8.3f} ms  [{shapes}]{frac}",
                  file=self.out)


class TimedOps:
    """Proxy over the ops module that blocks + times every call."""

    def __init__(self, ops_module, tracer: Tracer):
        self._ops = ops_module
        self._tracer = tracer

    def __getattr__(self, name: str):
        fn = getattr(self._ops, name)
        if not callable(fn):
            return fn

        def timed(*args, **kwargs):
            t0 = time.perf_counter()
            result = fn(*args, **kwargs)
            jax.block_until_ready(result)
            self._tracer.record(name, args, result,
                                (time.perf_counter() - t0) * 1e3)
            return result

        return timed
