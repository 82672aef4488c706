"""Per-operator tracing (SURVEY §5: the reference has only commented-out
clock() calls, handler.c:65,98; here tracing is a first-class debug mode).

With `EngineConfig.trace` on, every device operator is timed and a
per-query report goes to stderr: operator name, input shapes, and
milliseconds.  Speed-of-light accounting: each record also carries the
bytes the operator touches, so `report()` can print the achieved
fraction of HBM bandwidth.

Timing is DEVICE-amortized, not wall-clock: on this container the
host<->device tunnel has a ~27 ms round-trip, so blocking after a single
dispatch times the tunnel, not the kernel, for every sub-RTT op.  Each
traced call therefore re-dispatches the (pure, cached) op `TRACE_ITERS`
extra times back-to-back, drains the queue with one device fetch, and
reports (elapsed - calibrated_rtt) / iters.  Tracing serializes the
pipeline and multiplies device work — never enable it when benchmarking.

`S18_TRACE=json` emits one JSON object per query on stderr (machine-
readable: per-op device ms, bytes, shapes) instead of the aligned table
— the structured per-query log VERDICT r1 asked for, pairing with
`S18_EXPLAIN=1`'s est-vs-actual cardinalities.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# v5e HBM ≈ 819 GB/s; used only for the speed-of-light column.
HBM_BYTES_PER_SEC = 819e9
TRACE_ITERS = 3


def _nbytes(x: Any) -> int:
    if isinstance(x, jax.Array):
        return x.size * x.dtype.itemsize
    if isinstance(x, (tuple, list)):
        return sum(_nbytes(v) for v in x)
    return 0


@jax.jit
def _probe_leaf(x):
    return jnp.ravel(x)[:1]


def _drain(result) -> None:
    """One host fetch that forces the whole dispatch queue to drain (a
    tiny slice fetch, not block_until_ready on full outputs — fetching
    megabytes through the tunnel would time the transfer)."""
    leaves = [v for v in jax.tree_util.tree_leaves(result)
              if isinstance(v, jax.Array) and v.size]
    if leaves:
        np.asarray(_probe_leaf(leaves[0]))


class Tracer:
    def __init__(self, out=None, mode: str = "table"):
        self.out = out or sys.stderr
        self.mode = mode
        # (op name, shapes, device ms, bytes, floors dict or None)
        self.records: List[Tuple[str, str, float, int, Any]] = []
        self._rtt: float | None = None

    def rtt(self) -> float:
        """Calibrated host->device->host drain cost, seconds."""
        if self._rtt is None:
            probe = jnp.zeros((8,), jnp.int32)
            _drain(probe)
            t0 = time.perf_counter()
            for _ in range(3):
                _drain(probe)
            self._rtt = (time.perf_counter() - t0) / 3
        return self._rtt

    def reset(self) -> None:
        self.records = []

    def record(self, name: str, args, result, ms: float) -> None:
        shapes = ",".join(
            str(tuple(a.shape)) for a in args if isinstance(a, jax.Array)
        )
        # Join-family ops carry their speed-of-light floor (VERDICT r4
        # #6): max(min HBM bytes at roofline, min pair-compares at the
        # measured VPU ceiling) — achieved-vs-floor makes the
        # "compute-bound by design" claim falsifiable per call.
        from ..utils.floors import floors_for_op

        fl = floors_for_op(name, args)
        self.records.append((name, shapes, ms,
                             _nbytes(args) + _nbytes(result), fl))

    def report(self, label: str = "") -> None:
        if self.mode == "json":
            print(json.dumps({
                "query": label,
                "rtt_ms": round(self.rtt() * 1e3, 3),
                "ops": [
                    {"op": name, "shapes": shapes,
                     "device_ms": round(ms, 4), "bytes": nbytes,
                     "hbm_frac": round(
                         nbytes / HBM_BYTES_PER_SEC * 1e3 / ms, 4)
                     if ms > 0 else None,
                     **({"floor_ms": round(fl["floor_ms"], 4),
                         "tile_cmp_floor_ms":
                             round(fl["tile_cmp_floor_ms"], 4),
                         "floor_frac": round(fl["floor_ms"] / ms, 4)
                         if ms > 0 else None} if fl else {})}
                    for name, shapes, ms, nbytes, fl in self.records
                ],
            }), file=self.out)
            return
        total = sum(ms for _, _, ms, _, _ in self.records)
        print(f"-- trace {label}: {total:.2f} ms device total "
              f"(amortized x{TRACE_ITERS}, rtt {self.rtt()*1e3:.1f} ms)",
              file=self.out)
        for name, shapes, ms, nbytes, fl in self.records:
            sol = nbytes / HBM_BYTES_PER_SEC * 1e3  # ms at HBM roofline
            frac = f" sol={sol/ms*100:5.1f}%" if ms > 0 and sol > 0 else ""
            if fl and ms > 0:
                frac += (f" floor={fl['floor_ms']:.2f}ms"
                         f" ({fl['floor_ms'] / ms * 100:.0f}% of SOL,"
                         f" tile-floor {fl['tile_cmp_floor_ms']:.2f}ms)")
            print(f"--   {name:22s} {ms:8.3f} ms  [{shapes}]{frac}",
                  file=self.out)


class TimedOps:
    """Proxy over the ops module that device-times every call: one real
    dispatch for the returned value, then TRACE_ITERS amortizing
    re-dispatches drained by a single fetch, minus the calibrated RTT."""

    def __init__(self, ops_module, tracer: Tracer):
        self._ops = ops_module
        self._tracer = tracer

    def __getattr__(self, name: str):
        fn = getattr(self._ops, name)
        if not callable(fn):
            return fn

        def timed(*args, **kwargs):
            result = fn(*args, **kwargs)
            if not any(isinstance(v, jax.Array)
                       for v in jax.tree_util.tree_leaves(result)):
                return result  # host-side op: nothing to device-time
            rtt = self._tracer.rtt()
            _drain(result)  # warm + isolate from prior queue
            t0 = time.perf_counter()
            for _ in range(TRACE_ITERS):
                r = fn(*args, **kwargs)
            _drain(r)
            dev = max(time.perf_counter() - t0 - rtt, 0.0) / TRACE_ITERS
            self._tracer.record(name, args, result, dev * 1e3)
            return result

        return timed
