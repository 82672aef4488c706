"""stdin/stdout protocol driver (reference: handler.c, main.cpp).

Protocol:
  1. one relation file path per line, until the line "Done"
  2. query lines in batches; "F" ends a batch (the whole batch executes
     then), "Exit" or EOF terminates
  3. one output line per query: space-separated uint64 checksums, or NULL
     per projection on an empty result

The prep phase (loading + stats + device transfer) happens before the first
batch and is untimed by the contest harness (harness.cpp:175-208), so the
engine eagerly pushes all columns to the device and pre-compiles the hot
operator shapes there.
"""

from __future__ import annotations

import os
import sys
import threading
from typing import IO, List, Optional

from ..config import EngineConfig
from ..frontend.parser import Query, parse_query
from ..storage.catalog import Catalog


def _init_backend_async() -> threading.Thread:
    """Start the JAX backend (tunnel handshake on the remote TPU —
    measured ~8 s cold in round 4) in a daemon thread so it overlaps
    stdin catalog loading.  The contest harness only grants a 1 s
    untimed window after `Done` (harness.cpp:175-177); every second of
    serial init past it lands in the timed phase."""
    def init():
        try:
            import jax
            import jax.numpy as jnp

            jax.devices()
            # A real VALUE fetch, not block_until_ready: the tunnel's
            # device->host transfer channel initializes lazily on the
            # first value read and costs ~4 s (measured; priming runs
            # that only block_until_ready never pay it) — the first
            # query's fetch would otherwise foot that bill in the
            # timed phase.
            int(jnp.zeros((8,), jnp.uint32).sum())
        except Exception:  # noqa: BLE001 — serving will re-raise later
            pass

    t = threading.Thread(target=init, daemon=True, name="s18backendinit")
    t.start()
    return t


def run_protocol(stdin: IO[str], stdout: IO[str],
                 config: Optional[EngineConfig] = None) -> None:
    config = config or EngineConfig.from_env()
    _init_backend_async()

    paths: List[str] = []
    for raw in stdin:
        line = raw.strip()
        if line == "Done":
            break
        if line:
            paths.append(line)

    catalog = Catalog.from_files(paths)

    if config.backend == "numpy":
        from ..engine.oracle import execute_query_numpy

        def run_async(q: Query):
            return execute_query_numpy(q, catalog)

        pool = None
        warmup_oracle = None
    else:
        from concurrent.futures import ThreadPoolExecutor

        if config.mesh_devices > 1:
            from ..parallel.multihost import init_distributed

            init_distributed()  # no-op unless S18_COORD_ADDR is set
            if config.compile_queries and not config.trace:
                from ..parallel.dist_compiled import DistCompiledEngine

                engine = DistCompiledEngine(catalog, config)
            else:
                from ..parallel.dist_engine import DistJaxEngine

                engine = DistJaxEngine(catalog, config)
        elif config.compile_queries and not config.trace:
            from ..engine.compiled import CompiledEngine

            engine = CompiledEngine(catalog, config)
        else:
            from ..engine.executor import JaxEngine

            engine = JaxEngine(catalog, config)
        # Async prep (default): serving starts the moment the engine
        # exists; prefetch (device transfers, presorts, key tables,
        # vault restore) runs in a daemon thread and the first queries
        # build exactly the columns they need on demand (the per-column
        # caches make the duplicate work benign).  Wall-clock becomes
        # max(prefetch, serving critical path) instead of their sum —
        # the contest harness starts its stopwatch 1 s after `Done`
        # (harness.cpp:206-208), long before a cold prefetch finishes.
        # S18_ASYNC_PREP=0 restores blocking prep (debugging).
        device_ready = threading.Event()
        if os.environ.get("S18_ASYNC_PREP", "1") != "0":
            def prep():
                try:
                    engine.prefetch()
                    if hasattr(engine, "quiesce"):
                        engine.quiesce()
                finally:
                    device_ready.set()

            threading.Thread(target=prep, daemon=True,
                             name="s18prefetch").start()
        else:
            engine.prefetch()
            device_ready.set()
        run_async = engine.execute_async
        # Tiered warm-up serving: until the device engine is warm
        # (prefetch + vault restores done), queries over SMALL inputs
        # are answered by the exact host oracle — zero device
        # dependency, so a cold tunneled backend (measured: ~5 s
        # handshake + ~1.6 s transfer-channel init per process, both
        # outside the engine) never blocks the first batches.  The
        # oracle is the same differential-test twin that backs the
        # poisoned-device tier; answers are exact either way.  Row
        # bound S18_WARMUP_ORACLE (total referenced base rows;
        # 0 disables) keeps at-scale queries on the device path,
        # where init is amortized anyway.
        # Default bound 2^21 total referenced rows: covers the
        # small/scaled-class workloads (the factorized twin answers a
        # 600K-row forest query in ~340 ms host-side) while at-scale
        # workloads (2M-row relations: >= 8M referenced rows) keep the
        # device path, whose init their runtimes amortize.
        warmup_max = int(os.environ.get("S18_WARMUP_ORACLE",
                                        str(1 << 21)))

        def warmup_oracle(q: Query):
            if warmup_max <= 0 or device_ready.is_set():
                return None
            try:
                rows = sum(catalog.relation(r).num_tuples
                           for r in q.relations)
                if rows > warmup_max:
                    return None
                # Forest queries (most) answer via the factorized twin:
                # zero materialization, so no first-touch page faults on
                # huge repeat-expansions — measured 596 ms vs 3.3 s for
                # the materializing oracle's first small-workload pass.
                from ..engine.factorized import execute_query_factorized_np

                line = execute_query_factorized_np(q, catalog)
                if line is not None:
                    return line
                from ..engine.oracle import execute_query_numpy

                return execute_query_numpy(q, catalog)
            except Exception:  # noqa: BLE001 — device path serves it
                return None

        # Threads overlap per-query host syncs; device execution stays
        # serialized (and deterministic) inside XLA.
        pool = (ThreadPoolExecutor(config.batch_workers)
                if config.batch_workers > 1 else None)

    def null_line(q: Query) -> str:
        return " ".join("NULL" for _ in q.views) if q.views else "NULL"

    def start(q: Query):
        # Per-query fault isolation: one bad query must not kill the batch
        # (the reference exits the process on internal errors, query.c:424;
        # we degrade to a NULL line and keep serving).
        try:
            if warmup_oracle is not None:  # jax path: warm-up tier
                line = warmup_oracle(q)
                if line is not None:
                    return line
            return run_async(q)
        except Exception as exc:  # noqa: BLE001
            print(f"query error: {exc!r} in {q.text!r}", file=sys.stderr)
            return null_line(q)

    def finish(q: Query, res) -> str:
        if isinstance(res, str):
            return res
        try:
            return res.line()
        except Exception as exc:  # noqa: BLE001
            print(f"query error: {exc!r} in {q.text!r}", file=sys.stderr)
            return null_line(q)

    def run_batch(batch: List[Query]) -> None:
        # Dispatch the whole batch to the device before fetching any
        # result line (SURVEY §7.3 batch-level pipelining).
        if pool is not None:
            results = list(pool.map(start, batch))
        else:
            results = [start(q) for q in batch]
        try:
            from ..engine.executor import format_batch

            lines = format_batch(results)
        except Exception:  # degraded path: per-query fetch
            lines = [finish(q, res) for q, res in zip(batch, results)]
        for line in lines:
            stdout.write(line + "\n")
        stdout.flush()

    batch: List[Query] = []
    batches_done = 0
    for raw in stdin:
        line = raw.strip()
        if line == "Exit":
            break
        if not line:
            continue
        if line == "F":
            run_batch(batch)
            batch = []
            batches_done += 1
            if (config.cache_clear_batches
                    and batches_done % config.cache_clear_batches == 0):
                import jax

                jax.clear_caches()  # bound program-cache growth
            continue
        try:
            batch.append(parse_query(line))
        except Exception as exc:  # noqa: BLE001
            print(f"parse error: {exc!r} in {line!r}", file=sys.stderr)
            batch.append(Query((), (), ((0, 0),), text=line))
    # Trailing unterminated batch (EOF without final F) still executes,
    # matching the C++ driver's per-line behavior (main.cpp:17-22).
    run_batch(batch)


def main() -> None:
    run_protocol(sys.stdin, sys.stdout)
    # Hard exit: daemon prep threads (backend init, prefetch, vault
    # restores) may still sit inside native code; interpreter teardown
    # cancels them mid-C++ and glibc aborts with "FATAL: exception not
    # rethrown".  Every result line is already flushed — skip teardown.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
