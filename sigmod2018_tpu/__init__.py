"""sigmod2018_tpu — a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the SIGMOD-2018 contest multi-way
equi-join engine (reference: VagelisN/Sigmod-2018, C/pthreads).  The engine
speaks the contest's stdin protocol bit-exactly (reference: handler.c,
query.c) but executes every operator as a static-shape XLA program:

- storage/   columnar uint64 relations + per-column statistics
             (reference: relation_map.c)
- frontend/  query text -> typed IR  (reference: query.c:15-313, Parser.cpp)
- planner/   selectivity propagation + DP join enumeration
             (reference: stats.c, best_tree.c)
- ops/       device operators: filter compaction, gather, checksum,
             sort/searchsorted join, Pallas radix join
             (reference: filter.c, rhjoin.c, preprocess.c)
- engine/    the query VM: dense row-id intermediate results + executor
             (reference: inter_res.c, query.c:325-467)
- parallel/  multi-chip SPMD: mesh, hash-shuffle all_to_all, sharded join
             (reference: scheduler.c's thread pool, re-thought as SPMD)
- io/        stdin/stdout REPL driver (reference: handler.c)

uint64 columns and wrap-around checksums require 64-bit JAX types, so x64
mode is enabled at import, before any JAX computation runs.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# S18_PLATFORM=cpu|tpu|axon forces the backend.  The env var route
# (JAX_PLATFORMS) can be preempted by container site hooks that call
# jax.config.update directly, so we go through the config knob too.
_platform = os.environ.get("S18_PLATFORM")
if _platform:
    jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: the engine compiles one program per
# (operator, size-class) pair; caching across processes makes the contest's
# untimed prep phase absorb all compilation on reruns.
_cache_dir = os.environ.get(
    "S18_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:  # older jax without the knobs — cache is an optimization only
    pass

__version__ = "0.1.0"
