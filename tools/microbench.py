"""Primitive-rate microbench: the measured numbers the kernel designs
cite (ops/radix_join.py header table, STATUS.md roofline section).

Rates measured, each device-timed with the amortized re-dispatch
methodology (N async dispatches, one drain, tunnel RTT subtracted —
see tools/roofline.py):

  copy        u64 HBM stream (the roofline sanity check)
  gather      random u32/u64 gather at several index localities —
              THE number that decides sort-carried payloads vs
              perm-gather prep artifacts (radix_join.py design table)
  scatter     random u32 scatter-add (histogram building block)
  sort        u64 single-operand and variadic (key + 2 payloads)
  cumsum      u64 prefix sum (prefix-table build rate)
  searchsorted method="sort" (the sort member's probe primitive)

Usage: python tools/microbench.py [log2_n]   (default 23)
"""

from __future__ import annotations

import sys
import time

import numpy as np

HBM_GBPS = 819.0


def main() -> None:
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    n = 1 << logn

    import sigmod2018_tpu  # noqa: F401 — applies S18_PLATFORM + x64
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _first(x):
        return jnp.ravel(x)[:1]

    def sync(o):
        return np.asarray(_first(jax.tree_util.tree_leaves(o)[0]))

    sync(jnp.ones((8,), jnp.int32))
    t0 = time.perf_counter()
    for _ in range(5):
        sync(jnp.ones((8,), jnp.int32))
    rtt = (time.perf_counter() - t0) / 5
    print(f"# n = 2^{logn}; RTT {rtt * 1e3:.1f} ms; "
          f"HBM roofline {HBM_GBPS} GB/s")

    def devtime(f, *a, iters=5):
        o = f(*a)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        sync(o)
        return max((time.perf_counter() - t0 - rtt) / iters, 1e-9)

    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.integers(0, 1 << 60, n, dtype=np.uint64))
    x32 = x64.astype(jnp.uint32)
    idx_rand = jnp.asarray(rng.permutation(n).astype(np.int32))
    # Blocked locality: random 1024-aligned blocks, sequential inside.
    blocks = rng.permutation(n // 1024).astype(np.int32)
    idx_block = jnp.asarray(
        (blocks[:, None] * 1024 + np.arange(1024, dtype=np.int32)).ravel())

    copy = jax.jit(lambda a: a + jnp.uint64(1))
    t = devtime(copy, x64)
    print(f"copy u64:            {t * 1e3:8.2f} ms  "
          f"{16 * n / t / 1e9:7.1f} GB/s")

    gather = jax.jit(lambda a, i: a[i])
    for name, arr, bytes_row in (("u64", x64, 8), ("u32", x32, 4)):
        for iname, idx in (("random", idx_rand), ("1K-block", idx_block)):
            t = devtime(gather, arr, idx)
            gb = (2 * bytes_row + 4) * n / t / 1e9
            print(f"gather {name} {iname:9s} {t * 1e3:8.2f} ms  "
                  f"{gb:7.1f} GB/s  ({n / t / 1e6:7.1f} Mrows/s)")

    scat = jax.jit(lambda a, i: jnp.zeros_like(a).at[i].add(a))
    t = devtime(scat, x32, idx_rand)
    print(f"scatter-add u32:     {t * 1e3:8.2f} ms  "
          f"{12 * n / t / 1e9:7.1f} GB/s")

    sort1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))
    t = devtime(sort1, x64, iters=3)
    print(f"sort u64 x1:         {t * 1e3:8.2f} ms  "
          f"({n / t / 1e6:7.1f} Mrows/s)")

    sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
    t = devtime(sort3, x64, x64, x64, iters=3)
    print(f"sort u64 +2 payload: {t * 1e3:8.2f} ms  "
          f"({n / t / 1e6:7.1f} Mrows/s)")

    cs = jax.jit(lambda a: jnp.cumsum(a))
    t = devtime(cs, x64)
    print(f"cumsum u64:          {t * 1e3:8.2f} ms  "
          f"({n / t / 1e6:7.1f} Mrows/s)")

    skeys = jnp.sort(x64)
    ss = jax.jit(lambda s, q: jnp.searchsorted(s, q, method="sort"))
    t = devtime(ss, skeys, x64, iters=3)
    print(f"searchsorted(sort):  {t * 1e3:8.2f} ms  "
          f"({n / t / 1e6:7.1f} Mrows/s)")


if __name__ == "__main__":
    main()
