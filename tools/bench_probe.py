"""Device-timed comparison of the emitting-join probe members.

Measures, on the real chip, `ops/sort_join.py::join_probe_count` (ranks
over the concatenated [build, probe, probe+1] array — two sorts of
Pb + 2*Pp elements) against `ops/ms_join.py::join_probe_count_ms` (one
probe-side sort + the merge-staircase kernel + two u32 unsorts), for
u64 and key32 keys, across sizes.  The measured crossover picks
EMIT_MS_MIN_ROWS in engine/compiled.py (the padded size above which
intermediate joins take the staircase counting path).

Methodology matches tools/roofline.py: amortized back-to-back async
dispatches drained by one sync, tunnel RTT subtracted.

Usage: python tools/bench_probe.py [log2_min] [log2_max]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 23

    import sigmod2018_tpu  # noqa: F401 — applies S18_PLATFORM + x64
    import jax
    import jax.numpy as jnp

    from sigmod2018_tpu.ops import sort_join as sj
    from sigmod2018_tpu.ops.ms_join import join_probe_count_ms

    @jax.jit
    def _first(x):
        return jnp.ravel(x)[:1]

    def sync(o):
        return np.asarray(_first(jax.tree_util.tree_leaves(o)[0]))

    def rtt_measure():
        probe = jnp.ones((8,), jnp.int32)
        sync(probe)
        t0 = time.perf_counter()
        for _ in range(5):
            sync(probe)
        return (time.perf_counter() - t0) / 5

    rtt = rtt_measure()
    print(f"# probe members; tunnel RTT {rtt * 1000:.1f} ms; "
          f"backend={jax.default_backend()}")

    def devtime(f, iters=3):
        o = f()
        sync(o)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f()
        sync(o)
        return max((time.perf_counter() - t0 - rtt) / iters, 1e-9)

    rng = np.random.default_rng(0)
    print(f"{'rows':>8s} {'keys':>6s} {'searchsorted':>14s} "
          f"{'staircase':>12s} {'speedup':>8s}")
    for logn in range(lo, hi + 1):
        n = 1 << logn
        kb = rng.integers(0, max(n // 2, 1), n).astype(np.uint64)
        kp = rng.integers(0, max(n // 2, 1), n).astype(np.uint64)
        for key32 in (True, False):
            kbj = jnp.asarray(kb if key32 else kb << np.uint64(20))
            kpj = jnp.asarray(kp if key32 else kp << np.uint64(20))
            sk, perm = sj.join_build(kbj, jnp.int32(n), key32=key32)
            sync(sk)

            def f_ss():
                return sj.join_probe_count(sk, jnp.int32(n), kpj,
                                           jnp.int32(n))

            def f_ms():
                return join_probe_count_ms(sk, jnp.int32(n), kpj,
                                           jnp.int32(n), key32=key32)

            t_ss = devtime(f_ss)
            t_ms = devtime(f_ms)
            # parity while we're here: per-row cnt arrays, and lo
            # wherever a row has matches (lo is undefined at cnt==0)
            a = f_ss()
            b = f_ms()
            ca, cb = np.asarray(a[1]), np.asarray(b[1])
            assert np.array_equal(ca, cb), (logn, key32, "cnt mismatch")
            la, lb = np.asarray(a[0]), np.asarray(b[0])
            m = ca > 0
            assert np.array_equal(la[m], lb[m]), (logn, key32,
                                                  "lo mismatch")
            assert int(a[3]) == int(b[3]), (logn, key32, int(a[3]),
                                            int(b[3]))
            tag = "u32" if key32 else "u64"
            print(f"2^{logn:<6d} {tag:>6s} {t_ss * 1e3:11.2f} ms "
                  f"{t_ms * 1e3:9.2f} ms {t_ss / t_ms:7.2f}x")


if __name__ == "__main__":
    main()
