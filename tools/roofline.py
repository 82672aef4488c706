"""Device-timed roofline accounting for the radix-join kernel pipeline.

Measures, on the real chip, each stage of the at-scale fused join
(ops/radix_join.py): the two prep sorts, the slot-fill DMA, and the
streaming probe kernel — and reports each stage's achieved HBM bandwidth
against the chip's roofline plus the probe kernel's pair-compare rate.
This produces the BASELINE.md north-star evidence ("radix-probe >= 70%
of per-chip HBM roofline") as a *measured* number with its methodology,
instead of a wall-clock-only bench (VERDICT r1 missing #4).

Timing methodology: the tunneled chip has a ~27 ms host<->device RTT
(see memory/axon notes), so every number here is amortized: N back-to-back
async dispatches drained by ONE sync, minus the RTT, divided by N.
Reference cost model being restated: the probe loop rhjoin.c:141-217 and
partition preprocess.c:13-178.

Usage:  python tools/roofline.py [log2_rows]   (default 23)
"""

from __future__ import annotations

import sys
import time

import numpy as np

HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def _rtt(sync, probe):
    sync(probe)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(probe)
    return (time.perf_counter() - t0) / 5


def main() -> None:
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    n = 1 << logn

    import sigmod2018_tpu  # noqa: F401 — applies S18_PLATFORM + x64
    import jax
    import jax.numpy as jnp

    from sigmod2018_tpu.ops import radix_join as rj

    @jax.jit
    def _first(x):
        return jnp.ravel(x)[:1]

    def sync(o):
        return np.asarray(_first(jax.tree_util.tree_leaves(o)[0]))

    rtt = _rtt(sync, jnp.ones((8,), jnp.int32))
    print(f"# rows/side = 2^{logn}; tunnel RTT {rtt * 1000:.1f} ms; "
          f"HBM roofline {HBM_GBPS} GB/s")

    def devtime(f, *a, iters=5):
        o = f(*a)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        sync(o)
        return (time.perf_counter() - t0 - rtt) / iters

    rng = np.random.default_rng(0)
    bk = jnp.asarray(rng.integers(0, n, n, dtype=np.uint64))
    bv = jnp.asarray(rng.integers(0, 1 << 40, (1, n), dtype=np.uint64))
    pk = jnp.asarray(rng.integers(0, n, n, dtype=np.uint64))
    pv = jnp.asarray(rng.integers(0, 1 << 40, (1, n), dtype=np.uint64))

    bits, SPb, SPp = rj.static_radix_plan(n, n)
    B = 1 << bits
    print(f"# plan: bits={bits} (B={B}), slots/bucket build={SPb} probe={SPp}")

    # ---- stage 1: prep sort (the partition) ---------------------------
    t_prep = devtime(lambda: rj._prep_side(bk, bv, jnp.int32(n), bits))
    # variadic sort reads+writes key, liveness, V value columns log2(n)
    # times internally; the *external* contract bytes are one read + one
    # write of each stream (key u64 + 1 val u64 = 16 B/row each way).
    prep_bytes = 2 * 16 * n
    print(f"prep sort/side:  {t_prep * 1e3:8.2f} ms   contract "
          f"{prep_bytes / t_prep / 1e9:6.1f} GB/s "
          f"({prep_bytes / t_prep / 1e9 / HBM_GBPS * 100:5.1f}% of HBM "
          f"roofline; internal sort passes move ~log2(n)x more)")

    prep_b = rj._prep_side(bk, bv, jnp.int32(n), bits)
    prep_p = rj._prep_side(pk, pv, jnp.int32(n), bits)
    kb, vb, st_b, ct_b, _ = prep_b
    kp, vp, st_p, ct_p, _ = prep_p

    # ---- stage 2: slot-fill DMA --------------------------------------
    def limb_srcs(krot, SP):
        return (rj._pad_align((krot >> jnp.uint64(32)).astype(jnp.uint32), SP),
                rj._pad_align(krot.astype(jnp.uint32), SP))

    srcs_b = limb_srcs(kb, SPb)
    srcs_p = limb_srcs(kp, SPp)
    t_fill = devtime(lambda: rj._slotfill(st_b, srcs_b, B, SPb))
    fill_bytes = 2 * (4 * B * SPb)  # read + write each u32 limb matrix
    print(f"slot-fill DMA:   {t_fill * 1e3:8.2f} ms   "
          f"{fill_bytes / t_fill / 1e9:6.1f} GB/s "
          f"({fill_bytes / t_fill / 1e9 / HBM_GBPS * 100:5.1f}% of HBM "
          f"roofline) [{B} buckets x {SPb} slots x 2 limbs]")

    # ---- stage 3: streaming probe kernel ------------------------------
    mats_b = rj._slotfill(st_b, srcs_b, B, SPb)
    mats_p = rj._slotfill(st_p, srcs_p, B, SPp)
    for limbs in (2, 1):
        key_b = mats_b[:2] if limbs == 2 else (mats_b[1], mats_b[1])
        key_p = mats_p[:2] if limbs == 2 else (mats_p[1], mats_p[1])

        def probe():
            return rj._counts_all_groups(key_b, key_p, st_b, ct_b, st_p,
                                         ct_p, B, SPb, SPp, limbs)

        t_probe = devtime(probe, iters=3)
        # streamed per lane group: build limbs into VMEM once, probe limbs
        # streamed, pc + mc written back
        probe_bytes = 4 * B * ((limbs + 1) * (SPb + SPp))
        pairs = float(B) * SPb * SPp
        gbs = probe_bytes / t_probe / 1e9
        print(f"probe (limbs={limbs}): {t_probe * 1e3:8.2f} ms   "
              f"{gbs:6.1f} GB/s ({gbs / HBM_GBPS * 100:5.1f}% of HBM "
              f"roofline)   {pairs / t_probe / 1e12:6.2f} T pair-compares/s")

    # ---- end-to-end ---------------------------------------------------
    # Floor model (VERDICT r4 #6): the unconstrained per-call floor is
    # max(min HBM bytes at roofline, Pb+Pp merge compares at the VPU
    # ceiling); the tile-constrained compare floor adds the hardware
    # reality that a VPU banded merge cannot narrow a probe row's
    # window below one native tile (utils/floors.py).
    from sigmod2018_tpu.utils.floors import fused_join_floors

    fl64 = fused_join_floors(n, n, 1, 1, key32=False)
    fl32 = fused_join_floors(n, n, 1, 1, key32=True)
    print(f"# floors (u64): mem {fl64['mem_floor_ms']:.2f} ms, "
          f"merge-cmp {fl64['cmp_floor_ms']:.3f} ms -> "
          f"floor {fl64['floor_ms']:.2f} ms; tile-constrained cmp floor "
          f"{fl64['tile_cmp_floor_ms']:.2f} ms")

    def full():
        return rj.radix_fused_static(bk, bv, n, pk, pv, n, bits=bits,
                                     SPb=SPb, SPp=SPp, limbs=1)

    t_full = devtime(full, iters=3)
    sol = fl64["floor_ms"] / 1e3
    print(f"fused join e2e:  {t_full * 1e3:8.2f} ms   "
          f"{2 * n / t_full / 1e6:6.1f} Mrows/s   "
          f"(floor {fl64['floor_ms']:.2f} ms -> "
          f"{sol / t_full * 100:.1f}% of SOL; tile-floor "
          f"{fl64['tile_cmp_floor_ms'] / 1e3 / t_full * 100:.1f}%)")

    # ---- the other fused members at the same rows ----------------------
    # Key-table member (engine device_key_table): needs a bounded key
    # domain, so re-draw keys from [0, min(n, 2^22)); prep artifacts
    # (cumcnt + sort perm) are built untimed, as in the engine's prep.
    from sigmod2018_tpu import ops as O

    D = min(n, 1 << 22)
    bk2 = jnp.asarray(rng.integers(0, D, n, dtype=np.uint64))
    pk2 = jnp.asarray(rng.integers(0, D, n, dtype=np.uint64))
    u = D - 1
    bc = np.bincount(np.asarray(bk2).astype(np.int64), minlength=u + 1)
    cumcnt = np.zeros(u + 3, np.int32)
    cumcnt[1:u + 2] = np.cumsum(bc)
    cumcnt[u + 2] = cumcnt[u + 1]
    tbl = jnp.asarray(cumcnt)
    _, perm = O.join_build(bk2, jnp.int32(n))

    def sort_member():
        return O.join_checksum_fused(bk2, bv, jnp.int32(n), pk2, pv,
                                     jnp.int32(n), key32=True)

    def table_member():
        return O.join_checksum_fused_table(tbl, perm, bv, jnp.int32(n),
                                           pk2, pv, jnp.int32(n))

    # Probe-only member: rank table + prefix tables are prep artifacts
    # (engine device_prefix_table), query-time work is O(1)/probe row.
    prefs = jnp.stack([O.prefix_by_perm(bv[0], perm, jnp.int32(n))])

    def table_pref_member():
        return O.join_checksum_fused_table_pref(tbl, prefs, pk2, pv,
                                                jnp.int32(n))

    # Equi-depth member (ops/qd_join.py): same inputs as the radix
    # member; report its kernel stage separately too.
    from sigmod2018_tpu.ops import qd_join as qd

    SPbq, Hq, SPpq = qd.qd_static_plan(n, n)
    Bq = n // SPbq

    def qd_member():
        return qd.qd_fused_static(bk, bv, n, pk, pv, n, SPb=SPbq, H=Hq,
                                  SPp=SPpq, limbs=1)

    t_qd = devtime(qd_member, iters=3)
    qd_pairs = float(Bq) * SPpq * (SPbq + Hq)
    print(f"qd member e2e:   {t_qd * 1e3:8.2f} ms   "
          f"{2 * n / t_qd / 1e6:6.1f} Mrows/s   ({sol / t_qd * 100:.1f}% "
          f"of SOL)  [B={Bq} x {SPbq}+{Hq} build, {SPpq} probe slots; "
          f"{qd_pairs / 1e9:.1f} G pairs]")

    for name, f in (("sort member (key32)", sort_member),
                    ("table member", table_member),
                    ("table+pref member", table_pref_member)):
        t = devtime(f, iters=3)
        print(f"{name:<20s} e2e: {t * 1e3:8.2f} ms   "
              f"{2 * n / t / 1e6:6.1f} Mrows/s   "
              f"({sol / t * 100:.1f}% of SOL)  [domain 2^{int(np.log2(D))}]")

    # ---- merge-staircase member (ops/ms_join.py) — the at-scale default
    from sigmod2018_tpu.ops import ms_join as msj

    for key32, tag, bkx, pkx in ((True, "key32", bk2, pk2),
                                 (False, "u64", bk, pk)):
        def ms_member():
            return msj.ms_fused(bkx, bv, n, pkx, pv, n, key32=key32)

        t_ms = devtime(ms_member, iters=3)
        Wp, Hp, Tp = msj.stair_plan(n, n)
        flx = fl32 if key32 else fl64
        print(f"ms member ({tag})  e2e: {t_ms * 1e3:8.2f} ms   "
              f"{2 * n / t_ms / 1e6:6.1f} Mrows/s   "
              f"({flx['floor_ms'] / 1e3 / t_ms * 100:.1f}% of SOL, "
              f"tile-floor {flx['tile_cmp_floor_ms'] / 1e3 / t_ms * 100:.0f}%)"
              f"  [W={Wp} H={Hp} T_cap={Tp}]")

    # ms stage breakdown (key32): sort, staircase construct, kernel,
    # unsort — the e2e is 2 sorts + 2 kernels + 2 unsorts + weighted sums
    kb_s, perm_b = msj._sort_keys(bk2, jnp.int32(n), True)
    kp_s, perm_p = msj._sort_keys(pk2, jnp.int32(n), True)
    Wp, Hp, Tp = msj.stair_plan(n, n)
    t_sort = devtime(lambda: msj._sort_keys(bk2, jnp.int32(n), True))
    t_stair = devtime(lambda: msj.staircase_counts(
        kb_s, jnp.int32(n), kp_s, jnp.int32(n), W=Wp, H=Hp, T_cap=Tp),
        iters=3)
    cnt = jnp.zeros((n,), jnp.int32)
    t_unsort = devtime(lambda: msj._unsort(perm_p, cnt))
    kern_bytes = 4 * n * 2 + 8 * n  # stream both key arrays + counts out
    print(f"  ms stages: sort/side {t_sort * 1e3:6.2f} ms; staircase "
          f"kernel {t_stair * 1e3:6.2f} ms ({kern_bytes / t_stair / 1e9:5.1f}"
          f" GB/s, {n * (Wp + Hp) / t_stair / 1e12:5.2f} T pair-compares/s);"
          f" unsort {t_unsort * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
