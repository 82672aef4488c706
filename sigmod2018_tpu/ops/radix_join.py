"""Pallas radix join v2: sort-partition + DMA slot-fill + streaming probe.

TPU-native restatement of the reference's radix hash join (rhjoin.c:13-111,
preprocess.c:13-178), redesigned around what this hardware actually does
well and badly (all numbers measured on the v5e this engine targets):

  measured fact                          design consequence
  -------------                          ------------------
  random/blocked GATHER ~1-2 GB/s        never gather at scale: payloads
                                         ride `lax.sort` variadically
  u64 variadic sort 16M ~65 ms           one sort per side IS the
                                         partition (keys bit-rotated so
                                         bucket = low key bits lands in
                                         the sort's top bits)
  in-kernel DMA ~2.5 issues/us,          per-bucket slot-fill: bucket b's
  sequential streams ~240 GB/s           contiguous sorted segment DMAs
                                         into row b of a padded [B, SP]
                                         matrix (static size, dynamic
                                         1024-aligned offset; the head
                                         misalignment becomes a per-
                                         bucket window offset masked in
                                         the probe kernel)
  VPU same-lane compare ~2e11 pair/s,    probe kernel holds the build
  cross-lane all-pairs inexpressible     matrix [Sb, B] resident in VMEM
                                         (bucket = lane) and STREAMS the
                                         probe matrix from HBM in double-
                                         buffered tiles; per-build-row
                                         and per-probe-row match counts
                                         emit in ONE pass (mc accumulated
                                         in VMEM, pc DMA'd per tile)
  Mosaic: no 64-bit types                kernels compare u32 hi/lo limbs;
                                         a single-limb fast path engages
                                         when both key columns fit u32
                                         (catalog stats know statically)

The checksums never materialize a pair list: counts weight the sorted
value columns elementwise (wrap-around uint64, exact, in XLA where u64
exists) — the radix restatement of the fused aggregate join
(ops/agg_join.py contract).

Reference mapping: HistJob histogram -> starts via searchsorted over the
sorted keys; PartitionJob scatter -> the sort + slot-fill DMA; bucket-
chain index + chain walk (rhjoin.c:219-309) -> dense same-lane compare;
GetResults emit (rhjoin.c:141-217) -> two-phase count/expand in
`radix_probe_count` / `radix_emit`.

Scale: no per-bucket row cap beyond VMEM economics — the lane axis is
split into super-groups when the build matrix exceeds the VMEM budget,
so 10M+-row sides run without falling back.  Pathological skew (a single
key whose multiplicity exceeds `MAX_SLOTS`) pushes the bucketed layout
past its padding economics; `radix_join_checksum` then raises and the
caller uses the degenerate single-bucket path (sort-merge — the bits=0
member of the same family, ops/sort_join.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
ALIGN = 1024          # 1-D HBM refs are (1024)-tiled: DMA offsets/sizes
MAX_SLOTS = 1 << 13   # per-bucket slot cap (padding economics, not VMEM)
VMEM_SLOT_BUDGET = 3 << 18  # build-matrix slots resident per kernel call

# Size-dispatch threshold for the auto path.  Measured on the target
# chip (sync-free static path, single-limb): radix beats the fused sort
# join 1.9-4x at every size from 2^16 to 2^24 rows/side; the threshold
# stays at 2^18 because below that the join runs in ~1 ms either way and
# the contest-metric small workload (<=2^16 padded) keeps its warmed
# program set.
import os as _os

RADIX_MIN_ROWS = int(_os.environ.get("S18_RADIX_MIN", str(1 << 18)))


def _rotate(keys: jax.Array, bits: int) -> jax.Array:
    """Move the low `bits` (the radix bucket, reference H1 = value &
    (2^N_LSB-1), rhjoin.c:13-111) to the TOP so one sort groups by
    bucket and orders by key within the bucket.  Bijective: equality on
    rotated keys == equality on keys, so kernels compare rotated limbs
    directly and never rotate back."""
    if bits == 0:
        return keys
    return (keys << jnp.uint64(64 - bits)) | (keys >> jnp.uint64(bits))


def _rotate32(keys32: jax.Array, bits: int) -> jax.Array:
    """32-bit rotation for the key32 fast path (both key columns < 2^32
    by catalog stats): same bucket grouping and same within-bucket order
    as `_rotate` — rot32(k) = (low_bits << (32-bits)) | (k >> bits),
    while rot64(k)'s limbs are exactly (low_bits << (32-bits), k >> bits)
    for k < 2^32 and bits <= 32.  Hence rot32(k) == ((rot64(k) >> 32) |
    rot64(k)) as u32: prep artifacts stored in rot64 normalize to this
    encoding with one elementwise OR (`_rot64_to_rot32`)."""
    if bits == 0:
        return keys32
    return ((keys32 << jnp.uint32(32 - bits))
            | (keys32 >> jnp.uint32(bits)))


def _rot64_to_rot32(krot64: jax.Array) -> jax.Array:
    """Normalize a rot64-encoded key array (keys < 2^32) to the rot32
    encoding — order-preserving and equality-preserving (see _rotate32).
    The 2^64-1 dead-row sentinel maps to 2^32-1, the rot32 sentinel."""
    return (krot64 | (krot64 >> jnp.uint64(32))).astype(jnp.uint32)


def _bucket_starts(krot_s: jax.Array, n, bits: int) -> jax.Array:
    """Per-bucket start positions in the sorted rotated keys WITHOUT a
    u64 searchsorted (its method="sort" lowering measures ~8x a plain
    sort).  Bucket edges have a zero low limb, so ranking them against
    the HIGH limb alone is exact: (hi, lo) >= (edge_hi, 0) iff
    hi >= edge_hi.  For the rot32 (u32) encoding the keys are their own
    high limb."""
    B = 1 << bits
    if krot_s.dtype == jnp.uint64:
        hs = (krot_s >> jnp.uint64(32)).astype(jnp.uint32)
        edges = (jnp.arange(B, dtype=jnp.uint32)
                 << jnp.uint32(32 - bits)) if bits else jnp.zeros(
                     (B,), jnp.uint32)
    else:
        hs = krot_s
        edges = (jnp.arange(B, dtype=jnp.uint32)
                 << jnp.uint32(32 - bits)) if bits else jnp.zeros(
                     (B,), jnp.uint32)
    starts = jnp.searchsorted(hs, edges, side="left",
                              method="sort").astype(jnp.int32)
    return jnp.minimum(starts, jnp.int32(n))


@partial(jax.jit, static_argnames=("bits",))
def radix_prep_keys(keys: jax.Array, n, bits: int):
    """Prep-time half of `_prep_side` for a BASE column: the rotated-key
    sort, bucket starts/counts and max occupancy — everything the radix
    member needs that doesn't depend on the query's value columns.  The
    returned perm lets prep also pre-sort any value column
    (engine device_radix_val), so a fused radix join whose side is an
    unfiltered base column runs with ZERO query-time sorts (the measured
    prep sort is ~45% of the member's e2e time at 2^23).

    Returns (krot_sorted [P] u64, perm [P] i32, starts [B] i32,
    cnts [B] i32, max_occ i32[]).  Artifacts are bits-specific; callers
    must only use them when `plan_bits(P_build)` matches."""
    P = keys.shape[0]
    n = jnp.int32(n)
    live = jnp.arange(P, dtype=jnp.int32) < n
    krot = jnp.where(live, _rotate(keys, bits), _MAX_U64)
    iota = jnp.arange(P, dtype=jnp.int32)
    # ONE stable single-key sort: the deadflag second key is redundant
    # (dead rows sit at suffix positions, so stability keeps live
    # 2^64-1 keys ahead of them) and a num_keys=2 u64 comparator costs
    # ~1.5x; bucket starts rank against the high limb (ops/lsd.py cost
    # table: u64 searchsorted method="sort" measures ~8x a plain sort).
    krot_s, perm = jax.lax.sort((krot, iota), num_keys=1, is_stable=True)
    starts = _bucket_starts(krot_s, n, bits)
    ends = jnp.concatenate([starts[1:], n.reshape(1)])
    cnts = ends - starts
    return krot_s, perm, starts, cnts, jnp.max(cnts)


@partial(jax.jit, static_argnames=("bits", "key32"))
def _prep_side(keys: jax.Array, vals: jax.Array, n: jax.Array, bits: int,
               key32: bool = False):
    """Sort one side by the rotated key carrying the value columns;
    derive per-bucket starts/counts and the max occupancy.

    vals: [V, P] u64.  Returns (krot_sorted [P], vals_sorted [V, P],
    starts [B] i32, cnts [B] i32, max_occ i32).  ONE stable single-key
    sort: dead rows (index >= n, key forced to the dtype max) sit at
    suffix positions, so stability keeps any live max-key row ahead of
    them — the live prefix is exactly n rows, without the ~1.5x-cost
    num_keys=2 liveness comparator.

    `key32` (both key columns < 2^32 by catalog stats): keys sort in
    the 32-bit rotation encoding (_rotate32) — single-limb comparator,
    ~1.6x cheaper — and krot_sorted is returned as u32.  rot32 has the
    same order and the same equality as rot64's limbs (see _rotate32),
    so downstream (slot-fill limbs, window math, the merge fallback)
    is unchanged; a prep-artifact side stored in rot64 normalizes via
    _rot64_to_rot32."""
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n
    if key32:
        krot = jnp.where(live, _rotate32(keys.astype(jnp.uint32), bits),
                         jnp.uint32(0xFFFFFFFF))
    else:
        krot = jnp.where(live, _rotate(keys, bits), _MAX_U64)
    ops = (krot,) + tuple(vals[v] for v in range(vals.shape[0]))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    krot_s = sorted_ops[0]
    vals_s = (jnp.stack(sorted_ops[1:]) if vals.shape[0]
              else jnp.zeros((0, P), jnp.uint64))
    starts = _bucket_starts(krot_s, n.astype(jnp.int32), bits)
    ends = jnp.concatenate([starts[1:], n.astype(jnp.int32).reshape(1)])
    cnts = ends - starts
    return krot_s, vals_s, starts, cnts, jnp.max(cnts)


@partial(jax.jit, static_argnames=("bits",))
def _prep_two_sides(keys_b, vals_b, n_b, keys_p, vals_p, n_p, bits: int):
    kb, vb, st_b, ct_b, mo_b = _prep_side(keys_b, vals_b, n_b, bits)
    kp, vp, st_p, ct_p, mo_p = _prep_side(keys_p, vals_p, n_p, bits)
    return (kb, vb, st_b, ct_b), (kp, vp, st_p, ct_p), jnp.stack([mo_b, mo_p])


# ---------------------------------------------------------------------------
# Slot-fill: per-bucket DMA of contiguous sorted segments into [B, SP]
# ---------------------------------------------------------------------------


def _slotfill_kernel(starts_ref, *refs, B: int, SP: int, N: int, K: int):
    """For each bucket b and each of K source arrays, DMA the ALIGN-
    aligned segment around starts[b] into row b of that array's padded
    [B, SP] output.  The head misalignment (starts[b] - aligned) is
    masked downstream via the per-bucket window offset."""
    srcs = refs[:K]
    outs = refs[K:]

    al = jnp.int32(ALIGN)  # pin every in-kernel scalar: Mosaic has no i64

    def body(sem):
        def loop(b, _):
            st = starts_ref[b, 0]
            st_al = jnp.minimum((st // al) * al, jnp.int32(N - SP))
            st_al = pl.multiple_of(st_al, ALIGN)
            for k in range(K):
                cp = pltpu.make_async_copy(
                    srcs[k].at[pl.ds(st_al, SP)],
                    outs[k].at[pl.ds(b * jnp.int32(SP), SP)],
                    sem,
                )
                cp.start()
                cp.wait()
            return _

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), loop, jnp.int32(0))

    pl.run_scoped(body, sem=pltpu.SemaphoreType.DMA(()))


@partial(jax.jit, static_argnames=("B", "SP"))
def _slotfill(starts: jax.Array, srcs: Tuple[jax.Array, ...], B: int,
              SP: int):
    """srcs: K u32 arrays [N] (N multiple of ALIGN, N >= SP).  Returns K
    arrays [B, SP] (padded row views around each bucket)."""
    K = len(srcs)
    N = srcs[0].shape[0]
    out = pl.pallas_call(
        partial(_slotfill_kernel, B=B, SP=SP, N=N, K=K),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * K,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY)
                        for _ in range(K)),
        out_shape=tuple(jax.ShapeDtypeStruct((B * SP,), jnp.uint32)
                        for _ in range(K)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts[:, None], *srcs)
    return tuple(o.reshape(B, SP) for o in out)


def _pad_align(x: jax.Array, seg_len: int) -> jax.Array:
    """Pad a 1-D array so a seg_len DMA from ANY aligned-down start
    (start <= N) stays in bounds — the in-kernel clamp must never bind,
    because the probe window offset assumes offset == start % ALIGN."""
    N = x.shape[0]
    Np = -(-N // ALIGN) * ALIGN + seg_len
    return jnp.pad(x, (0, Np - N))


# ---------------------------------------------------------------------------
# Streaming dual-count probe kernel
# ---------------------------------------------------------------------------


def _probe_kernel(bh_ref, bl_ref, maskb_ref, maskp_ref, ph_hbm, plo_hbm,
                  mc_ref, pc_hbm, *, Sb: int, Sp: int, B: int, TI: int,
                  TJ: int, limbs: int):
    """Per-bucket (lane) match counts, one pass, probe streamed from HBM.

    bh/bl: build limb matrices [Sb, B] resident in VMEM (bucket = lane).
    maskb/maskp: [2, B] i32 rows (window offset, offset + count) — the
    slot-fill head misalignment plus the bucket's occupancy.
    mc [Sb, B]: per-build-slot probe-match counts (VMEM, accumulated).
    pc [Sp, B]: per-probe-slot build-match counts (DMA'd out per tile).
    f32 count arithmetic is exact: counts <= MAX_SLOTS < 2^24.
    """
    ti = jnp.int32(TI)  # pin every in-kernel scalar: Mosaic has no i64
    tj = jnp.int32(TJ)

    def body(sth, stl, pcstage, sems, osem):
        nch = Sp // TI

        def get(slot, i):
            cph = pltpu.make_async_copy(
                ph_hbm.at[pl.ds(i * ti, TI), :], sth.at[slot], sems.at[slot, jnp.int32(0)])
            cph.start()
            if limbs == 2:
                cpl = pltpu.make_async_copy(
                    plo_hbm.at[pl.ds(i * ti, TI), :], stl.at[slot],
                    sems.at[slot, jnp.int32(1)])
                cpl.start()

        def wait(slot, i):
            pltpu.make_async_copy(
                ph_hbm.at[pl.ds(i * ti, TI), :], sth.at[slot],
                sems.at[slot, jnp.int32(0)]).wait()
            if limbs == 2:
                pltpu.make_async_copy(
                    plo_hbm.at[pl.ds(i * ti, TI), :], stl.at[slot],
                    sems.at[slot, jnp.int32(1)]).wait()

        def z(jt, _):
            mc_ref[pl.ds(jt * tj, TJ), :] = jnp.zeros((TJ, B), jnp.int32)
            return _

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(Sb // TJ), z, jnp.int32(0))
        get(jnp.int32(0), jnp.int32(0))

        blo = maskb_ref[0:1, :]
        bhi = maskb_ref[1:2, :]
        plo_w = maskp_ref[0:1, :]
        phi_w = maskp_ref[1:2, :]

        def ptile(i, _):
            slot = jax.lax.rem(i, jnp.int32(2))

            @pl.when(i + jnp.int32(1) < jnp.int32(nch))
            def _s():
                get(jax.lax.rem(i + jnp.int32(1), jnp.int32(2)),
                    i + jnp.int32(1))

            wait(slot, i)
            ph = sth[slot]                     # [TI, B]
            plo = stl[slot] if limbs == 2 else None
            idx = jax.lax.broadcasted_iota(jnp.int32, (TI, 1), 0) + i * ti
            live_p = (idx >= plo_w) & (idx < phi_w)
            acc_pc = jnp.zeros((TI, B), jnp.float32)

            def btile(jt, acc):
                bh = bh_ref[pl.ds(jt * tj, TJ), :]
                jdx = (jax.lax.broadcasted_iota(jnp.int32, (TJ, 1), 0)
                       + jt * tj)
                live_b = (jdx >= blo) & (jdx < bhi)
                eq = ph[:, None, :] == bh[None, :, :]
                if limbs == 2:
                    bl = bl_ref[pl.ds(jt * tj, TJ), :]
                    eq &= plo[:, None, :] == bl[None, :, :]
                eq &= live_p[:, None, :] & live_b[None, :, :]
                eqf = jnp.where(eq, jnp.float32(1), jnp.float32(0))
                mc_ref[pl.ds(jt * tj, TJ), :] += (
                    eqf.sum(axis=0).astype(jnp.int32))
                return acc + eqf.sum(axis=1)

            acc_pc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(Sb // TJ),
                                       btile, acc_pc)
            pcstage[slot] = acc_pc.astype(jnp.int32)
            cpo = pltpu.make_async_copy(
                pcstage.at[slot], pc_hbm.at[pl.ds(i * ti, TI), :],
                osem.at[slot])
            cpo.start()
            cpo.wait()
            return _

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(nch), ptile, jnp.int32(0))

    pl.run_scoped(
        body,
        sth=pltpu.VMEM((2, TI, B), jnp.uint32),
        stl=pltpu.VMEM((2, TI, B), jnp.uint32),
        pcstage=pltpu.VMEM((2, TI, B), jnp.int32),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        osem=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("TI", "TJ", "limbs"))
def _probe_counts(bh, bl, maskb, maskp, ph, plo, TI: int, TJ: int,
                  limbs: int):
    Sb, B = bh.shape
    Sp = ph.shape[0]
    return pl.pallas_call(
        partial(_probe_kernel, Sb=Sb, Sp=Sp, B=B, TI=TI, TJ=TJ, limbs=limbs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        out_shape=(jax.ShapeDtypeStruct((Sb, B), jnp.int32),
                   jax.ShapeDtypeStruct((Sp, B), jnp.int32)),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bh, bl, maskb, maskp, ph, plo)


def _round_tile(s: int, cap: int) -> int:
    t = min(cap, s)
    while s % t:
        t //= 2
    return max(t, 1)


def _counts_grouped(bh_t, bl_t, maskb, maskp, ph_t, pl_t, B, Sb, SPp,
                    limbs: int):
    """Split the lane axis into VMEM-sized super-groups and run the
    streaming kernel per group.  Inputs are lane-major [S, B] limb
    matrices plus explicit [2, B] window masks (offset, offset+count) —
    shared by the radix member (windows from slot-fill alignment) and
    the equi-depth member (windows from exact reshape + halo)."""
    lanes_per = max(128, (VMEM_SLOT_BUDGET // max(Sb, 1)) // 128 * 128)
    lanes_per = min(lanes_per, B)
    TI = _round_tile(SPp, 16)
    TJ = _round_tile(Sb, 16)

    mcs, pcs = [], []
    for g0 in range(0, B, lanes_per):
        g1 = min(g0 + lanes_per, B)
        mc_g, pc_g = _probe_counts(
            bh_t[:, g0:g1], bl_t[:, g0:g1] if limbs == 2 else bl_t,
            maskb[:, g0:g1], maskp[:, g0:g1],
            ph_t[:, g0:g1], pl_t[:, g0:g1] if limbs == 2 else pl_t,
            TI, TJ, limbs)
        mcs.append(mc_g)
        pcs.append(pc_g)
    mc = jnp.concatenate(mcs, axis=1).T  # [B, Sb]
    pc = jnp.concatenate(pcs, axis=1).T  # [B, SPp]
    return mc, pc


def _counts_all_groups(kb_mat, kp_mat, st_b, ct_b, st_p, ct_p, B, SPb, SPp,
                       limbs: int):
    """Radix-member wrapper: windows from the slot-fill ALIGN offsets."""
    bh_t = kb_mat[0].T
    bl_t = kb_mat[1].T if limbs == 2 else jnp.zeros((1, B), jnp.uint32)
    ph_t = kp_mat[0].T
    pl_t = kp_mat[1].T if limbs == 2 else jnp.zeros((1, B), jnp.uint32)

    off_b = (st_b % ALIGN).astype(jnp.int32)
    off_p = (st_p % ALIGN).astype(jnp.int32)
    maskb = jnp.stack([off_b, off_b + ct_b])          # [2, B]
    maskp = jnp.stack([off_p, off_p + ct_p])
    return _counts_grouped(bh_t, bl_t, maskb, maskp, ph_t, pl_t,
                           B, SPb, SPp, limbs)


# ---------------------------------------------------------------------------
# Fused join + checksums (the agg_join contract)
# ---------------------------------------------------------------------------


def _radix_body(prep_b, prep_p, bits: int, SPb: int, SPp: int,
                limbs: int):
    kb, vb, st_b, ct_b = prep_b
    kp, vp, st_p, ct_p = prep_p
    B = 1 << bits

    def limb_arrays(krot_s, vals_s, SP):
        srcs = [_pad_align(krot_s.astype(jnp.uint32), SP)]
        if limbs == 2:
            srcs.insert(0, _pad_align((krot_s >> jnp.uint64(32))
                                      .astype(jnp.uint32), SP))
        for v in range(vals_s.shape[0]):
            srcs.append(_pad_align((vals_s[v] >> jnp.uint64(32))
                                   .astype(jnp.uint32), SP))
            srcs.append(_pad_align(vals_s[v].astype(jnp.uint32), SP))
        return srcs

    srcs_b = limb_arrays(kb, vb, SPb)
    srcs_p = limb_arrays(kp, vp, SPp)
    mats_b = _slotfill(st_b, tuple(srcs_b), B, SPb)
    mats_p = _slotfill(st_p, tuple(srcs_p), B, SPp)
    nk = limbs  # number of key limb matrices
    key_b = mats_b[:nk] if limbs == 2 else (mats_b[0], mats_b[0])
    key_p = mats_p[:nk] if limbs == 2 else (mats_p[0], mats_p[0])

    mc, pc = _counts_all_groups(key_b, key_p, st_b, ct_b, st_p, ct_p,
                                B, SPb, SPp, limbs)

    count = jnp.sum(mc.astype(jnp.uint64))

    def side_sums(cnt_mat, mats, V):
        sums = []
        for v in range(V):
            hi = mats[nk + 2 * v].astype(jnp.uint64)
            lo = mats[nk + 2 * v + 1].astype(jnp.uint64)
            val = (hi << jnp.uint64(32)) | lo
            sums.append(jnp.sum(cnt_mat.astype(jnp.uint64) * val,
                                dtype=jnp.uint64))
        return (jnp.stack(sums) if sums else jnp.zeros((0,), jnp.uint64))

    sums_b = side_sums(mc, mats_b, vb.shape[0])
    sums_p = side_sums(pc, mats_p, vp.shape[0])
    return count, sums_b, sums_p


_radix_checksum_body = partial(jax.jit, static_argnames=(
    "bits", "SPb", "SPp", "limbs"))(_radix_body)


def _merge_on_sorted(kb, vb, n_b, kp, vp, n_p):
    """Fused checksums by sorted-merge over the prep's already-sorted
    rotated arrays — the bits=0 member of the family and the overflow
    branch of `radix_fused_static`'s cond.  Rotation is bijective, so
    searchsorted equal-ranges on rotated keys are exactly the key-equal
    ranges.  Dead rows carry key 2^64-1 *behind* every live row (the
    liveness sort key), so clamping to n_b excludes exactly them.

    Build-side sums go through per-build-row coverage counts (how many
    probe ranges [lo, hi) cover row j), computed as a rank difference of
    the sorted lo/hi arrays — deliberately NOT via u64 prefix sums of
    the value columns: a u64 cumsum lowers to paired-u32 reduce-windows
    whose scoped-VMEM demand blows the 16M limit inside this cond at
    2^20+ rows, and the [Pp]-sized u64 gathers it would feed are the
    slowest primitive on this hardware."""
    nb = n_b.astype(jnp.int32)
    if kb.dtype == jnp.uint64:
        # u64 searchsorted's method="sort" lowering measures ~8x a
        # plain sort — rank via one stable sort each (ops/lsd.py).
        from .lsd import ranks_u64

        lo_r = ranks_u64(kb, kp, side="left")
        hi_r = ranks_u64(kb, kp, side="right")
    else:
        lo_r = jnp.searchsorted(kb, kp, side="left", method="sort")
        hi_r = jnp.searchsorted(kb, kp, side="right", method="sort")
    lo = jnp.minimum(lo_r, nb).astype(jnp.int32)
    hi = jnp.minimum(hi_r, nb).astype(jnp.int32)
    Pp = kp.shape[0]
    live_p = jnp.arange(Pp, dtype=jnp.int32) < n_p
    lo = jnp.where(live_p, lo, 0)
    hi = jnp.where(live_p, hi, 0)          # dead rows: empty range
    cnt = (hi - lo).astype(jnp.uint64)
    count = jnp.sum(cnt)
    # coverage[j] = #(lo <= j) - #(hi <= j); ranges end at <= nb, so
    # dead build rows land at coverage 0 automatically.
    Pb = kb.shape[0]
    j = jnp.arange(Pb, dtype=jnp.int32)
    mc = (jnp.searchsorted(jnp.sort(lo), j, side="right", method="sort")
          - jnp.searchsorted(jnp.sort(hi), j, side="right", method="sort")
          ).astype(jnp.uint64)
    sums_b = jnp.sum(mc[None, :] * vb, axis=1)
    sums_p = jnp.sum(cnt[None, :] * vp, axis=1)
    return count, sums_b, sums_p


@partial(jax.jit, static_argnames=("bits", "SPb", "SPp", "limbs"))
def radix_fused_static(keys_b, vals_b, n_b, keys_p, vals_p, n_p, *,
                       bits: int, SPb: int, SPp: int, limbs: int,
                       prep_b=None, prep_p=None):
    """Sync-free fused radix join: slot widths are STATIC (picked from
    the padded input sizes by `static_radix_plan`), and the data-
    dependent occupancy check runs on device — a bucket that outgrows
    its slots routes the whole join through the sorted-merge branch of
    a `lax.cond` (which reuses the same two prep sorts), never back to
    the host.  This is what lets the radix path inline into whole-query
    compiled programs (engine/compiled.py) with zero extra RTTs.

    `prep_b`/`prep_p`: a side's prep-time artifacts
    (krot_sorted, starts, cnts, max_occ) from `radix_prep_keys` with
    MATCHING bits; that side's vals_* must then be the PRE-SORTED
    [V, P] stack (engine device_radix_val) and its keys_* is ignored
    (XLA DCEs it).  The query-time sort for that side disappears.

    Returns (count, sums_build [V], sums_probe [V]) — exact wrap-around
    uint64, the agg_join contract."""
    n_b = jnp.int32(n_b)
    n_p = jnp.int32(n_p)

    def side(keys, vals, n, pre):
        if pre is None:
            return _prep_side(keys, vals, n, bits, key32=limbs == 1)
        krot_s, st, ct, mo = pre
        if limbs == 1:
            # prep artifacts are stored rot64; query-time key32 sides
            # sort in rot32 — normalize so both sides share the
            # single-limb encoding (order/equality preserving).
            krot_s = _rot64_to_rot32(krot_s)
        return krot_s, vals, st, ct, mo

    kb, vb, st_b, ct_b, mo_b = side(keys_b, vals_b, n_b, prep_b)
    kp, vp, st_p, ct_p, mo_p = side(keys_p, vals_p, n_p, prep_p)
    # The window inside a padded bucket row is [start % ALIGN,
    # start % ALIGN + cnt); worst-case head offset is ALIGN-1.
    overflow = (mo_b > jnp.int32(SPb - ALIGN)) | (mo_p > jnp.int32(SPp - ALIGN))

    def merge(_):
        return _merge_on_sorted(kb, vb, n_b, kp, vp, n_p)

    def radix(_):
        return _radix_body((kb, vb, st_b, ct_b), (kp, vp, st_p, ct_p),
                           bits, SPb, SPp, limbs)

    return jax.lax.cond(overflow, merge, radix, None)


def radix_member_selected(Pb: int, Pp: int, algo: str,
                          has_table: bool = False) -> bool:
    """Host-side mirror of `fused_join_auto`'s member selection: True
    iff the Pallas radix member would run for these padded sizes.  Lets
    prep/engines decide statically whether radix artifacts will be
    consumed.  Since the merge-staircase member became the at-scale
    auto default, only a forced algo="radix" selects it."""
    return algo == "radix"


def ms_member_selected(Pb: int, Pp: int, algo: str) -> bool:
    """Host-side mirror: True iff the merge-staircase member would run
    for these padded sizes (prep decides whether plain-sorted key
    artifacts will be consumed by the fused path).  No upper cap since
    the split-build path (ms_join._counts_auto) serves any size."""
    on_tpu = jax.default_backend() == "tpu"
    return algo == "ms" or (
        algo == "auto" and on_tpu and RADIX_MIN_ROWS <= max(Pb, Pp))


def plan_bits(Pb: int) -> int:
    """The radix width `static_radix_plan` picks for a build side of
    padded size Pb — exposed so prep can build bits-matching artifacts
    (radix_prep_keys) per base column."""
    return max(6, min(14, (max(Pb // 512, 1) - 1).bit_length()))


def static_radix_plan(Pb: int, Pp: int) -> Tuple[int, int, int]:
    """Data-independent sizing for `radix_fused_static`: bits targets
    ~512 expected build rows per bucket, and each side's slot width
    carries a 2x occupancy margin plus the ALIGN window tile.  A miss
    (real occupancy beyond the margin — skewed keys) costs the merge
    fallback branch, never correctness and never a host round-trip."""
    from ..utils.padding import size_class

    bits = plan_bits(Pb)
    B = 1 << bits

    def sp(P: int) -> int:
        expected = -(-P // B)
        return min(size_class(max(2 * expected, ALIGN), ALIGN) + ALIGN,
                   MAX_SLOTS + ALIGN)

    return bits, sp(Pb), sp(Pp)


def fused_join_auto(keys_b, vals_b, n_b, keys_p, vals_p, n_p,
                    algo: str = "auto", key32: bool = False,
                    presorted=None, table=None, table_prefs=None,
                    radix_pre_b=None, radix_vals_b=None,
                    radix_pre_p=None, radix_vals_p=None,
                    presorted_p=None):
    """The engine's fused-final-join entry: size-dispatched member of
    the join family (VERDICT r1 #1).

    - padded size below RADIX_MIN_ROWS, or off-TPU: the sort member
      (ops/agg_join.py — measured faster under ~2^18 rows/side);
    - at scale on TPU: `ms_fused`, the merge-staircase member
      (ops/ms_join.py) — measured fastest at every swept size on the
      target chip (2^23/side key32: ms 303 ms, qd 391, radix 522,
      sort 908, table+pref 417), fully general (no occupancy or
      multiplicity caps), sync-free.

    `algo`: "auto" (default), "sort"/"radix"/"qd"/"ms" (force that
    member — off-TPU forced Pallas members run under interpret mode).  `key32`: both key
    columns' values < 2^32 (catalog stats), enabling the single-limb
    fast path (half the sort/compare work).  `presorted`: the build
    side's prep-time (sorted_keys u64, perm) when it is an unfiltered
    base column — lets the sort member skip its argsort (the radix
    member partitions on a rotated key whose order differs, so it
    ignores the hint).  `table`: the build side's prep-time
    (cumcnt rank table, perm) — a strong member: the whole join is
    gathers + a prefix sum, zero sorts (wins at EVERY size over the
    other members), so it is taken whenever available unless the radix
    member is explicitly forced.  `table_prefs`: prep-time prefix-sum
    tables for every build-side view ([V, Pb+1], engine
    device_prefix_table) — upgrades the table member to PROBE-ONLY
    query-time work (the strongest member: zero build-side
    gathers/cumsums at query time; vals_b is then unused, may be None).
    `radix_pre_*` + `radix_vals_*`: a side's prep-time radix artifacts
    ((krot_sorted, starts, cnts, max_occ) from radix_prep_keys with
    bits == plan_bits(Pb) — the CALLER checks the match) and its
    pre-sorted [V, P] value stack (device_radix_val); consumed only
    when the radix member is selected, so callers pass both
    representations and XLA DCEs the loser's operands.  `presorted_p`:
    the PROBE side's prep-time (sorted_keys u64, perm) — consumed by
    the ms member (which wants both sides sorted), ignored elsewhere.
    """
    from .agg_join import (join_checksum_fused,
                           join_checksum_fused_presorted,
                           join_checksum_fused_table,
                           join_checksum_fused_table_pref)

    if algo == "qd":
        # Equi-depth member (ops/qd_join.py), forced via S18_JOIN=qd:
        # zero-padding build partition + the shared streaming kernel.
        from .qd_join import qd_fused_static, qd_static_plan

        SPb, H, SPp = qd_static_plan(keys_b.shape[0], keys_p.shape[0])
        kw = dict(SPb=SPb, H=H, SPp=SPp, limbs=1 if key32 else 2)
        if jax.default_backend() != "tpu":
            with pltpu.force_tpu_interpret_mode():
                return qd_fused_static(keys_b, vals_b, n_b,
                                       keys_p, vals_p, n_p, **kw)
        return qd_fused_static(keys_b, vals_b, n_b, keys_p, vals_p, n_p,
                               **kw)

    Pmax = max(keys_b.shape[0], keys_p.shape[0])
    on_tpu = jax.default_backend() == "tpu"

    # The staircase member serves EVERY at-scale size: past the
    # broadcast-layout cap the sorted build side splits into <=cap
    # slices, each run through the broadcast kernel (ms_join
    # _counts_auto).  Measured at 2^24/side (2026-08-20): split ms
    # beats the qd member (855 ms) and the rolled natural-layout
    # kernel (8464 ms); see STATUS.md round-5 member table.
    use_ms = algo == "ms" or (
        algo == "auto" and on_tpu and RADIX_MIN_ROWS <= Pmax)
    if use_ms:
        # Merge-staircase member: the at-scale default.  Preferred over
        # the table member too — the rank-table gathers lose to the
        # streaming staircase at scale (417 vs 303 ms at 2^23).
        from .ms_join import ms_fused

        kw = dict(key32=key32, presorted_b=presorted,
                  presorted_p=presorted_p)
        if not on_tpu:
            with pltpu.force_tpu_interpret_mode():
                return ms_fused(keys_b, vals_b, n_b, keys_p, vals_p,
                                n_p, **kw)
        return ms_fused(keys_b, vals_b, n_b, keys_p, vals_p, n_p, **kw)

    if table is not None and algo != "radix":
        cumcnt, perm = table
        if table_prefs is not None:
            return join_checksum_fused_table_pref(
                cumcnt, table_prefs, keys_p, vals_p, jnp.int32(n_p))
        return join_checksum_fused_table(cumcnt, perm, vals_b,
                                         jnp.int32(n_b), keys_p, vals_p,
                                         jnp.int32(n_p))

    use_radix = algo == "radix"
    if not use_radix:
        if presorted is not None:
            sk, perm = presorted
            return join_checksum_fused_presorted(
                sk, perm, vals_b, jnp.int32(n_b),
                keys_p, vals_p, jnp.int32(n_p), key32=key32)
        return join_checksum_fused(keys_b, vals_b, jnp.int32(n_b),
                                   keys_p, vals_p, jnp.int32(n_p),
                                   key32=key32)
    bits, SPb, SPp = static_radix_plan(keys_b.shape[0], keys_p.shape[0])
    vb = vals_b if radix_pre_b is None else radix_vals_b
    vp = vals_p if radix_pre_p is None else radix_vals_p
    kw = dict(bits=bits, SPb=SPb, SPp=SPp, limbs=1 if key32 else 2,
              prep_b=radix_pre_b, prep_p=radix_pre_p)
    if not on_tpu:
        # Forced radix off-TPU (tests): the REAL kernel pipeline under
        # Pallas interpret mode.
        with pltpu.force_tpu_interpret_mode():
            return radix_fused_static(keys_b, vb, n_b, keys_p, vp, n_p,
                                      **kw)
    return radix_fused_static(keys_b, vb, n_b, keys_p, vp, n_p, **kw)


def choose_bits(n_build: int, n_probe: int) -> int:
    """Radix width: target ~1024 build rows per bucket.  The DMA tiling
    granularity (ALIGN) puts one 1024-slot slack tile in every bucket
    row, so occupancy below ~1024 wastes more padded compare work than
    deeper partitioning saves; above ~2048 the VPU all-pairs cost per
    probe row dominates.  Clamped to [6, 14]."""
    target = max(n_build // 1024, 1)
    bits = max(6, min(14, int(np.ceil(np.log2(target))) if target > 1 else 6))
    return bits


def radix_join_checksum(keys_b, vals_b, n_b, keys_p, vals_p, n_p,
                        bits=None, interpret=None, force_pallas=False):
    """Fused radix join + checksums (contract of ops/agg_join.py:
    returns (count, sums_build [V], sums_probe [V]) — exact wrap-around
    uint64).  Syncs ONCE (max bucket occupancy of both sides) to pick
    the static slot widths.

    Off-TPU the same contract is computed by the sort-merge member of
    the family (Mosaic is TPU-only); `force_pallas=True` instead runs
    the REAL kernel pipeline under Pallas interpret mode — slow, used by
    the CPU unit tests to cover the kernel logic itself.

    Raises ValueError when a single bucket exceeds MAX_SLOTS rows
    (pathological key skew: multiplicity beyond the padding economics of
    the dense bucket matrix) — callers fall back to the degenerate
    single-bucket sort-merge path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and not force_pallas:
        from .agg_join import join_checksum_fused

        return join_checksum_fused(keys_b, vals_b, jnp.int32(n_b),
                                   keys_p, vals_p, jnp.int32(n_p))

    from ..utils.padding import size_class

    if bits is None:
        bits = choose_bits(keys_b.shape[0], keys_p.shape[0])

    prep_b, prep_p, max_occ = _prep_two_sides(
        keys_b, vals_b, jnp.int32(n_b), keys_p, vals_p, jnp.int32(n_p),
        bits)
    occ = np.asarray(max_occ)  # the one sync
    Sb = int(occ[0])
    Sp = int(occ[1])
    if max(Sb, Sp) > MAX_SLOTS:
        raise ValueError(
            f"bucket overflow (build {Sb}, probe {Sp} rows/bucket at "
            f"bits={bits}): key multiplicity beyond dense-bucket "
            f"economics; use the sort path")
    # Window slack: a bucket's slots sit at [start % ALIGN,
    # start % ALIGN + cnt) inside the padded row; DMA segment sizes must
    # be ALIGN multiples, so each row carries one tile of slack.
    SPb = size_class(max(Sb, 1), ALIGN) + ALIGN
    SPp = size_class(max(Sp, 1), ALIGN) + ALIGN
    limbs = 2  # u64 keys; single-limb fast path picked by the caller
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return _radix_checksum_body(prep_b[:4], prep_p[:4], bits,
                                        SPb, SPp, limbs)
    return _radix_checksum_body(prep_b[:4], prep_p[:4], bits, SPb, SPp,
                                limbs)
