"""Merge-staircase join: banded compare over two SORTED sides.

The TPU restatement of the reference's per-bucket probe
(rhjoin.c:141-217) that finally removes the padded all-pairs work the
radix (ops/radix_join.py) and equi-depth (ops/qd_join.py) members pay:

  * Both sides are sorted by key (the partition IS the sort — as in the
    other members), then viewed as CHUNKS: build rows [j*H, (j+1)*H),
    probe rows [i*W, (i+1)*W).  Zero padding on BOTH sides — chunking
    is a reshape of the sorted array.
  * Matches for probe chunk i live only in build chunks
    [f_i, g_i]: f_i = last chunk whose first key <= kp[i*W] and
    g_i = last chunk whose first key <= kp[(i+1)*W - 1] (keys sorted, so
    a match's chunk start key <= the probe key <= some chunk's range).
    Since f and g are non-decreasing in i, the (probe chunk, build
    chunk) pairs form a monotone STAIRCASE of length
    T = sum(g_i - f_i + 1) ~ Pb/H + Pp/W + (output pairs)/(W*H).
  * The kernel walks the staircase: step t compares probe chunk pi[t]
    [1, W] against build chunk bi[t] [H, 1] — one [H, W] equality tile,
    accumulated into per-probe-row match counts and first-match
    positions.  pi[t] is non-decreasing, so output blocks are visited
    in one contiguous run each (the Pallas revisiting pattern); bi[t]
    may jump back across steps, which only re-fetches an input block.
  * Per-element compare work is EXACTLY W + H (band width), not the
    radix member's padded slot width (~2048 incl. 2x occupancy margin +
    DMA ALIGN slack) — ~8x less VPU work at the measured sizes, with no
    occupancy/multiplicity cap: a hot key simply contributes more
    staircase steps (work stays proportional to its true output).

Dynamic step count vs static shapes: the staircase arrays are computed
on device and padded to a static T_cap; a T beyond T_cap (extreme
blowup joins whose output exceeds ~T_cap*W*H pairs) routes through a
searchsorted fallback branch of a `lax.cond` — on device, sync-free,
like the other members' overflow branches.

The fused contract matches ops/agg_join.py: (count, sums_build [V],
sums_probe [V]), exact wrap-around uint64.  Values never enter the
kernel: per-row counts are unsorted back to the original row order
(one u32 sort by the perm — gathers are the slowest primitive on this
hardware, a sort is not) and the weighted sums run in XLA against the
ORIGINAL value columns.
"""

from __future__ import annotations

import os as _os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MAX_U32 = np.uint32(0xFFFFFFFF)
_BIG = 0x7FFFFFFF  # plain int: a jnp scalar would be captured as a
                   # pallas kernel constant, which Mosaic rejects
_PACK = 1 << 15    # (pi, bi) pack into one i32: pi * _PACK + bi
_PACK_R = 1 << 17  # rolled-kernel pack: bi needs 2^17 (Pb up to 2^27)
# Layout switch between the two staircase kernels.  At or below this
# build-side padded size, the broadcast kernel runs: the build rides as
# a [Pb, 1, 1] array so (H, 1, 1) blocks are legal, which XLA lays out
# T(1, 128) — a 128x padded copy (4 GB at 2^23 rows, the fastest form
# while the copy is affordable).  PAST it the rolled-lane kernel
# (_stair_kernel_rolled) serves: every array stays in its natural
# layout (zero copies), all-pairs compares run as HS*HL lane/sublane
# rotations — no size cap remains (VERDICT r3 #5).
MS_BCAST_MAX_ROWS = 1 << 23
STEP_BUDGET = 1 << 17  # max staircase steps: 512 KB of prefetched SMEM
                       # (the total SMEM budget is ~1 MB per program)


# ---------------------------------------------------------------------------
# Staircase construction (XLA, on device, static shapes)
# ---------------------------------------------------------------------------


def _searchsorted(hay, q, side):
    """Dispatch: u64 keys rank via the 2-key sort trick only when big;
    these arrays are O(P/W + P/H) small, so method="sort" is fine."""
    return jnp.searchsorted(hay, q, side=side, method="sort")


def _staircase(kb, kp, H: int, W: int, T_cap: int, pack: int = _PACK):
    """Step arrays (pi, bi, T) for the monotone staircase.

    pi is non-decreasing and clamped to its final value for t >= T, so
    padding steps stay on the last output block (no extra DMA) and are
    masked out inside the kernel via t < T."""
    Pb, Pp = kb.shape[0], kp.shape[0]
    Bb, Bp = Pb // H, Pp // W
    qb = kb[::H]                       # [Bb] first key of each build chunk
    k0 = kp[::W]                       # [Bp] first key of each probe chunk
    k1 = kp[W - 1::W]                  # [Bp] last key of each probe chunk
    # Lower bound must be the last chunk whose start is STRICTLY below
    # k0 ("left" - 1): a k0-run can begin mid-chunk while LATER chunks
    # also start at k0 — "right" - 1 would skip the run's head chunk.
    f = jnp.clip(_searchsorted(qb, k0, "left").astype(jnp.int32) - 1,
                 0, Bb - 1)
    g = jnp.clip(_searchsorted(qb, k1, "right").astype(jnp.int32) - 1,
                 0, Bb - 1)
    g = jnp.maximum(g, f)
    spans = g - f + 1                  # [Bp] >= 1
    offs = jnp.cumsum(spans)           # inclusive
    T = offs[-1]
    t = jnp.arange(T_cap, dtype=jnp.int32)
    pi = _searchsorted(offs, t, "right").astype(jnp.int32)
    pi = jnp.minimum(pi, Bp - 1)
    start = offs[pi] - spans[pi]
    bi = jnp.clip(f[pi] + (t - start), 0, Bb - 1)
    # Steps ride prefetched SMEM, whose total budget is ~1 MB: pack
    # (pi, bi) into one i32 (both < 2^15 by stair_plan's chunk sizing).
    return pi * jnp.int32(pack) + bi, T


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _stair_kernel(st_ref, sc_ref, *refs, W1: int, W2: int,
                  H: int, limbs: int):
    """One staircase step: eq-tile [H, W1, W2] -> accumulate per-probe-
    row counts and first-match build positions into the (1, W1, W2)
    output blocks (revisited across this probe chunk's contiguous step
    run).

    The probe chunk rides as a (1, W1, W2) block (W = W1*W2 rows; the
    trailing block dims equal the array's, satisfying Mosaic's (8, 128)
    block-shape rule) and the build chunk as (H, 1, 1); the [H, W1, W2]
    equality tile is a pure broadcast of the two."""
    if limbs == 2:
        kp_ref, kph_ref, kb_ref, kbh_ref, cnt_ref, lo_ref = refs
    else:
        kp_ref, kb_ref, cnt_ref, lo_ref = refs
    t = pl.program_id(0)
    T = sc_ref[0]
    n_b = sc_ref[1]
    n_p = sc_ref[2]
    pi_t = st_ref[t] // jnp.int32(_PACK)
    bi_t = st_ref[t] % jnp.int32(_PACK)
    tm1 = jnp.maximum(t - 1, 0)
    first = jnp.logical_or(t == 0, st_ref[tm1] // jnp.int32(_PACK) != pi_t)

    p = kp_ref[:]                      # [1, W1, W2]
    b = kb_ref[:]                      # [H, 1, 1]
    eq = b == p                        # [H, W1, W2]
    if limbs == 2:
        eq = jnp.logical_and(eq, kbh_ref[:] == kph_ref[:])
    h_glob = (jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
              + bi_t * jnp.int32(H))
    w_glob = (jax.lax.broadcasted_iota(jnp.int32, (1, W1, W2), 1)
              * jnp.int32(W2)
              + jax.lax.broadcasted_iota(jnp.int32, (1, W1, W2), 2)
              + pi_t * jnp.int32(W1 * W2))
    live = ((h_glob < n_b) & (w_glob < n_p)) & (t < T)
    eq = jnp.logical_and(eq, live)
    # dtype pinned: under jax_enable_x64 an i32 sum promotes to i64,
    # which Mosaic has no registers for
    c = jnp.sum(eq.astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32)
    lo = jnp.min(jnp.where(eq, jnp.broadcast_to(h_glob, (H, W1, W2)),
                           jnp.int32(_BIG)), axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        cnt_ref[:] = c
        lo_ref[:] = lo

    @pl.when(jnp.logical_not(first))
    def _acc():
        cnt_ref[:] = cnt_ref[:] + c
        lo_ref[:] = jnp.minimum(lo_ref[:], lo)


def _w_split(W: int):
    """W = W1 * W2 with W2 <= 128: the trailing block dims (W1, W2)
    equal the array dims, which Mosaic accepts for any W1."""
    W2 = min(W, 128)
    return W // W2, W2


@partial(jax.jit, static_argnames=("W", "H", "T_cap", "limbs"))
def _stair_counts_kernel(kb_lo, kb_hi, kp_lo, kp_hi, steps, scal, *,
                         W: int, H: int, T_cap: int, limbs: int):
    Pb, Pp = kb_lo.shape[0], kp_lo.shape[0]
    Bp = Pp // W
    W1, W2 = _w_split(W)
    # Index-map arithmetic is built ONLY from the traced i32 step value:
    # literal 0s trace as i64 under jax_enable_x64 (Mosaic can't
    # legalize mixed-width block indices), jnp constants would be
    # captured (rejected), and jnp's // int promotion recurses in the
    # index-map tracing context — lax bit ops on traced operands avoid
    # all three.
    def pmap(t, st_r, sc_r):
        v = st_r[t]
        z = v * 0
        return jax.lax.shift_right_logical(v, z + 15), z, z

    def bmap(t, st_r, sc_r):
        v = st_r[t]
        z = v * 0
        return jax.lax.bitwise_and(v, z + (_PACK - 1)), z, z
    pspec = pl.BlockSpec((1, W1, W2), pmap, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((H, 1, 1), bmap, memory_space=pltpu.VMEM)
    in_specs = [pspec]
    args = [kp_lo.reshape(Bp, W1, W2)]
    if limbs == 2:
        in_specs.append(pspec)
        args.append(kp_hi.reshape(Bp, W1, W2))
    in_specs.append(bspec)
    args.append(kb_lo.reshape(Pb, 1, 1))
    if limbs == 2:
        in_specs.append(bspec)
        args.append(kb_hi.reshape(Pb, 1, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_cap,),
        in_specs=in_specs,
        out_specs=(pspec, pspec),
    )
    cnt, lo = pl.pallas_call(
        partial(_stair_kernel, W1=W1, W2=W2, H=H, limbs=limbs),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((Bp, W1, W2), jnp.int32),
                   jax.ShapeDtypeStruct((Bp, W1, W2), jnp.int32)),
    )(steps, scal, *args)
    return cnt.reshape(Pp), lo.reshape(Pp)


def _stair_kernel_rolled(st_ref, sc_ref, *refs, W1: int, W2: int,
                         HS: int, HL: int, limbs: int):
    """Rolled-lane staircase step: both sides stay in NATURAL layout.

    The build chunk rides as a (1, HS, HL) block of [Bb, HS, HL] (the
    flat sorted array reshaped — zero padding, zero copies, unlike the
    broadcast kernel's [Pb, 1, 1] input whose T(1, 128) relayout is a
    128x padded copy) and the probe chunk as (1, W1, W2).  The [H x W]
    all-pairs compare runs as HS*HL sublane/lane rotations: rotation
    (rs, rl) aligns probe element (s, l) with build element
    ((s - rs) % HS, (l - rl) % HL), so the HS*HL rotations cover every
    (probe, build) pair of the tile exactly once.  An index tile rides
    the same rotations, so first-match positions cost two extra rolls,
    no mod arithmetic.  W1 must be a multiple of HS (the build tile is
    sublane-tiled W1/HS times; period-HS rotation commutes with the
    tiling) and W2 == HL.

    This kernel removes the broadcast kernel's build-size cap: memory
    is exactly the input bytes, so 2^24-2^27-row sides serve directly
    (VERDICT r3 #5)."""
    if limbs == 2:
        kp_ref, kph_ref, kb_ref, kbh_ref, cnt_ref, lo_ref = refs
    else:
        kp_ref, kb_ref, cnt_ref, lo_ref = refs
    t = pl.program_id(0)
    T = sc_ref[0]
    n_b = sc_ref[1]
    n_p = sc_ref[2]
    pi_t = st_ref[t] // jnp.int32(_PACK_R)
    bi_t = st_ref[t] % jnp.int32(_PACK_R)
    tm1 = jnp.maximum(t - 1, 0)
    first = jnp.logical_or(t == 0,
                           st_ref[tm1] // jnp.int32(_PACK_R) != pi_t)

    W = W1 * W2
    H = HS * HL
    k = W1 // HS
    p = kp_ref[0]                       # [W1, W2]
    b0 = kb_ref[0]                      # [HS, HL]
    if k > 1:                           # period-HS sublane tiling
        b0 = jnp.concatenate([b0] * k, axis=0)
    if limbs == 2:
        ph = kph_ref[0]
        bh0 = kbh_ref[0]
        if k > 1:
            bh0 = jnp.concatenate([bh0] * k, axis=0)
    siota = jax.lax.broadcasted_iota(jnp.int32, (W1, W2), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (W1, W2), 1)
    w_glob = pi_t * jnp.int32(W) + siota * jnp.int32(W2) + liota
    live_pt = jnp.logical_and(w_glob < n_p, t < T)
    # unrotated build-flat-index tile: element (s, l) = (s % HS)*HL + l
    hidx0 = jnp.mod(siota, jnp.int32(HS)) * jnp.int32(HL) + liota

    def inner(rl, carry):
        if limbs == 2:
            cnt, lo, br, bhr, idxr = carry
            eq = jnp.logical_and(p == br, ph == bhr)
        else:
            cnt, lo, br, idxr = carry
            eq = p == br
        h_glob = bi_t * jnp.int32(H) + idxr
        eq = jnp.logical_and(eq, jnp.logical_and(live_pt, h_glob < n_b))
        cnt = cnt + eq.astype(jnp.int32)
        lo = jnp.minimum(lo, jnp.where(eq, h_glob, jnp.int32(_BIG)))
        # tpu.dynamic_rotate requires an i32 shift (the x64 default
        # would trace Python ints / fori indices as i64)
        one = jnp.int32(1)
        br = pltpu.roll(br, one, axis=1)
        idxr = pltpu.roll(idxr, one, axis=1)
        if limbs == 2:
            bhr = pltpu.roll(bhr, one, axis=1)
            return cnt, lo, br, bhr, idxr
        return cnt, lo, br, idxr

    # Outer sublane rotations unroll in Python (HS <= 8 static
    # iterations): static-shift rolls only, and one fewer fori nesting
    # level (a doubly-nested fori inside the pallas trace was observed
    # to exhaust the Python recursion limit at trace time).
    cnt = jnp.zeros((W1, W2), jnp.int32)
    lo = jnp.full((W1, W2), _BIG, jnp.int32)
    for rs in range(HS):
        s32 = jnp.int32(rs)
        br = pltpu.roll(b0, s32, axis=0)
        idxr = pltpu.roll(hidx0, s32, axis=0)
        if limbs == 2:
            bhr = pltpu.roll(bh0, s32, axis=0)
            cnt, lo, *_ = jax.lax.fori_loop(
                0, HL, inner, (cnt, lo, br, bhr, idxr))
        else:
            cnt, lo, *_ = jax.lax.fori_loop(
                0, HL, inner, (cnt, lo, br, idxr))

    @pl.when(first)
    def _init():
        cnt_ref[:] = cnt[None]
        lo_ref[:] = lo[None]

    @pl.when(jnp.logical_not(first))
    def _acc():
        cnt_ref[:] = cnt_ref[:] + cnt[None]
        lo_ref[:] = jnp.minimum(lo_ref[:], lo[None])


def _stair_kernel_nat(st_ref, sc_ref, *refs, W1: int, W2: int,
                      HS: int, HL: int, limbs: int):
    """Natural-layout staircase step via in-kernel relayout: the build
    chunk arrives as a (1, HS, HL) block of [Bb, HS, HL] (zero HBM
    copies) and is reshaped in-register to (H, 1, 1); the compare is
    then the broadcast kernel's single [H, W1, W2] equality tile.  One
    relayout per staircase step, amortized over H*W compares —
    replaces the rolled variant's HS*HL-iteration rotation loop, which
    measured 10x slower than qd at 2^24 (loop-overhead-bound)."""
    if limbs == 2:
        kp_ref, kph_ref, kb_ref, kbh_ref, cnt_ref, lo_ref = refs
    else:
        kp_ref, kb_ref, cnt_ref, lo_ref = refs
    t = pl.program_id(0)
    T = sc_ref[0]
    n_b = sc_ref[1]
    n_p = sc_ref[2]
    pi_t = st_ref[t] // jnp.int32(_PACK_R)
    bi_t = st_ref[t] % jnp.int32(_PACK_R)
    tm1 = jnp.maximum(t - 1, 0)
    first = jnp.logical_or(t == 0,
                           st_ref[tm1] // jnp.int32(_PACK_R) != pi_t)

    H = HS * HL
    p = kp_ref[:]                          # (1, W1, W2)
    b = jnp.reshape(kb_ref[:], (H, 1, 1))  # in-register relayout
    eq = b == p                            # [H, W1, W2]
    if limbs == 2:
        bh = jnp.reshape(kbh_ref[:], (H, 1, 1))
        eq = jnp.logical_and(eq, bh == kph_ref[:])
    h_glob = (jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
              + bi_t * jnp.int32(H))
    w_glob = (jax.lax.broadcasted_iota(jnp.int32, (1, W1, W2), 1)
              * jnp.int32(W2)
              + jax.lax.broadcasted_iota(jnp.int32, (1, W1, W2), 2)
              + pi_t * jnp.int32(W1 * W2))
    live = ((h_glob < n_b) & (w_glob < n_p)) & (t < T)
    eq = jnp.logical_and(eq, live)
    c = jnp.sum(eq.astype(jnp.int32), axis=0, keepdims=True,
                dtype=jnp.int32)
    lo = jnp.min(jnp.where(eq, jnp.broadcast_to(h_glob, (H, W1, W2)),
                           jnp.int32(_BIG)), axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        cnt_ref[:] = c
        lo_ref[:] = lo

    @pl.when(jnp.logical_not(first))
    def _acc():
        cnt_ref[:] = cnt_ref[:] + c
        lo_ref[:] = jnp.minimum(lo_ref[:], lo)


@partial(jax.jit, static_argnames=("W", "H", "T_cap", "limbs"))
def _stair_counts_kernel_rolled(kb_lo, kb_hi, kp_lo, kp_hi, steps, scal,
                                *, W: int, H: int, T_cap: int,
                                limbs: int):
    HS, HL = H // 128, 128
    Pb, Pp = kb_lo.shape[0], kp_lo.shape[0]
    Bb, Bp = Pb // H, Pp // W
    W2 = 128
    W1 = W // W2

    def pmap(t, st_r, sc_r):
        v = st_r[t]
        z = v * 0
        return jax.lax.shift_right_logical(v, z + 17), z, z

    def bmap(t, st_r, sc_r):
        v = st_r[t]
        z = v * 0
        return jax.lax.bitwise_and(v, z + (_PACK_R - 1)), z, z

    pspec = pl.BlockSpec((1, W1, W2), pmap, memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, HS, HL), bmap, memory_space=pltpu.VMEM)
    in_specs = [pspec]
    args = [kp_lo.reshape(Bp, W1, W2)]
    if limbs == 2:
        in_specs.append(pspec)
        args.append(kp_hi.reshape(Bp, W1, W2))
    in_specs.append(bspec)
    args.append(kb_lo.reshape(Bb, HS, HL))
    if limbs == 2:
        in_specs.append(bspec)
        args.append(kb_hi.reshape(Bb, HS, HL))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_cap,),
        in_specs=in_specs,
        out_specs=(pspec, pspec),
    )
    # The reshape variant (_stair_kernel_nat) is the faster design but
    # this Mosaic rejects its in-kernel (1, HS, HL) -> (H, 1, 1)
    # reshape ("tpu.reshape" internal error on hardware, 2026-08-20);
    # keep it selectable for future toolchains, default to the
    # rotation kernel which is verified correct on the chip.
    body_kernel = (_stair_kernel_nat
                   if _os.environ.get("S18_MS_NATKERN") == "1"
                   else _stair_kernel_rolled)
    cnt, lo = pl.pallas_call(
        partial(body_kernel, W1=W1, W2=W2, HS=HS, HL=HL,
                limbs=limbs),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((Bp, W1, W2), jnp.int32),
                   jax.ShapeDtypeStruct((Bp, W1, W2), jnp.int32)),
    )(steps, scal, *args)
    return cnt.reshape(Pp), lo.reshape(Pp)


def _ranges_by_search(kb, n_b, kp, n_p):
    """Fallback (and oracle): exact (cnt, lo) via two rank queries —
    the ops/sort_join.py searchsorted contract on sorted arrays.  u64
    keys rank via ops/lsd.py (searchsorted's u64 method="sort" lowering
    measures ~8x a plain sort)."""
    Pp = kp.shape[0]
    maxv = jnp.array(jnp.iinfo(kb.dtype).max, kb.dtype)
    if kb.dtype == jnp.uint64:
        from .lsd import ranks_u64

        both = ranks_u64(kb, jnp.concatenate([kp, kp + 1]), side="left")
    else:
        both = jnp.searchsorted(kb, jnp.concatenate([kp, kp + 1]),
                                side="left", method="sort")
    lo = jnp.minimum(both[:Pp], n_b).astype(jnp.int32)
    hi = jnp.where(kp == maxv, n_b,
                   jnp.minimum(both[Pp:], n_b)).astype(jnp.int32)
    live = jnp.arange(Pp, dtype=jnp.int32) < n_p
    cnt = jnp.where(live, hi - lo, 0)
    return cnt, lo


def stair_plan(Pb: int, Pp: int, W: int = 1024, H: int = 512,
               slack: float = 1.0) -> Tuple[int, int, int]:
    """Static sizing: chunk widths (clamped to the padded sizes) and the
    step cap.  T_cap = (1 + slack) * (Bb + Bp) tolerates an output of
    ~slack*(Bb+Bp)*W*H extra pairs before the cond falls back to the
    searchsorted branch.

    Defaults measured at 2^23 rows/side on the target chip: W=1024
    makes the probe block exactly one native (8, 128) tile (67.7 ms vs
    125.9 ms at W=512 — sub-tile blocks relayout), H=512 keeps the
    compare volume Pb*W + Pp*H near its minimum.

    Two hardware bounds shape the plan: the packed step array is a
    prefetched SMEM operand (total SMEM ~1 MB), so T_cap is held under
    STEP_BUDGET by doubling chunk widths on large inputs; and packing
    needs Bb, Bp < _PACK (2^15), which the same doubling guarantees."""
    W = min(W, Pp)
    H = min(H, Pb)
    while Pp % W:
        W //= 2
    while Pb % H:
        H //= 2
    W, H = max(W, 1), max(H, 1)
    while Pp // W >= _PACK or (slack >= 0.5 and int(
            (Pb // H + Pp // W) * (1.0 + slack)) + 8 > STEP_BUDGET):
        if Pp // W >= Pb // H:
            W *= 2
        else:
            H *= 2
    while Pb // H >= _PACK:
        H *= 2
    Bb, Bp = Pb // H, Pp // W
    T_cap = min(int((Bb + Bp) * (1.0 + slack)) + 8, STEP_BUDGET)
    return W, H, T_cap


def stair_plan_rolled(Pb: int, Pp: int, W: int = 1024, H: int = 1024,
                      slack: float = 1.0) -> Tuple[int, int, int]:
    """Static sizing for the rolled-lane kernel (build > 2^23 rows).

    H is a full (8, 128) build tile (HS*HL rotations cover it exactly;
    H must be a multiple of 128 with HS = H/128 dividing W1 = W/128).
    Pb must divide by H (padded power-of-two sizes past 2^23 always
    do) and stay under 2^27 so bi fits the _PACK_R step packing —
    HARD_INTERMEDIATE_CAP (engine/executor.py) already bounds any
    materialized side at 2^27."""
    assert Pb % H == 0 and Pb // H < _PACK_R, (Pb, H)
    W = max(min(W, Pp), H)
    while Pp % W:
        W //= 2
    assert W % H == 0, (W, H, Pp)
    Bb = Pb // H
    while Pp // W >= (1 << 31) // _PACK_R or int(
            (Bb + Pp // W) * (1.0 + slack)) + 8 > STEP_BUDGET:
        if W >= Pp or Pp % (2 * W):
            # W can no longer grow: one-chunk probe, or the next
            # doubling would break the Pp % W == 0 reshape invariant
            # (probe sizes like 3*2^22).  A Bb past the step budget
            # alone is legal — T_cap clamps to STEP_BUDGET below and
            # the runtime cap ladder's searchsorted fallback serves
            # any staircase longer than that.  (This condition is
            # W-independent once Bb*(1+slack)+8 > STEP_BUDGET, so
            # without the break the loop never exited — ADVICE r4.)
            break
        W *= 2
    if Pp // W >= (1 << 31) // _PACK_R:
        raise ValueError(
            f"rolled staircase cannot pack probe chunks: Pb={Pb} Pp={Pp}")
    T_cap = min(int((Bb + Pp // W) * (1.0 + slack)) + 8, STEP_BUDGET)
    return W, H, T_cap


@partial(jax.jit,
         static_argnames=("W", "H", "T_cap", "interpret", "rolled"))
def staircase_counts(kb, n_b, kp, n_p, *, W: int, H: int, T_cap: int,
                     interpret: bool = False, rolled: bool = False):
    """Per-probe-row match (cnt, lo) against the sorted build side.

    kb [Pb], kp [Pp]: SORTED key arrays (u32 or u64 — same dtype), pads
    at dtype-max behind the live prefixes n_b / n_p; liveness is decided
    by POSITION inside the kernel, so live dtype-max keys are exact (no
    sentinel fallback).  Returns cnt [Pp] i32 and lo [Pp] i32 (first
    match position in the sorted build array; undefined where cnt==0),
    both in SORTED-probe coordinates.  Sync-free: a staircase longer
    than T_cap falls back to the searchsorted branch via lax.cond.

    `rolled`: run the natural-layout rotation kernel (plan via
    stair_plan_rolled) — required past MS_BCAST_MAX_ROWS build rows,
    where the broadcast kernel's [Pb, 1, 1] relayout copy stops
    fitting HBM."""
    n_b = jnp.int32(n_b)
    n_p = jnp.int32(n_p)
    # Two-tier step budget: the plan's T_cap covers the uniform case
    # (T ~ Bb + Bp + output/(W*H)), but REAL key distributions run
    # wider bands (workloads/big: T = 23910 vs the tight cap's 12296 —
    # every fused join was silently taking the ~200 ms searchsorted
    # fallback instead of the ~30 ms kernel).  A second kernel instance
    # at 4x the cap catches those; only a genuine blowup reaches the
    # fallback.  Padding steps are masked but still iterate, so the
    # tight instance keeps the common case cheap.
    T_wide = min(max(4 * T_cap, T_cap), STEP_BUDGET)
    steps, T = _staircase(kb, kp, H, W, T_wide,
                          pack=_PACK_R if rolled else _PACK)
    scal = jnp.stack([T, n_b, n_p])

    if kb.dtype == jnp.uint64:
        kb_lo = kb.astype(jnp.uint32)
        kb_hi = (kb >> jnp.uint64(32)).astype(jnp.uint32)
        kp_lo = kp.astype(jnp.uint32)
        kp_hi = (kp >> jnp.uint64(32)).astype(jnp.uint32)
        limbs = 2
    else:
        kb_lo, kb_hi = kb, kb
        kp_lo, kp_hi = kp, kp
        limbs = 1

    body = _stair_counts_kernel_rolled if rolled else _stair_counts_kernel

    def run_kernel(cap):
        st = steps[:cap]

        def k(_):
            if interpret:
                with pltpu.force_tpu_interpret_mode():
                    return body(kb_lo, kb_hi, kp_lo, kp_hi,
                                st, scal, W=W, H=H,
                                T_cap=cap, limbs=limbs)
            return body(kb_lo, kb_hi, kp_lo, kp_hi, st,
                        scal, W=W, H=H, T_cap=cap,
                        limbs=limbs)

        return k

    def fallback(_):
        return _ranges_by_search(kb, n_b, kp, n_p)

    # geometric cap ladder: the kernel iterates every padded step, so
    # pick the smallest instance that covers the observed T
    caps = []
    for c in (T_cap, 2 * T_cap, 4 * T_cap):
        c = min(c, STEP_BUDGET)
        if c not in caps:
            caps.append(c)

    def ladder(i):
        if i == len(caps):
            return fallback
        return lambda _: jax.lax.cond(T > jnp.int32(caps[i]),
                                      ladder(i + 1), run_kernel(caps[i]),
                                      None)

    return ladder(0)(None)


# ---------------------------------------------------------------------------
# Fused checksum member (the agg_join contract)
# ---------------------------------------------------------------------------


def _sort_keys(keys, n, key32: bool):
    """(sorted_keys, perm): stable single-key sort — u32 single-limb
    when key32 (catalog stats), else the native u64 comparator.  Pads
    (position >= n) forced to dtype-max; stability keeps live dtype-max
    keys ahead of them (the ops/sort_join.py contract)."""
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n
    iota = jnp.arange(P, dtype=jnp.int32)
    if key32:
        k = jnp.where(live, keys.astype(jnp.uint32), _MAX_U32)
    else:
        k = jnp.where(live, keys, _MAX_U64)
    return jax.lax.sort((k, iota), num_keys=1, is_stable=True)


def _unsort(perm, x):
    """x (sorted coords) -> original coords: one u32-keyed sort (a
    permutation is unique, so stability is irrelevant).  Replaces the
    O(P) scatter/gather this hardware is worst at."""
    _, out = jax.lax.sort((perm, x), num_keys=1, is_stable=False)
    return out


@partial(jax.jit, static_argnames=("key32", "W", "H", "interpret"))
def join_probe_count_ms(sorted_keys, n_build, probe_keys, n_probe, *,
                        key32: bool = False, W: int = 1024, H: int = 512,
                        interpret: bool = False):
    """The ops/sort_join.py::join_probe_count contract on the
    merge-staircase kernel: (lo, cnt, ccum, total) with lo/cnt per RAW
    probe row and lo in sorted-build coordinates, so ops.join_emit
    consumes the result unchanged — the EMITTING at-scale member
    (intermediate joins; the reference serves every join with its radix
    kernel, query.c:429-457 / rhjoin.c:13).

    `sorted_keys`: the build side prep-sorted by join_build (u32 when
    its key32 path produced it, else u64; a u64 array is downcast here
    when `key32` — catalog stats bound every value under 2^32, and the
    stable sort order is preserved by the downcast).  `probe_keys`: raw
    (unsorted, padded) u64.  One probe-side sort + the staircase kernel
    + two u32 unsorts, replacing join_probe_count's two rank sorts of
    Pb + 2*Pp elements."""
    n_build = jnp.int32(n_build)
    n_probe = jnp.int32(n_probe)
    kb = (sorted_keys.astype(jnp.uint32)
          if key32 and sorted_keys.dtype == jnp.uint64 else sorted_keys)
    kp_s, perm_p = _sort_keys(probe_keys, n_probe, key32)
    cnt_s, lo_s = _counts_auto(kb, n_build, kp_s, n_probe, W, H,
                               interpret)
    cnt = _unsort(perm_p, cnt_s)
    lo = _unsort(perm_p, lo_s)
    from .sort_join import _ccum_total

    return (lo, cnt, *_ccum_total(cnt))


def _counts_auto(kb_s, n_b, kp_s, n_p, W: int, H: int, interpret: bool):
    """staircase_counts with the build layout picked by size.

    At or below MS_BCAST_MAX_ROWS build rows the broadcast kernel runs
    directly (fastest while its 128x build copy fits HBM).  PAST the
    cap, the SORTED build side splits into static <=cap slices — a
    sorted array's range partition is just a slice — and the broadcast
    kernel runs once per slice against the full probe side:

      cnt = sum of per-slice counts (a probe row's matches in the full
            build = the disjoint union of its matches per slice);
      lo  = slice offset + local lo of the FIRST slice with a match
            (global first-match position in the sorted build array —
            matches are contiguous there, so later slices' matches
            continue the run).

    Each slice's live prefix is clip(n_b - offset, 0, len): the global
    array keeps pads behind the live prefix, so every slice does too.
    2 slices at 2^24 build rows cost ~2x one 2^23 kernel — measured
    far below both the natural-layout rolled kernel (8.5 s at 2^24,
    loop-overhead bound; still forceable via staircase_counts
    rolled=True) and the qd member (855 ms)."""
    if kb_s.shape[0] <= MS_BCAST_MAX_ROWS:
        Wp, Hp, Tp = stair_plan(kb_s.shape[0], kp_s.shape[0], W, H)
        return staircase_counts(kb_s, n_b, kp_s, n_p, W=Wp, H=Hp,
                                T_cap=Tp, interpret=interpret)
    S = MS_BCAST_MAX_ROWS
    cnt = None
    lo = None
    seen = None
    for off in range(0, kb_s.shape[0], S):
        kb_i = kb_s[off:off + S]
        nb_i = jnp.clip(n_b - jnp.int32(off), 0, kb_i.shape[0])
        Wp, Hp, Tp = stair_plan(kb_i.shape[0], kp_s.shape[0], W, H)
        cnt_i, lo_i = staircase_counts(kb_i, nb_i, kp_s, n_p, W=Wp,
                                       H=Hp, T_cap=Tp,
                                       interpret=interpret)
        hit = cnt_i > 0
        if cnt is None:
            cnt = cnt_i
            lo = jnp.where(hit, lo_i + jnp.int32(off), 0)
            seen = hit
        else:
            cnt = cnt + cnt_i
            lo = jnp.where(hit & ~seen, lo_i + jnp.int32(off), lo)
            seen = seen | hit
    return cnt, lo


# Emitting-path crossover: intermediate joins whose padded sizes reach
# this take the staircase counting member instead of searchsorted ranks
# (tools/bench_probe.py measures the crossover on the target chip;
# S18_EMIT_MS_MIN overrides).
EMIT_MS_MIN_ROWS = int(_os.environ.get("S18_EMIT_MS_MIN", str(1 << 18)))


def join_probe_count_auto(sorted_keys, n_build, probe_keys, n_probe, *,
                          key32: bool = False):
    """Size-dispatched emitting-count member (the join_probe_count
    contract): the merge-staircase kernel at scale on TPU — the same
    kernel family that serves fused final joins now serves INTERMEDIATE
    joins (reference: one kernel serves every join, rhjoin.c:13) — and
    searchsorted ranks below the crossover / off-TPU.  Off-TPU at-scale
    calls run the real kernel under Pallas interpret mode (CI)."""
    on_tpu = jax.default_backend() == "tpu"
    # No build-side upper cap: past the broadcast layout's limit the
    # split-build path (_counts_auto) serves — each <=2^23 slice runs
    # the fast broadcast kernel (the rolled rotation kernel measured
    # 8.5 s at 2^24 and is no longer on the auto path).
    big = (max(sorted_keys.shape[0], probe_keys.shape[0])
           >= EMIT_MS_MIN_ROWS)
    forced = _os.environ.get("S18_EMIT_MS_FORCE") == "1"
    if big and (on_tpu or forced):
        if on_tpu:
            return join_probe_count_ms(sorted_keys, n_build, probe_keys,
                                       n_probe, key32=key32)
        with pltpu.force_tpu_interpret_mode():
            return join_probe_count_ms(sorted_keys, n_build, probe_keys,
                                       n_probe, key32=key32,
                                       interpret=True)
    from .sort_join import join_probe_count

    return join_probe_count(sorted_keys, n_build, probe_keys, n_probe)


@partial(jax.jit, static_argnames=("key32", "W", "H", "interpret"))
def ms_fused(keys_b, vals_b, n_b, keys_p, vals_p, n_p, *,
             key32: bool = False, W: int = 1024, H: int = 512,
             interpret: bool = False, presorted_b=None, presorted_p=None):
    """Fused merge-staircase join + checksums: (count, sums_build [V],
    sums_probe [V]), exact wrap-around uint64 (the agg_join contract).

    Two staircase passes (roles swapped) give per-row counts for BOTH
    sides; counts unsort back to original row order and weight the
    original value columns — the kernel never touches values.
    `presorted_*`: a side's prep-time (sorted_keys u64, perm)
    (engine device_sorted_column) skips that side's query-time sort —
    with both present the join runs with ZERO query-time sorts beyond
    the two [P]-length count unsorts."""
    n_b = jnp.int32(n_b)
    n_p = jnp.int32(n_p)

    def side(keys, n, pre):
        if pre is None:
            return _sort_keys(keys, n, key32)
        sk, perm = pre
        return (sk.astype(jnp.uint32) if key32 else sk), perm

    kb_s, perm_b = side(keys_b, n_b, presorted_b)
    kp_s, perm_p = side(keys_p, n_p, presorted_p)

    cnt_p, _ = _counts_auto(kb_s, n_b, kp_s, n_p, W, H, interpret)
    count = jnp.sum(cnt_p.astype(jnp.uint64))
    if vals_b.shape[0]:
        # build-side sums need per-BUILD-row counts: the same kernel
        # with the roles swapped.  Statically skipped when no view
        # lives on the build side.
        cnt_b, _ = _counts_auto(kp_s, n_p, kb_s, n_b, W, H, interpret)
        cb = _unsort(perm_b, cnt_b).astype(jnp.uint64)
        sums_b = jnp.sum(cb[None, :] * vals_b, axis=1)
    else:
        sums_b = jnp.zeros((0,), jnp.uint64)
    if vals_p.shape[0]:
        cp = _unsort(perm_p, cnt_p).astype(jnp.uint64)
        sums_p = jnp.sum(cp[None, :] * vals_p, axis=1)
    else:
        sums_p = jnp.zeros((0,), jnp.uint64)
    return count, sums_b, sums_p
