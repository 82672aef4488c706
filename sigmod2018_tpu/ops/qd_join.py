"""Equi-depth (quantile) partition join: the zero-build-padding member.

Same contract as the radix member (ops/radix_join.py — the TPU
restatement of the reference's radix hash join, rhjoin.c:13-217), but
the partition function is the BUILD side's own order statistics instead
of low key bits:

    bucket b  =  build rows [b*SPb, (b+1)*SPb)  of the key-sorted side.

What that buys on this hardware (all costs relative to the radix
member at the same scale):

  * build side: plain key sort -> `reshape` IS the partition.  No
    rotation, no per-bucket DMA slot-fill, no ALIGN slack, no occupancy
    margin — every bucket holds exactly SPb rows.  The build limb
    matrices carry ZERO padding, and the build value columns never
    enter the kernel at all (per-row match counts fold back to sorted
    order by pure reshapes, and the weighted sums run in XLA).
  * probe side: quantile assignment is order-preserving, so the plain
    key sort is already bucket-grouped; starts come from a [B]-element
    searchsorted against the quantiles.  Slot-fill + windows as in the
    radix member.
  * compare work: the kernel's per-probe-slot cost drops from the radix
    member's SPb_padded (~2048 slots: 2x occupancy margin + ALIGN
    slack) to SPb + H (~320), a ~3-6x reduction in the VPU all-pairs
    cost that dominates the radix member's probe phase.

Boundary-straddling key runs: a key's run may cross a bucket edge, so
each kernel lane carries an H-row halo of its predecessor bucket's
tail.  A probe key is assigned to the LAST bucket whose boundary
quantile is <= key, which makes its whole match range live in
[b*SPb - H, (b+1)*SPb) whenever the key's multiplicity is <= H (proof
in `qd_fused_static`).  Multiplicity > H, probe-bucket overflow, or a
live key of 2^64-1 (indistinguishable from the dead-row sentinel in
the quantile vector) route the join through the same sorted-merge
`lax.cond` branch the radix member uses — on device, no host sync.

Reference mapping: HistJob/PartitionJob (preprocess.c:13-178) -> the
one plain sort + reshape; bucket-chain probe (rhjoin.c:141-217) -> the
shared streaming dual-count kernel (`radix_join._probe_kernel`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .radix_join import (
    ALIGN,
    MAX_SLOTS,
    _MAX_U64,
    _counts_grouped,
    _merge_on_sorted,
    _pad_align,
    _slotfill,
)

_MAX_U32 = np.uint32(0xFFFFFFFF)


def qd_static_plan(Pb: int, Pp: int, SPb: int = 256,
                   H: int = 64) -> Tuple[int, int, int]:
    """Data-independent sizing: build bucket depth SPb (exact, no
    margin needed — occupancy is SPb by construction), halo H (bounds
    tolerated key multiplicity), probe slot width with the radix
    member's 2x margin + ALIGN window slack."""
    from ..utils.padding import size_class

    SPb = min(SPb, Pb)
    while Pb % SPb:
        SPb //= 2
    B = Pb // SPb
    H = min(H, SPb)
    expected_p = -(-Pp // B)
    SPp = min(size_class(max(2 * expected_p, ALIGN), ALIGN) + ALIGN,
              MAX_SLOTS + ALIGN)
    # The streaming kernel holds the whole [SPb + H, B] u32 build-slot
    # matrix as a single-buffered VMEM input window (4*(Pb + H*B)
    # bytes), so the member structurally caps near 2^24 build rows on a
    # 128 MB-VMEM chip — observed as a backend compile failure at 2^25
    # (Allocation would exceed memory, u32[320,131072] window).  Fail
    # at PLAN time with a clear message instead: only a forced
    # algo="qd" reaches these sizes (auto serves them with the
    # split-build staircase member), and the engine's dispatch guard
    # logs + answers from the host oracle.
    if (SPb + H) * B * 4 > 100 * (1 << 20):
        raise ValueError(
            f"qd member build-slot matrix [{SPb + H}, {B}] u32 exceeds "
            f"VMEM (Pb={Pb}, Pp={Pp}); use the staircase member here")
    return SPb, H, SPp


def _sort_side(keys: jax.Array, vals: jax.Array, n: jax.Array,
               key32: bool = False):
    """Plain key sort carrying the value columns: ONE stable single-key
    sort — dead rows (index >= n, key forced to dtype max) sit at
    suffix positions, so stability keeps live max-key rows ahead of
    them without a second liveness key (~1.5x comparator cost).
    `key32` (catalog stats): single-limb u32 sort, keys returned u32."""
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n
    if key32:
        k = jnp.where(live, keys.astype(jnp.uint32), _MAX_U32)
    else:
        k = jnp.where(live, keys, _MAX_U64)
    ops = (k,) + tuple(vals[v] for v in range(vals.shape[0]))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
    vals_s = (jnp.stack(sorted_ops[1:]) if vals.shape[0]
              else jnp.zeros((0, P), jnp.uint64))
    return sorted_ops[0], vals_s


def _pstarts(kp: jax.Array, qb: jax.Array, n_p) -> jax.Array:
    """Probe start of each quantile bucket: rank of the quantile in the
    sorted probe keys.  u64 keys rank via ops/lsd.py (searchsorted's
    u64 method="sort" lowering measures ~8x a plain sort)."""
    if kp.dtype == jnp.uint64:
        from .lsd import ranks_u64

        r = ranks_u64(kp, qb, side="left")
    else:
        r = jnp.searchsorted(kp, qb, side="left", method="sort")
    return jnp.minimum(r, n_p).astype(jnp.int32)


def _max_run_length(ks: jax.Array, n: jax.Array) -> jax.Array:
    """Longest equal-key run in the live prefix of sorted `ks`."""
    P = ks.shape[0]
    idx = jnp.arange(P, dtype=jnp.int32)
    live = idx < n
    same = jnp.concatenate([jnp.zeros(1, bool), ks[1:] == ks[:-1]]) & live
    start = jax.lax.cummax(jnp.where(same, jnp.int32(0), idx))
    return jnp.max(jnp.where(live, idx - start + 1, 0))


def _limb_mats(ks: jax.Array, B: int, SPb: int, H: int, limbs: int):
    """Build limb matrices [SPb + H, B]: bucket b's lane = its SPb-row
    segment of the sorted keys, prefixed by the last H rows of bucket
    b-1 (the halo).  Lane 0's halo is synthetic (all-ones filler) and
    masked out via the window start."""
    def mat(limb32):
        main = limb32.reshape(B, SPb)
        halo = jnp.concatenate(
            [jnp.full((1, H), _MAX_U32, jnp.uint32), main[:-1, SPb - H:]],
            axis=0)
        return jnp.concatenate([halo, main], axis=1).T  # [H+SPb, B]

    lo = mat(ks.astype(jnp.uint32))
    if limbs == 2:
        hi = mat((ks >> jnp.uint64(32)).astype(jnp.uint32))
        return hi, lo
    return lo, lo


def _qd_body(kb, vb, n_b, kp, vp, n_p, *, B: int, SPb: int, H: int,
             SPp: int, limbs: int):
    Pb = kb.shape[0]
    n_b = n_b.astype(jnp.int32)
    n_p = n_p.astype(jnp.int32)

    # Quantiles + probe bucket ranges (order-preserving assignment).
    qb = kb[::SPb]                                   # [B]
    pstart = _pstarts(kp, qb, n_p)
    pend = jnp.concatenate([pstart[1:], n_p.reshape(1)])
    ct_p = jnp.maximum(pend - pstart, 0)

    # Probe slot-fill (keys + value limbs), as in the radix member.
    srcs_p = [_pad_align(kp.astype(jnp.uint32), SPp)]
    if limbs == 2:
        srcs_p.insert(0, _pad_align((kp >> jnp.uint64(32))
                                    .astype(jnp.uint32), SPp))
    for v in range(vp.shape[0]):
        srcs_p.append(_pad_align((vp[v] >> jnp.uint64(32))
                                 .astype(jnp.uint32), SPp))
        srcs_p.append(_pad_align(vp[v].astype(jnp.uint32), SPp))
    mats_p = _slotfill(pstart, tuple(srcs_p), B, SPp)
    nk = limbs
    key_p = mats_p[:nk] if limbs == 2 else (mats_p[0], mats_p[0])

    bh_t, bl_t = _limb_mats(kb, B, SPb, H, limbs)

    # Build windows: [0 or H, H + live-rows-in-bucket).  Lane 0 starts
    # at H (synthetic halo filler); real halo rows are valid match
    # candidates everywhere else (no double counting: all probe rows of
    # a key live in exactly one lane).
    barange = jnp.arange(B, dtype=jnp.int32)
    lo_b = jnp.where(barange == 0, jnp.int32(H), 0)
    live_main = jnp.clip(n_b - barange * jnp.int32(SPb), 0, SPb)
    maskb = jnp.stack([lo_b, jnp.int32(H) + live_main])
    off_p = (pstart % ALIGN).astype(jnp.int32)
    maskp = jnp.stack([off_p, off_p + ct_p])

    mc, pc = _counts_grouped(bh_t, bl_t, maskb, maskp,
                             key_p[0].T, key_p[1].T,
                             B, SPb + H, SPp, limbs)

    # Fold halo counts back onto their owning sorted rows: halo j of
    # lane b covers sorted rows [b*SPb - H + j, b*SPb) — i.e. the tail
    # of lane b-1's main segment.
    mc_halo, mc_main = mc[:, :H], mc[:, H:]
    tail_add = jnp.concatenate(
        [mc_halo[1:], jnp.zeros((1, H), mc.dtype)], axis=0)
    mc_main = mc_main.at[:, SPb - H:].add(tail_add)
    cnt_rows = mc_main.reshape(Pb).astype(jnp.uint64)

    count = jnp.sum(cnt_rows)
    sums_b = (jnp.sum(cnt_rows[None, :] * vb, axis=1)
              if vb.shape[0] else jnp.zeros((0,), jnp.uint64))

    sums_p = []
    for v in range(vp.shape[0]):
        hi = mats_p[nk + 2 * v].astype(jnp.uint64)
        lo = mats_p[nk + 2 * v + 1].astype(jnp.uint64)
        val = (hi << jnp.uint64(32)) | lo
        sums_p.append(jnp.sum(pc.astype(jnp.uint64) * val,
                              dtype=jnp.uint64))
    sums_p = (jnp.stack(sums_p) if sums_p
              else jnp.zeros((0,), jnp.uint64))
    return count, sums_b, sums_p


@partial(jax.jit, static_argnames=("SPb", "H", "SPp", "limbs"))
def qd_fused_static(keys_b, vals_b, n_b, keys_p, vals_p, n_p, *,
                    SPb: int, H: int, SPp: int, limbs: int):
    """Sync-free fused equi-depth join (the agg_join contract: exact
    wrap-around uint64 (count, sums_build [V], sums_probe [V])).

    Correctness of the halo bound: let j be the last bucket with
    quantile qb[j] <= k for a live probe key k (so qb[j+1] > k).  The
    match range [lo, hi) of k in the sorted build keys has
    hi <= (j+1)*SPb (position (j+1)*SPb holds qb[j+1] > k) and
    lo >= j*SPb - H + 1 when hi - lo <= H (if any k-occurrence sat at
    or before position j*SPb then kb[j*SPb] = k, so hi > j*SPb and
    lo = hi - mult >= j*SPb + 1 - H).  Hence lane j's halo window
    [j*SPb - H, (j+1)*SPb) covers every match, and no other lane
    receives probes with key k — each (build, probe) pair is counted
    exactly once.  The on-device cond falls back to the sorted-merge
    member when multiplicity > H, a probe bucket outgrows SPp, or a
    live key equals the 2^64-1 dead sentinel."""
    n_b = jnp.int32(n_b)
    n_p = jnp.int32(n_p)
    kb, vb = _sort_side(keys_b, vals_b, n_b, key32=limbs == 1)
    kp, vp = _sort_side(keys_p, vals_p, n_p, key32=limbs == 1)
    Pb = kb.shape[0]
    B = Pb // SPb

    mult = _max_run_length(kb, n_b)
    qb = kb[::SPb]
    pstart = _pstarts(kp, qb, n_p)
    pend = jnp.concatenate([pstart[1:], n_p.reshape(1)])
    probe_occ = jnp.max(jnp.maximum(pend - pstart, 0))

    def has_max(ks, n):
        live = jnp.arange(ks.shape[0], dtype=jnp.int32) < n
        sentinel = _MAX_U32 if ks.dtype == jnp.uint32 else _MAX_U64
        return jnp.any(live & (ks == sentinel))

    overflow = ((mult > jnp.int32(H))
                | (probe_occ > jnp.int32(SPp - ALIGN))
                | has_max(kb, n_b) | has_max(kp, n_p))

    def merge(_):
        return _merge_on_sorted(kb, vb, n_b, kp, vp, n_p)

    def qd(_):
        return _qd_body(kb, vb, n_b, kp, vp, n_p, B=B, SPb=SPb, H=H,
                        SPp=SPp, limbs=limbs)

    return jax.lax.cond(overflow, merge, qd, None)
