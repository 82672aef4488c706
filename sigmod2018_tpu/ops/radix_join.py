"""Pallas radix join: bucketed all-pairs probe with fused checksums.

TPU-native restatement of the reference's radix hash join (rhjoin.c:13-111,
preprocess.c): partition both sides on the low key bits, then join each
bucket pair.  Architecture mapping:

  reference                         here
  ---------                         ----
  HistJob histogram (preprocess.c   XLA bincount over bucket ids (the
  :181-195)                         histogram *is* a vector op)
  PartitionJob rescan-scatter       stable argsort by bucket id + scatter
  (preprocess.c:222-299)            into a [B, S] padded bucket matrix —
                                    a counting sort, no rescans
  bucket-chain index + chain walk   no index at all: a bucket holds ~n/B
  (rhjoin.c:219-309, LOOP 3/4)      rows, so the probe is a VMEM-tiled
                                    all-pairs key compare on the VPU —
                                    pointer chasing becomes a dense
                                    [Tp, Tb] compare/accumulate
  GetResults emit + later checksum  fused: per-row match counts (pc/mc)
  (rhjoin.c:141-217, inter_res.c)   turn into checksums via one weighted
                                    reduction per side — no pair list

Mosaic has no 64-bit integers, so the kernel works in u32 lanes: u64 keys
are split hi/lo u32 (equality = both halves equal), and the kernel emits
only per-row MATCH COUNTS (u32-exact: a count is bounded by the opposite
side's slot width ≤ 2^15).  The u64 wrap-around checksums are then one
weighted reduction per view column in XLA — Σ count_i · value_i mod 2^64
— where 64-bit math exists.  Bit-exact, no 64-bit ops in the kernel.

Two-level sizing: bucket slot counts are data-dependent, so the caller
syncs ONCE on the max bucket size to pick the static slot width S
(SURVEY §7.1 two-phase rule).  `radix_join_checksum` is the drop-in
fused-final-join (count, sums_build, sums_probe) — same contract as
ops/agg_join.py — selected by EngineConfig.join_algo == "radix".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_KEY = jnp.uint64(0xFFFFFFFFFFFFFFFF)

# Per-bucket slot cap: keeps the [tile, S] compare tiles inside VMEM and
# match counts trivially inside u32.
MAX_BUCKET = 1 << 15


def _split_u64(x: jax.Array):
    return (x >> jnp.uint64(32)).astype(jnp.uint32), x.astype(jnp.uint32)


def _bucketize(keys: jax.Array, n_valid: jax.Array, bits: int, slots: int):
    """Counting-sort rows into a [B, slots] matrix + per-bucket counts.

    Dead rows (index >= n_valid) drop out.  Returns (bucketed_keys u64
    [B, slots] PAD-filled, perm [B, slots] i32 original positions,
    counts [B] i32).
    """
    B = 1 << bits
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n_valid
    bucket = jnp.where(live, (keys & jnp.uint64(B - 1)).astype(jnp.int32), B)
    order = jnp.argsort(bucket, stable=True).astype(jnp.int32)
    # Histogram as a broadcast compare + row sums: jnp.bincount lowers to
    # a scatter-add, which serializes on TPU (~10ms at 64K rows); this is
    # a dense [B+1, P] reduction the VPU chews through in microseconds.
    hist = jnp.sum(
        bucket[None, :] == jnp.arange(B + 1, dtype=jnp.int32)[:, None],
        axis=1, dtype=jnp.int32,
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist[:-1], dtype=jnp.int32)]
    )
    # Slot (b, s) pulls sorted row starts[b] + s — all GATHERS: XLA
    # scatters serialize on TPU (~10x slower than this formulation).
    cnt = jnp.minimum(hist[:B], slots)
    slot = jnp.arange(slots, dtype=jnp.int32)[None, :]
    src = jnp.minimum(starts[:B, None] + slot, P - 1)
    valid = slot < cnt[:, None]
    sorted_keys = keys[order]
    bk = jnp.where(valid, sorted_keys[src], _PAD_KEY)
    perm = jnp.where(valid, order[src], 0)
    return bk, perm, cnt


def _probe_kernel(bh_ref, bl_ref, ph_ref, pl_ref, nb_ref, np_ref,
                  mc_ref, *, lanes: int, ti: int, tj: int):
    """Per-BUILD-row match counts for every radix bucket, lane-parallel.

    All arrays arrive TRANSPOSED with buckets on the LANE axis:
    build [Sb, B], probe [Sp, B], counts [1, B], output mc [Sb, B] where
    mc[j, b] = #probe rows of bucket b matching build row j.  A probe
    tile [TI, 128] and a build tile [TJ, 128] cover 128 buckets at once;
    the rank-3 compare [TI, TJ, 128] keeps every vector lane busy (the
    per-bucket serial variant wasted 127/128 of the VPU).  Lane slices
    are STATIC (python loop over bucket groups) — dynamic lane indexing
    crashes this toolchain's Mosaic; only sublane slices are dynamic.

    The caller runs the kernel twice with sides swapped for the probe-row
    counts (lane-axis reductions also crash the lowering).

    GRIDLESS by necessity: any pallas_call with a grid crashes this
    environment's remote-compile service — loops live in the kernel and
    the whole bucket matrices sit in VMEM (`radix_join_checksum` caps
    B*S accordingly)."""
    Sb = bh_ref.shape[0]
    Sp = ph_ref.shape[0]
    B = bh_ref.shape[1]

    for g in range(B // lanes):  # static lane groups
        lo_l, hi_l = g * lanes, (g + 1) * lanes
        nb = nb_ref[0:1, lo_l:hi_l]       # [1, lanes] i32
        npr = np_ref[0:1, lo_l:hi_l]

        def build_tile(jt, _):
            joff = jt * jnp.int32(tj)
            bh = bh_ref[pl.ds(joff, tj), lo_l:hi_l]   # [TJ, lanes]
            bl = bl_ref[pl.ds(joff, tj), lo_l:hi_l]
            jdx = jax.lax.broadcasted_iota(jnp.int32, (tj, 1), 0)
            live_b = (jdx + joff) < nb                # [TJ, lanes]

            def probe_tile(it, acc):
                ioff = it * jnp.int32(ti)
                ph = ph_ref[pl.ds(ioff, ti), lo_l:hi_l]   # [TI, lanes]
                plo = pl_ref[pl.ds(ioff, ti), lo_l:hi_l]
                idx = jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)
                live_p = (idx + ioff) < npr               # [TI, lanes]
                eq = (
                    (ph[:, None, :] == bh[None, :, :])
                    & (plo[:, None, :] == bl[None, :, :])
                    & live_p[:, None, :]
                    & live_b[None, :, :]
                )
                # f32 sums are exact here (counts <= Sp <= 2^15 < 2^24);
                # integer sums upcast through i64, which Mosaic lacks.
                eqf = jnp.where(eq, jnp.float32(1), jnp.float32(0))
                return acc + jnp.sum(eqf, axis=0)

            acc = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(Sp // ti), probe_tile,
                jnp.zeros((tj, lanes), jnp.float32),
            )
            mc_ref[pl.ds(joff, tj), lo_l:hi_l] = acc.astype(jnp.int32)
            return _

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(Sb // tj), build_tile,
                          jnp.int32(0))


def _match_counts(bh, bl, nb, ph, plo, npr, *, interpret: bool):
    """pallas_call wrapper: per-bucket per-build-row match counts.
    Inputs [B, S*] u32 bucket matrices.  Returns mc [B, Sb] i32."""
    B, Sb = bh.shape
    Sp = ph.shape[1]
    lanes = 128
    Bp = max(B, lanes)  # lane-pad the bucket axis (extra buckets are dead)

    def t_pad(x):  # [B, S] -> [S, Bp]
        xt = x.T
        if Bp > B:
            xt = jnp.pad(xt, ((0, 0), (0, Bp - B)))
        return xt

    def c_pad(n):  # [B] -> [1, Bp]
        n = n[None, :]
        if Bp > B:
            n = jnp.pad(n, ((0, 0), (0, Bp - B)))
        return n.astype(jnp.int32)

    # Tile sizes: bound the [TI, TJ, 128] compare block to ~2MB f32.
    ti = max(8, min(64, Sp))
    while Sp % ti:
        ti //= 2
    tj = max(8, min(64, Sb))
    while Sb % tj:
        tj //= 2
    mc_t = pl.pallas_call(
        partial(_probe_kernel, lanes=lanes, ti=ti, tj=tj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Sb, Bp), jnp.int32),
        interpret=interpret,
    )(t_pad(bh), t_pad(bl), t_pad(ph), t_pad(plo), c_pad(nb), c_pad(npr))
    return mc_t[:, :B].T


def _weighted_u64_sum(counts: jax.Array, values: jax.Array) -> jax.Array:
    """Σ counts[i] * values[i] (mod 2^64) — exact, in XLA u64."""
    return jnp.sum(counts.astype(jnp.uint64) * values, dtype=jnp.uint64)


@partial(jax.jit, static_argnames=("bits", "slots_b", "slots_p", "interpret"))
def _radix_join_jit(keys_b, vals_b, n_b, keys_p, vals_p, n_p,
                    bits: int, slots_b: int, slots_p: int, interpret: bool):
    bk, bperm, bcnt = _bucketize(keys_b, n_b, bits, slots_b)
    pk, pperm, pcnt = _bucketize(keys_p, n_p, bits, slots_p)
    bh, bl = _split_u64(bk)
    ph, plo = _split_u64(pk)
    # Two passes with the sides swapped: each pass emits the counts for
    # the side held stationary on the lane axis (see _probe_kernel).
    mc = _match_counts(bh, bl, bcnt, ph, plo, pcnt, interpret=interpret)
    pc = _match_counts(ph, plo, pcnt, bh, bl, bcnt, interpret=interpret)
    count = jnp.sum(mc.astype(jnp.uint64))
    # Weighted per-row sums: gather each bucketed row's value via the
    # stored permutation, weight by its match count.  (The limb trick is
    # only needed *inside* the kernel; out here XLA has u64.)
    sums_b = jax.vmap(
        lambda v: _weighted_u64_sum(mc.reshape(-1), v[bperm.reshape(-1)])
    )(vals_b) if vals_b.shape[0] else jnp.zeros((0,), jnp.uint64)
    sums_p = jax.vmap(
        lambda v: _weighted_u64_sum(pc.reshape(-1), v[pperm.reshape(-1)])
    )(vals_p) if vals_p.shape[0] else jnp.zeros((0,), jnp.uint64)
    return count, sums_b, sums_p


def bucket_slot_hint(keys: jax.Array, n_valid: jax.Array, bits: int):
    """Max bucket occupancy (device scalar) — the caller's one sync to
    size the static slot width."""
    B = 1 << bits
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n_valid
    bucket = jnp.where(live, (keys & jnp.uint64(B - 1)).astype(jnp.int32), B)
    hist = jnp.sum(
        bucket[None, :] == jnp.arange(B, dtype=jnp.int32)[:, None],
        axis=1, dtype=jnp.int32,
    )  # dense compare beats bincount's scatter-add on TPU
    return jnp.max(hist)


_slot_hint_jit = jax.jit(bucket_slot_hint, static_argnames=("bits",))


@partial(jax.jit, static_argnames=("bits",))
def _slot_hints2(keys_b, n_b, keys_p, n_p, bits: int):
    """Both sides' max bucket occupancy in ONE readback (each sync costs
    a full RTT on a tunneled TPU)."""
    return jnp.stack([
        bucket_slot_hint(keys_b, n_b, bits),
        bucket_slot_hint(keys_p, n_p, bits),
    ])


def radix_join_checksum(keys_b, vals_b, n_b, keys_p, vals_p, n_p,
                        bits: int = 8, interpret=None):
    """Fused radix join + checksums (same contract as join_checksum_fused).

    Syncs once per side for the slot width.  Falls back to wider slots
    automatically; buckets beyond MAX_BUCKET rows are rejected (callers
    use the sort path for pathologically skewed inputs).
    """
    from ..utils.padding import size_class

    if interpret is None:  # Mosaic is TPU-only; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    import numpy as _np

    hints = _np.asarray(_slot_hints2(keys_b, jnp.int32(n_b),
                                     keys_p, jnp.int32(n_p), bits))
    sb, sp = int(hints[0]), int(hints[1])
    slots_b = size_class(max(sb, 1), 128)
    slots_p = size_class(max(sp, 1), 512)
    B = 1 << bits
    # VMEM bound: the gridless kernel holds the whole [B, S] bucket
    # matrices on chip (~24 B/slot across both passes).
    if (slots_b > MAX_BUCKET or slots_p > MAX_BUCKET
            or B * max(slots_b, slots_p) > (1 << 19)):
        raise ValueError(
            f"bucket overflow (build {sb}, probe {sp} rows, B={B}): raise "
            f"`bits` or use the sort join"
        )
    return _radix_join_jit(keys_b, vals_b, jnp.int32(n_b),
                           keys_p, vals_p, jnp.int32(n_p),
                           bits, slots_b, slots_p, interpret)
