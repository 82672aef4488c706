"""Per-call speed-of-light floors for the join member family.

VERDICT r4 #6: "compute-bound by design" is unfalsifiable without a
number to compare against.  This module computes, for one fused join
call at static shapes, three floors:

* `mem_floor_ms` — minimum HBM time: every input byte read once
  (keys at their compare width, value columns at 8 B), outputs ~0.
  v5e HBM roofline 819 GB/s (public spec).
* `cmp_floor_ms` — minimum compare time: a merge of two sorted streams
  resolves every row with ~1 comparison, so Pb + Pp pair-compares at
  the FASTEST measured VPU pair-compare rate on this chip (a floor
  must use the most optimistic ceiling): the merge-staircase kernel
  measured 0.39x10^12 pair/s (round 4), the 1-limb radix probe
  2.8x10^11, the 2-limb probe 2.0x10^11 — rounded up to 4x10^11.
* `tile_cmp_floor_ms` — the compare floor under the LAYOUT constraint
  this hardware imposes on the staircase family: per-lane dynamic
  indexing does not exist on the VPU, so an in-VMEM banded merge
  cannot narrow a probe row's candidate window below one native tile
  row (W = 1024 lanes per (8,128) block; sub-tile blocks relayout —
  measured 2x slower at W=512).  Minimum compare volume is then
  Pb * W_min + Pp * H_min with W_min = 1024, H_min = 128.

The unconstrained floor = max(mem, cmp); achieved-vs-floor is printed
by tools/roofline.py and carried in S18_TRACE output.  The gap between
`cmp_floor` and `tile_cmp_floor` is hardware granularity, not kernel
sloppiness — closing it requires per-lane gather/scatter the VPU does
not offer (the reference's analogous constraint is pointer-chasing
cost, rhjoin.c:141-217).
"""

from __future__ import annotations

from typing import Dict

HBM_GBPS = 819.0
VPU_PAIRS_PER_SEC = 4.0e11
TILE_W_MIN = 1024  # one native (8, 128) probe tile, lanes
TILE_H_MIN = 128   # minimum build band per probe tile, sublane granules


def fused_join_floors(Pb: int, Pp: int, vb: int = 1, vp: int = 1,
                      key32: bool = True) -> Dict[str, float]:
    """Floors (ms) for a fused checksum join: build/probe padded sizes
    Pb/Pp, vb/vp value columns per side, u32 or u64 compare width."""
    kw = 4 if key32 else 8
    bytes_min = kw * (Pb + Pp) + 8 * (vb * Pb + vp * Pp)
    mem = bytes_min / (HBM_GBPS * 1e9) * 1e3
    cmp_ = (Pb + Pp) / VPU_PAIRS_PER_SEC * 1e3
    tile = (Pb * TILE_W_MIN + Pp * TILE_H_MIN) / VPU_PAIRS_PER_SEC * 1e3
    return {
        "bytes_min": bytes_min,
        "mem_floor_ms": mem,
        "cmp_floor_ms": cmp_,
        "floor_ms": max(mem, cmp_),
        "tile_cmp_floor_ms": tile,
    }


def emit_count_floors(Pb: int, Pp: int, key32: bool = True) -> Dict[str, float]:
    """Floors for the counting (emitting) probe: no value columns."""
    return fused_join_floors(Pb, Pp, vb=0, vp=0, key32=key32)


def floors_for_op(name: str, args) -> Dict[str, float] | None:
    """Best-effort floor lookup for a traced op call (engine/trace.py):
    derives (Pb, Pp, vb, vp) from the call's array arguments.  Returns
    None for ops outside the join family."""
    import jax

    arrs = [a for a in args if isinstance(a, jax.Array)]
    try:
        if name in ("fused_join_auto", "join_checksum_fused", "ms_fused"):
            # signature (keys_b, bcols, n_b, keys_p, pcols, n_p): int
            # scalars are not jax arrays here, and value stacks may be
            # absent — derive (keys, value-column counts) by ndim
            one_d = [a for a in arrs if a.ndim == 1 and a.size > 2]
            two_d = [a for a in arrs if a.ndim == 2]
            if len(one_d) < 2:
                return None
            kb, kp = one_d[0], one_d[1]
            vb_n = two_d[0].shape[0] if len(two_d) > 0 else 1
            vp_n = two_d[1].shape[0] if len(two_d) > 1 else 1
            return fused_join_floors(kb.shape[0], kp.shape[0], vb_n, vp_n,
                                     key32=kb.dtype.itemsize == 4)
        if name in ("join_probe_count", "join_probe_count_auto",
                    "join_probe_count_ms", "join_probe_count_table"):
            one_d = [a for a in arrs if a.ndim == 1 and a.size > 2]
            if len(one_d) < 2:
                return None
            kb, kp = one_d[0], one_d[1]
            return emit_count_floors(kb.shape[0], kp.shape[0],
                                     key32=kb.dtype.itemsize == 4)
    except (IndexError, AttributeError):
        return None
    return None
