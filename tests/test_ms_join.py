"""Merge-staircase join (ops/ms_join.py) vs searchsorted + NumPy oracles.

The kernel runs under Pallas interpret mode on the CPU backend (the
same pipeline that compiles on TPU), so these tests cover the real
kernel logic: staircase construction, masked liveness, chunk-run
accumulation, first/min bookkeeping, the T_cap fallback cond, and the
fused checksum contract."""

import numpy as np
import jax.numpy as jnp
import pytest

from sigmod2018_tpu.ops import ms_join as ms


def _pad(arr, P, fill):
    out = np.full(P, fill, dtype=arr.dtype)
    out[:len(arr)] = arr
    return out


def _oracle(kb, nb, kp, np_):
    lo = np.searchsorted(kb[:nb], kp, side="left")
    hi = np.searchsorted(kb[:nb], kp, side="right")
    cnt = hi - lo
    cnt[np_:] = 0
    return cnt, lo


def _run(kb_live, kp_live, P=1024, dom=None, dtype=np.uint64, W=64, H=32,
         slack=1.0):
    kb = np.sort(np.asarray(kb_live, dtype=dtype))
    kp = np.sort(np.asarray(kp_live, dtype=dtype))
    nb, npp = len(kb), len(kp)
    fill = np.iinfo(dtype).max
    kbp = _pad(kb, P, np.array(fill, dtype))
    kpp = _pad(kp, P, np.array(fill, dtype))
    W_, H_, T = ms.stair_plan(P, P, W, H, slack)
    cnt, lo = ms.staircase_counts(jnp.asarray(kbp), nb, jnp.asarray(kpp),
                                  npp, W=W_, H=H_, T_cap=T, interpret=True)
    ecnt, elo = _oracle(kb, nb, kp, npp)
    np.testing.assert_array_equal(np.asarray(cnt)[:npp], ecnt)
    # lo defined only where cnt > 0
    got_lo = np.asarray(lo)[:npp]
    mask = ecnt > 0
    np.testing.assert_array_equal(got_lo[mask], elo[mask])
    assert np.all(np.asarray(cnt)[npp:] == 0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_counts_uniform(seed):
    rng = np.random.default_rng(seed)
    _run(rng.integers(0, 500, 700), rng.integers(0, 500, 900))


def test_counts_u32_dtype():
    rng = np.random.default_rng(9)
    _run(rng.integers(0, 300, 640), rng.integers(0, 300, 640),
         dtype=np.uint32)


def test_counts_skewed_hot_key():
    rng = np.random.default_rng(4)
    kb = np.concatenate([np.full(400, 7), rng.integers(8, 1000, 300)])
    kp = np.concatenate([np.full(500, 7), rng.integers(0, 1000, 200)])
    # hot key spans many chunks on both sides -> long staircase
    _run(kb, kp, slack=16.0)


def test_fallback_when_staircase_overflows():
    # slack=0 with an all-equal key forces T > T_cap -> searchsorted branch
    kb = np.full(800, 42)
    kp = np.full(900, 42)
    _run(kb, kp, slack=0.0)


def test_counts_max_key_is_live():
    m = np.iinfo(np.uint64).max
    kb = np.array([1, 5, m, m], dtype=np.uint64)
    kp = np.array([0, 5, m], dtype=np.uint64)
    _run(kb, kp, P=256, W=16, H=16)


def test_counts_disjoint_ranges():
    _run(np.arange(0, 300), np.arange(5000, 5300))
    _run(np.arange(5000, 5300), np.arange(0, 300))


def test_counts_empty_sides():
    _run(np.array([], dtype=np.uint64), np.arange(10), P=128, W=16, H=16)
    _run(np.arange(10), np.array([], dtype=np.uint64), P=128, W=16, H=16)


def _fused_oracle(kb, vb, kp, vp):
    i, j = np.where(kb[:, None] == kp[None, :])
    count = len(i)
    sb = [vb[v][i].sum() for v in range(vb.shape[0])]
    sp = [vp[v][j].sum() for v in range(vp.shape[0])]
    return count, np.array(sb, np.uint64), np.array(sp, np.uint64)


@pytest.mark.parametrize("seed,key32", [(0, False), (1, True), (2, False)])
def test_fused_matches_oracle(seed, key32):
    rng = np.random.default_rng(seed)
    P = 512
    nb, npp = 420, 380
    dom = 200 if seed else 50
    kb = rng.integers(0, dom, nb).astype(np.uint64)
    kp = rng.integers(0, dom, npp).astype(np.uint64)
    vb = rng.integers(0, 1 << 62, (2, P)).astype(np.uint64)
    vp = rng.integers(0, 1 << 62, (1, P)).astype(np.uint64)
    kbp = _pad(kb, P, np.uint64(0))
    kpp = _pad(kp, P, np.uint64(0))
    count, sb, sp = ms.ms_fused(jnp.asarray(kbp), jnp.asarray(vb), nb,
                                jnp.asarray(kpp), jnp.asarray(vp), npp,
                                key32=key32, W=64, H=32, interpret=True)
    ec, esb, esp = _fused_oracle(kb, vb[:, :nb], kp, vp[:, :npp])
    assert int(count) == ec
    np.testing.assert_array_equal(np.asarray(sb), esb)
    np.testing.assert_array_equal(np.asarray(sp), esp)


def test_fused_presorted_sides_match():
    rng = np.random.default_rng(5)
    P = 512
    nb, npp = 500, 512
    kb = rng.integers(0, 100, nb).astype(np.uint64)
    kp = rng.integers(0, 100, npp).astype(np.uint64)
    vb = rng.integers(0, 1 << 62, (1, P)).astype(np.uint64)
    vp = rng.integers(0, 1 << 62, (1, P)).astype(np.uint64)
    kbp = _pad(kb, P, np.uint64(0))
    kpp = _pad(kp, P, np.uint64(0))

    from sigmod2018_tpu.ops.sort_join import join_build

    pre_b = join_build(jnp.asarray(kbp), nb)   # u64 prep-sort contract
    pre_p = join_build(jnp.asarray(kpp), npp)
    base = ms.ms_fused(jnp.asarray(kbp), jnp.asarray(vb), nb,
                       jnp.asarray(kpp), jnp.asarray(vp), npp,
                       W=64, H=32, interpret=True)
    pres = ms.ms_fused(jnp.asarray(kbp), jnp.asarray(vb), nb,
                       jnp.asarray(kpp), jnp.asarray(vp), npp,
                       W=64, H=32, interpret=True,
                       presorted_b=pre_b, presorted_p=pre_p)
    for a, b in zip(base, pres):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
