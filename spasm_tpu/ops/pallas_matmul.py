"""Fused Pallas TPU kernel for exact dense matmul over GF(p).

The jnp reference implementation (ops/matmul.py) materializes each limb-pair
diagonal as a full (n, m) int32 array and runs several elementwise
mod-combine passes over HBM.  This kernel streams precomputed int8 limb
planes (half the HBM bytes of int32), accumulates the 2*nl-1 limb diagonals
in VMEM scratch across the contraction grid, and applies the modular
epilogue once per output tile:

  grid (i, j, k):  acc_s += A_limb_a @ B_limb_b  for a + b = s    (MXU int8)
  at k == last:    out = sum_s w_s * (acc_s mod p)   (balanced int32)

Measured ~36 effective mod-p Top/s on one v5e chip at 4096^3 (~1.5x the
XLA-fused jnp path).  Supported for tier-A primes (p <= 92681, including
the default 42013); other primes fall back to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field, num_limbs
from . import modmul

BM, BN, BK = 512, 512, 1024


# The epilogue's float-Barrett reduction (_mod_balanced_f32) sees |x| up to
# ~2**31; the f32 conversion error is then up to 128, i.e. up to 3*128/p
# quotients off after the reciprocal multiply.  The single conditional clamp
# corrects |q error| <= 1, so we need 3*128/p + 0.5 (rounding) to stay
# below 1.5, i.e. p >= ~780.  Primes below _MIN_P fall back to the jnp path
# (ops/matmul), which reduces per chunk with narrower accumulators.
_MIN_P = 1024


def supported(f: Field) -> bool:
    """Tier A (p <= 92681): direct int32 combine in the epilogue.  Tier B
    (92681 < p < 2**31): the limb diagonals still accumulate in int32 (the
    int8 limb products are p-independent); the epilogue combines them with
    an unsigned 16x16-split multiply, exact for the full tier-B range.
    p >= _MIN_P in both tiers so the float-Barrett quotient error of a
    ~2**31 accumulator is correctable by one clamp."""
    return f.p >= _MIN_P and f.p < (1 << 31)


def available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _mod_balanced_f32(p: int, x):
    """Exact balanced reduction of int32 x: float Barrett quotient, integer
    multiply-subtract, conditional clamp.

    q = round(f32(x)/p) is within ~0.51 of x/p (f32 conversion error of a
    <2**31 input is <= 128, i.e. <= 0.004 quotients for tier-A p), so
    x - q*p fits int32 (|.| <= p/2 + ~300) and the int32 multiply-subtract
    is exact even if q*p transiently wraps (two's complement).  One
    conditional +-p clamp lands in the balanced range."""
    dinv = np.float32(1.0 / p)
    pi = np.int32(p)
    half = np.int32(p // 2)
    q = jnp.round(x.astype(jnp.float32) * dinv).astype(jnp.int32)
    r = x - q * pi
    r = jnp.where(r > half, r - pi, r)
    r = jnp.where(r < -half, r + pi, r)
    return r


def _u32_to_f32(v):
    """uint32 -> f32 via 16-bit halves (Mosaic has no direct u32->f32
    cast): hi * 2**16 is exact in f32, the final add rounds once, so the
    total conversion error stays <= 256 — the same bound as a direct
    round-to-nearest conversion of a < 2**32 input."""
    hi = (v >> 16).astype(jnp.int32).astype(jnp.float32)
    lo = (v & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * np.float32(65536.0) + lo


def _modu32_f32(p: int, v):
    """v mod p for uint32 v < 2**32, 92681 < p < 2**31: float-Barrett
    quotient (f32 conversion error <= 256 => quotient error << 1), exact
    uint32 wrap-around multiply-subtract, one conditional +p correction.
    q < 2**32/p < 2**16 fits int32, so the f32->int->u32 casts are
    Mosaic-lowerable."""
    pu = jnp.uint32(p)
    q = jnp.round(_u32_to_f32(v)
                  * np.float32(1.0 / p)).astype(jnp.int32).astype(jnp.uint32)
    r = v - q * pu  # wraps iff the true remainder is negative
    return jnp.where(r > jnp.uint32(1 << 31), r + pu, r)


def _mulmod_u32(p: int, x, w: int):
    """(x * w) mod p for uint32 x in [0, p), scalar weight w in [0, p),
    p < 2**31 — 16x16 split; shifts reassemble via exact mod-doubling."""
    pu = jnp.uint32(p)
    mask = jnp.uint32(0xFFFF)
    x1, x0 = x >> 16, x & mask
    w1, w0 = int(w) >> 16, int(w) & 0xFFFF
    t_lo = _modu32_f32(p, x0 * jnp.uint32(w0))
    t_mid = _modu32_f32(p, x1 * jnp.uint32(w0) + x0 * jnp.uint32(w1))
    t_hi = _modu32_f32(p, x1 * jnp.uint32(w1))
    r = t_hi
    for _ in range(16):
        r2 = r + r
        r = jnp.where(r2 >= pu, r2 - pu, r2)
    r = r + t_mid
    r = jnp.where(r >= pu, r - pu, r)
    for _ in range(16):
        r2 = r + r
        r = jnp.where(r2 >= pu, r2 - pu, r2)
    r = r + t_lo
    return jnp.where(r >= pu, r - pu, r)


def _kernel(f: Field, nl: int, nk: int, *refs):
    a_refs = refs[:nl]
    b_refs = refs[nl:2 * nl]
    o_ref = refs[2 * nl]
    accs = refs[2 * nl + 1:]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        for acc in accs:
            acc[:] = jnp.zeros_like(acc)

    for i in range(nl):
        a = a_refs[i][:]
        for j in range(nl):
            prod = jax.lax.dot_general(
                a, b_refs[j][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            accs[i + j][:] += prod

    @pl.when(k == nk - 1)
    def _():
        p = f.p
        if f.tier == "a":
            w = [pow(256, s, p) for s in range(2 * nl - 1)]
            w = [x - p if x > p // 2 else x for x in w]
            total = jnp.zeros_like(accs[0][:])
            for s in range(2 * nl - 1):
                d = _mod_balanced_f32(p, accs[s][:])
                total = total + _mod_balanced_f32(p, d * np.int32(w[s]))
            o_ref[:] = _mod_balanced_f32(p, total)
        else:
            # tier B: |d|, w up to ~2**30 — combine in uint32 with a
            # 16x16-split multiply (exact for p < 2**31)
            pu = jnp.uint32(p)
            total = jnp.zeros(accs[0].shape, jnp.uint32)
            for s in range(2 * nl - 1):
                d = _mod_balanced_f32(p, accs[s][:])
                du = jnp.where(d < 0, d + np.int32(p), d).astype(jnp.uint32)
                prod = _mulmod_u32(p, du, pow(256, s, p))
                t2 = total + prod          # both < p < 2**31: sum < 2**32
                total = jnp.where(t2 >= pu, t2 - pu, t2)
            ts = total.astype(jnp.int32)
            o_ref[:] = jnp.where(ts > np.int32(p // 2), ts - np.int32(p),
                                 ts)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _pallas_mm(f: Field, a, b, bm=BM, bn=BN, bk=BK):
    nl = num_limbs(f.p)
    n, k = a.shape
    _, m = b.shape
    nk = k // bk
    # int32 accumulator bound: nk * bk * 128*128 * nl < 2**31
    assert nk * bk * 16384 * nl < (1 << 31), "pre-chunk long contractions"
    al = modmul.to_limbs(f, a, nl)  # (n, k, nl) int8
    bl = modmul.to_limbs(f, b, nl)
    ins = ([al[:, :, i] for i in range(nl)]
           + [bl[:, :, j] for j in range(nl)])
    kern = functools.partial(_kernel, f, nl, nk)
    return pl.pallas_call(
        kern,
        grid=(n // bm, m // bn, nk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k_: (i, k_))
                  for _ in range(nl)]
                 + [pl.BlockSpec((bk, bn), lambda i, j, k_: (k_, j))
                    for _ in range(nl)],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k_: (i, j)),
        # under shard_map the output varies over the same mesh axes as the
        # inputs (per-shard matmul); without the vma annotation the
        # shard_map vma check rejects the pallas call on multi-chip TPU
        # (exposed by the v5e:2x4 AOT compile, tools/overlap_evidence.py)
        out_shape=jax.ShapeDtypeStruct(
            (n, m), jnp.int32,
            vma=jax.typeof(a).vma | jax.typeof(b).vma),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)
                        for _ in range(2 * nl - 1)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k * nl * nl,
            bytes_accessed=nl * (n * k + k * m) + 4 * n * m,
            transcendentals=0),
        interpret=not available(),  # CPU tests exercise kernel semantics
    )(*ins)


def max_k(f: Field) -> int:
    """Longest contraction a single accumulation pass supports."""
    nl = num_limbs(f.p)
    return ((1 << 31) // (16384 * nl) - 1) // BK * BK


def modmatmul_pallas(f: Field, a, b):
    """Padded/chunked wrapper around the fused kernel.  Callers should
    check supported(f) / available() and fall back to ops.matmul."""
    n, k = a.shape
    _, m = b.shape
    kmax = max_k(f)
    if k > kmax:
        acc = None
        for c0 in range(0, k, kmax):
            part = modmatmul_pallas(f, a[:, c0:c0 + kmax],
                                    b[c0:c0 + kmax, :])
            acc = part if acc is None else modmul.add(f, acc, part)
        return acc
    # small problems: tile sizes shrink to the matrix (min MXU tile 128)
    bm = min(BM, max(128, -(-n // 128) * 128))
    bn = min(BN, max(128, -(-m // 128) * 128))
    bk = min(BK, max(256, -(-k // 256) * 256))
    nl = num_limbs(f.p)
    if nl >= 3:
        # per-step VMEM = 2*nl double-buffered s8 input blocks + the
        # (2*nl - 1) s32 scratch accumulators + the s32 output block; at
        # nl = 4 the 512x512 tiles hit 17 MiB > the 16 MiB scoped limit
        # (measured compile-time OOM on v5e) — halve the output tile
        bm = min(bm, 256)
        bn = min(bn, 256)
    np_, mp_, kp_ = -(-n // bm) * bm, -(-m // bn) * bn, -(-k // bk) * bk
    if (np_, kp_) != (n, k):
        a = jnp.pad(a, ((0, np_ - n), (0, kp_ - k)))
    if (kp_, mp_) != (k, m):
        b = jnp.pad(b, ((0, kp_ - k), (0, mp_ - m)))
    return _pallas_mm(f, a, b, bm, bn, bk)[:n, :m]
