"""Device-side (jnp / TPU VPU) exact GF(p) arithmetic on int32 arrays.

Everything operates on the balanced representation (see field.py) and is
designed to trace cleanly under ``jax.jit``: the Field is a static Python
value captured in the closure, so ``p`` etc. become compile-time constants.

Tiers (Field.tier):

* tier 'a' (p <= 92681): balanced products fit int32 exactly — one multiply
  plus one remainder per op.  Covers the reference's default prime 42013.
* tier 'b' (p < 2**31): 16x16 split multiply in uint32 with doubling-based
  shift-mod.  Exact for the full range; slower, used only when requested.

p >= 2**31 is host-only (NumPy int64 path in field.py); the reference's own
dense kernels make a similar per-p datatype choice (``spasm_datatype_choose``,
src/SpaSM.jl:810).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import Field

_TIER_B_MAX_P = (1 << 31) - 1


def check_device_prime(f: Field) -> None:
    if f.p > _TIER_B_MAX_P:
        raise NotImplementedError(
            f"device arithmetic supports p < 2**31; got p={f.p} (use host ops)"
        )


def normalize(f: Field, x):
    """Map int32/int64 values into the balanced range.  `x` must be exact
    (no prior overflow)."""
    p = x.dtype.type(f.p)
    r = jnp.remainder(x, p)  # [0, p)
    r = jnp.where(r > x.dtype.type(f.halfp), r - p, r)
    return r.astype(jnp.int32)


def add(f: Field, a, b):
    # balanced inputs: |a+b| <= p < 2**32 — compute in int32 when safe
    if f.p <= (1 << 30):
        return normalize(f, a + b)  # |a+b| <= p <= 2**30, exact int32
    s = a.astype(jnp.int64) + b.astype(jnp.int64)
    return normalize(f, s)


def sub(f: Field, a, b):
    if f.p <= (1 << 30):
        return normalize(f, a - b)
    s = a.astype(jnp.int64) - b.astype(jnp.int64)
    return normalize(f, s)


def neg(f: Field, a):
    return -a  # balanced range is symmetric enough: |a| <= p//2, so is -a


def mul(f: Field, a, b):
    check_device_prime(f)
    if f.tier == "a":
        return normalize(f, a * b)  # (p//2)**2 < 2**31, exact int32
    return _mul_tier_b(f, a, b)


def axpy(f: Field, a, x, y):
    """a*x + y with one reduction (reference axpy, src/SpaSM.jl:387-390)."""
    check_device_prime(f)
    if f.tier == "a":
        # |a*x| < 2**31 and |y| <= p/2 — the sum can exceed int32.  Reduce the
        # product first (still one extra add-normalize, but stays in int32).
        return add(f, normalize(f, a * x), y)
    return add(f, _mul_tier_b(f, a, x), y)


# ---------------- tier B: 16x16 split multiply (p < 2**31) ----------------


def _to_unsigned(f: Field, a):
    """balanced int32 -> uint32 in [0, p).  |a| <= p//2 < 2**30 and
    p <= 2**31 - 1, so a + p fits int32 exactly."""
    lifted = jnp.where(a < 0, a + jnp.int32(f.p), a)
    return lifted.astype(jnp.uint32)


def _from_unsigned(f: Field, u):
    """uint32 in [0, p) -> balanced int32.  u < p <= 2**31 - 1 so the
    signed conversion is in-range."""
    s = u.astype(jnp.int32)
    return jnp.where(s > jnp.int32(f.halfp), s - jnp.int32(f.p), s)


def _addmod_u32(f: Field, x, y):
    # x, y in [0, p), p < 2**31 -> x + y < 2**32: exact in uint32
    s = x + y
    p = jnp.uint32(f.p)
    return jnp.where(s >= p, s - p, s)


def _dblmod_u32(f: Field, x):
    return _addmod_u32(f, x, x)


def _shiftmod_u32(f: Field, x, k: int):
    for _ in range(k):
        x = _dblmod_u32(f, x)
    return x


def _mul_tier_b(f: Field, a, b):
    p = jnp.uint32(f.p)
    au = _to_unsigned(f, a)
    bu = _to_unsigned(f, b)
    mask = jnp.uint32(0xFFFF)
    a1, a0 = au >> 16, au & mask
    b1, b0 = bu >> 16, bu & mask
    t_lo = (a0 * b0) % p            # < 2**32, exact
    t_mid = (a1 * b0 + a0 * b1) % p  # each term < 2**31, sum < 2**32, exact
    t_hi = (a1 * b1) % p            # < 2**30
    r = _shiftmod_u32(f, t_hi, 16)
    r = _addmod_u32(f, r, t_mid)
    r = _shiftmod_u32(f, r, 16)
    r = _addmod_u32(f, r, t_lo)
    return _from_unsigned(f, r)


def inv_scalar(f: Field, x):
    """Modular inverse of a (0-d) device value via Fermat: x**(p-2) mod p.
    p is prime, so this matches the reference's extended-gcd inverse
    (src/SpaSM.jl:386) on nonzero inputs; returns 0 for x == 0."""
    check_device_prime(f)
    e = f.p - 2
    result = jnp.int32(1)
    base = x
    while e:
        if e & 1:
            result = mul(f, result, base)
        base = mul(f, base, base)
        e >>= 1
    return result


# ---------------- int8 limb (de)composition for the MXU ----------------


def to_limbs(f: Field, x, nl: int):
    """Decompose balanced int32 values into `nl` balanced base-256 limbs
    (each in [-128, 127] — the full int8 range), so that
    ``x == sum_i limbs[i] * 256**i``.

    Returns an array of shape ``x.shape + (nl,)``, dtype int8.  This is the
    entry format for the MXU int8 modular matmul (ops/matmul.py): base 256
    needs only 2 limbs (4 MXU passes) for p <= 65792, vs 3 limbs (9 passes)
    in base 128.
    """
    limbs = []
    v = x.astype(jnp.int32)
    for _ in range(nl):
        l = ((v + 128) & 255) - 128  # balanced remainder mod 256
        limbs.append(l.astype(jnp.int8))
        v = (v - l) >> 8
    return jnp.stack(limbs, axis=-1)


def limb_weights(f: Field, nl: int):
    """(256**(i+j)) mod p as balanced int32, for combining limb products."""
    w = [pow(256, s, f.p) for s in range(2 * nl - 1)]
    w = [x - f.p if x > f.halfp else x for x in w]
    return jnp.array(w, dtype=jnp.int32)
