"""Field arithmetic vs Python big-int oracle, host and device tiers."""

import numpy as np
import pytest

from spasm_tpu.field import Field, num_limbs

PRIMES = [3, 5, 257, 42013, 65537, 92681, 104729, 2**31 - 1]


def balanced_oracle(p, x):
    r = x % p
    return r - p if r > p // 2 else r


@pytest.mark.parametrize("p", PRIMES)
def test_normalize_matches_oracle(p, rng):
    f = Field(p)
    xs = rng.integers(-(2**40), 2**40, size=1000)
    want = np.array([balanced_oracle(p, int(x)) for x in xs])
    np.testing.assert_array_equal(f.normalize(xs), want)


@pytest.mark.parametrize("p", PRIMES + [4294967291])
def test_normalize_barrett_magnitude_sweep(p, rng):
    """The float-Barrett fast path (|x| < 2**61) must agree with the
    big-int oracle at every magnitude scale, including the fallback edge
    (|x| >= 2**61 -> np.mod path) and exact multiples of p."""
    f = Field(p)
    parts = [rng.integers(-(2**k), 2**k, size=200)
             for k in (8, 20, 34, 48, 60)]
    parts.append(rng.integers(-(2**62), 2**62, size=200))  # fallback path
    mults = rng.integers(-(2**30), 2**30, size=50) * p  # exact zeros
    edges = np.array([0, 1, -1, p, -p, p // 2, -(p // 2),
                      (1 << 61) - 1, -(1 << 61) + 1, (1 << 61), -(1 << 61)])
    xs = np.concatenate(parts + [mults, edges])
    want = np.array([balanced_oracle(p, int(x)) for x in xs])
    got = f.normalize(xs)
    np.testing.assert_array_equal(got, want)
    assert got.min() >= f.mhalfp and got.max() <= f.halfp


@pytest.mark.parametrize("p", PRIMES)
def test_host_ops(p, rng):
    f = Field(p)
    a = f.rand(500, rng)
    b = f.rand(500, rng)
    for name, op, oracle in [
        ("add", f.add, lambda x, y: x + y),
        ("sub", f.sub, lambda x, y: x - y),
        ("mul", f.mul, lambda x, y: x * y),
    ]:
        got = op(a, b)
        want = np.array(
            [balanced_oracle(p, oracle(int(x), int(y))) for x, y in zip(a, b)]
        )
        np.testing.assert_array_equal(got, want, err_msg=name)
    # axpy
    c = f.rand(500, rng)
    got = f.axpy(a, b, c)
    want = np.array(
        [balanced_oracle(p, int(x) * int(y) + int(z)) for x, y, z in zip(a, b, c)]
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", PRIMES)
def test_inv(p, rng):
    f = Field(p)
    a = f.rand(200, rng)
    a = np.where(a == 0, 1, a)
    inv = f.inv(a)
    np.testing.assert_array_equal(f.mul(a, inv), np.ones_like(a))


def test_rational():
    f = Field(42013)
    # 1/2 mod p then *2 == 1
    half = f.from_rational(1, 2)
    assert f.mul(half, 2) == 1


@pytest.mark.parametrize("p", PRIMES[:-1])
def test_device_ops(p, rng):
    import jax.numpy as jnp

    from spasm_tpu.ops import modmul

    f = Field(p)
    a = f.rand(512, rng).astype(np.int32)
    b = f.rand(512, rng).astype(np.int32)
    aj, bj = jnp.array(a), jnp.array(b)
    np.testing.assert_array_equal(np.asarray(modmul.add(f, aj, bj)), f.add(a, b))
    np.testing.assert_array_equal(np.asarray(modmul.sub(f, aj, bj)), f.sub(a, b))
    np.testing.assert_array_equal(np.asarray(modmul.mul(f, aj, bj)), f.mul(a, b))
    c = f.rand(512, rng).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(modmul.axpy(f, aj, bj, jnp.array(c))), f.axpy(a, b, c)
    )


def test_device_tier_b():
    import jax.numpy as jnp

    from spasm_tpu.ops import modmul

    p = 2**31 - 1  # mersenne, tier b
    f = Field(p)
    rng = np.random.default_rng(7)
    a = f.rand(300, rng).astype(np.int32)
    b = f.rand(300, rng).astype(np.int32)
    got = np.asarray(modmul.mul(f, jnp.array(a), jnp.array(b)))
    np.testing.assert_array_equal(got, f.mul(a, b))


@pytest.mark.parametrize("p", PRIMES)
def test_limb_roundtrip(p, rng):
    import jax.numpy as jnp

    from spasm_tpu.ops import modmul

    f = Field(p)
    nl = num_limbs(p)
    xs = f.rand(1000, rng).astype(np.int32)
    # include extremes
    xs[0], xs[1] = f.halfp, f.mhalfp
    limbs = np.asarray(modmul.to_limbs(f, jnp.array(xs), nl)).astype(np.int64)
    assert limbs.min() >= -128 and limbs.max() <= 127
    recon = sum(limbs[:, i] * 256**i for i in range(nl))
    np.testing.assert_array_equal(recon, xs)


@pytest.mark.parametrize("p", [5, 42013, 92681, 104729, 2**31 - 1])
def test_modmatmul(p, rng):
    import jax.numpy as jnp

    from spasm_tpu.ops.matmul import modmatmul_jit

    f = Field(p)
    n, k, m = 40, 70, 30
    a = f.rand((n, k), rng)
    b = f.rand((k, m), rng)
    want = f.normalize(a.astype(object) @ b.astype(object))
    got = np.asarray(
        modmatmul_jit(f, jnp.array(a, jnp.int32), jnp.array(b, jnp.int32))
    )
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_modmatmul_chunked(rng):
    import jax.numpy as jnp

    from spasm_tpu.ops.matmul import modmatmul
    from spasm_tpu.ops import matmul as mm

    f = Field(42013)
    k = mm._k_chunk(3) * 2 + 17  # force the fori_loop path
    a = f.rand((8, k), rng)
    b = f.rand((k, 8), rng)
    want = f.normalize(a.astype(object) @ b.astype(object))
    got = np.asarray(modmatmul(f, jnp.array(a, jnp.int32), jnp.array(b, jnp.int32)))
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_max_prime_int32_data(rng):
    """Primes in (2**31, 2**32-5] must work on int32 CSR data (the host
    range documented in field.py; regression for an OverflowError in
    normalize when p exceeds the input dtype's range)."""
    import spasm_tpu as st

    p = 4294967291  # = 2**32 - 5, the largest legal prime
    f = Field(p)
    x32 = np.array([-3, 7, 2**31 - 1, -(2**31)], np.int32)
    got = f.normalize(x32)
    want = f.normalize(x32.astype(object))
    np.testing.assert_array_equal(got, want.astype(np.int64))
    from spasm_tpu.field import datatype_choose

    assert datatype_choose(p) == "i8l5"
    # end-to-end rank over the max prime (host pipeline)
    A = st.SparseGFp.rand(f, 24, 30, 0.2, rng)
    r = st.rank(A)
    from tests.test_echelonize import dense_rank_oracle

    assert r == dense_rank_oracle(p, A.to_dense())


TIER_C_PRIMES = [2147483659, 4294967291]  # first prime > 2**31; 2**32 - 5


@pytest.mark.parametrize("p", TIER_C_PRIMES)
def test_device_tier_c_ops(p, rng):
    """Full-range device arithmetic (tier 'c', src/SpaSM.jl:74): uint32
    wrap-aware residues vs the always-exact host path."""
    import jax.numpy as jnp

    from spasm_tpu.ops import modmul

    f = Field(p)
    assert f.tier == "c"
    a = f.rand(1024, rng).astype(np.int32)
    b = f.rand(1024, rng).astype(np.int32)
    # force the extremes and wrap-prone combinations
    a[:4] = [f.halfp, f.mhalfp, f.halfp, f.mhalfp]
    b[:4] = [f.halfp, f.mhalfp, f.mhalfp, f.halfp]
    aj, bj = jnp.array(a), jnp.array(b)
    np.testing.assert_array_equal(np.asarray(modmul.add(f, aj, bj)),
                                  f.add(a, b))
    np.testing.assert_array_equal(np.asarray(modmul.sub(f, aj, bj)),
                                  f.sub(a, b))
    np.testing.assert_array_equal(np.asarray(modmul.mul(f, aj, bj)),
                                  f.mul(a, b))
    c = f.rand(1024, rng).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(modmul.axpy(f, aj, bj, jnp.array(c))), f.axpy(a, b, c))
    # normalize of arbitrary int32
    x = rng.integers(-(2**31), 2**31, 1024).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(modmul.normalize(f, jnp.array(x))), f.normalize(x))
    # scalar inverse
    got = int(np.asarray(modmul.inv_scalar(f, jnp.int32(a[5] or 1))))
    assert f.mul(got, int(a[5] or 1)) == 1


@pytest.mark.parametrize("p", TIER_C_PRIMES)
def test_tier_c_limbs_and_matmul(p, rng):
    import jax.numpy as jnp

    from spasm_tpu.ops import modmul
    from spasm_tpu.ops.matmul import modmatmul_jit

    f = Field(p)
    nl = num_limbs(p)
    xs = f.rand(1000, rng).astype(np.int32)
    xs[0], xs[1] = f.halfp, f.mhalfp
    limbs = np.asarray(modmul.to_limbs(f, jnp.array(xs), nl)).astype(
        np.int64)
    assert limbs.min() >= -128 and limbs.max() <= 127
    recon = sum(limbs[:, i] * 256**i for i in range(nl))
    np.testing.assert_array_equal(recon, xs)
    a = f.rand((24, 50), rng)
    b = f.rand((50, 16), rng)
    want = f.normalize(a.astype(object) @ b.astype(object))
    got = np.asarray(modmatmul_jit(f, jnp.array(a, jnp.int32),
                                   jnp.array(b, jnp.int32)))
    np.testing.assert_array_equal(got, want.astype(np.int64))
