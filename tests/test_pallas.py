"""Fused Pallas modular matmul — kernel semantics via interpret mode on the
CPU mesh (the same kernel runs compiled on TPU)."""

import numpy as np
import pytest

from spasm_tpu.field import Field, field


@pytest.mark.parametrize("p", [5, 257, 1031, 42013, 92681])
def test_pallas_modmatmul_exact(p, rng):
    import jax.numpy as jnp

    from spasm_tpu.ops.pallas_matmul import _MIN_P, modmatmul_pallas, supported

    f = field(p)
    # below _MIN_P the float-Barrett epilogue's quotient error can exceed
    # one clamp, so supported() is False and modmatmul dispatches to the
    # jnp path; the kernel itself is still exact at these sizes (small
    # accumulators), which this test also locks in.
    assert supported(f) == (p >= _MIN_P)
    n, k, m = 130, 260, 140  # deliberately unaligned
    a = f.rand((n, k), rng)
    b = f.rand((k, m), rng)
    got = np.asarray(modmatmul_pallas(f, jnp.asarray(a, jnp.int32),
                                      jnp.asarray(b, jnp.int32)))
    want = f.normalize(a.astype(object) @ b.astype(object)).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_pallas_unsupported_prime_falls_back(rng):
    from spasm_tpu.ops.matmul import modmatmul
    import jax.numpy as jnp

    f = field(104729)  # tier B
    a = f.rand((8, 8), rng)
    b = f.rand((8, 8), rng)
    got = np.asarray(modmatmul(f, jnp.asarray(a, jnp.int32),
                               jnp.asarray(b, jnp.int32)))
    want = f.normalize(a.astype(object) @ b.astype(object)).astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_mod_balanced_f32_exact(rng):
    import jax
    import jax.numpy as jnp

    from spasm_tpu.ops.pallas_matmul import _mod_balanced_f32

    p = 42013
    f = Field(p)
    xs = np.concatenate([
        rng.integers(-2**31 + 1, 2**31 - 1, 100000),
        np.array([2**31 - 1, -2**31 + 1, p // 2, -(p // 2), p, -p, 0,
                  p // 2 + 1, 3 * p // 2]),
    ]).astype(np.int32)
    got = np.asarray(jax.jit(lambda x: _mod_balanced_f32(p, x))(
        jnp.asarray(xs)))
    want = f.normalize(xs.astype(np.int64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("p", [104729, 16777213, 2147483629])
def test_pallas_panel_tier_b_matches_fallback(p, rng):
    # tier-B scale-free panel kernel (uint32 split multiply) must
    # reproduce the XLA fallback bit-exactly: same panel, correction G,
    # pivot bookkeeping
    import jax.numpy as jnp

    from spasm_tpu.ops.dense import _panel_eliminate
    from spasm_tpu.ops.pallas_panel import _panel_tier_b_jit, supported

    f = field(p)
    n, c = 64, 32
    assert supported(f, n)
    P = jnp.asarray(f.rand((n, c), rng).astype(np.int32))
    # a few planted zeros + a pre-used pivot row exercise the masks
    P = P.at[3, 0].set(0).at[10, :].set(0)
    ispiv = jnp.zeros(n, bool).at[5].set(True)
    got = _panel_tier_b_jit(f, c, P, ispiv, 0)
    want = _panel_eliminate(f, P, ispiv, 0, c)
    for g, w, name in zip(got, want, ("P", "G", "prow", "pcol",
                                      "pfound", "ispiv")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), name)


def test_mulmod_u_exact(rng):
    # elementwise uint32 split multiply across the tier-B range
    import jax
    import jax.numpy as jnp

    from spasm_tpu.ops.pallas_panel import _mulmod_u

    for p in (92683, 104729, 1 << 24, 2147483629, 2147483647):
        xs = rng.integers(0, p, 20000).astype(np.uint32)
        ys = rng.integers(0, p, 20000).astype(np.uint32)
        got = np.asarray(jax.jit(
            lambda x, y, p=p: _mulmod_u(p, x, y))(jnp.asarray(xs),
                                                  jnp.asarray(ys)))
        want = ((xs.astype(object) * ys.astype(object)) % p).astype(
            np.uint32)
        np.testing.assert_array_equal(got, want)


def test_pallas_matmul_tier_b_exact(rng):
    # full tier-B range incl. the top: unsigned split epilogue must be
    # exact vs the big-int oracle
    import jax.numpy as jnp

    from spasm_tpu.ops.pallas_matmul import modmatmul_pallas, supported

    for p in (100003, 16777213, 2147483629, 2147483647):
        f = field(p)
        assert supported(f)
        a = jnp.asarray(f.rand((160, 192), rng).astype(np.int32))
        b = jnp.asarray(f.rand((192, 130), rng).astype(np.int32))
        want = f.normalize(
            np.asarray(a).astype(object) @ np.asarray(b).astype(object))
        got = np.asarray(modmatmul_pallas(f, a, b))
        np.testing.assert_array_equal(got, want)
