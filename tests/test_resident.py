"""Device-resident FL rounds (ops/resident): parity with the host round
loop on rank, canonical RREF and kernels; overflow fallback."""

import numpy as np
import pytest

import spasm_tpu as st
from spasm_tpu import SparseGFp, echelonize, field, kernel
from spasm_tpu.solve import rref_of_U

F = field(42013)


@pytest.mark.parametrize("n,m,d", [(200, 200, 0.02), (150, 260, 0.03),
                                   (260, 150, 0.03), (500, 500, 0.006)])
def test_resident_rank_rref_parity(rng, n, m, d):
    A = SparseGFp.rand(F, n, m, d, rng)
    fa = echelonize(A, device_rounds=True)
    fb = echelonize(A, device_rounds=False)
    assert fa.r == fb.r
    assert rref_of_U(fa) == rref_of_U(fb)


def test_resident_kernel_parity(rng):
    A = SparseGFp.rand(F, 300, 260, 0.015, rng)
    assert kernel(A, device_rounds=True) == kernel(A, device_rounds=False)


def test_resident_structured(rng):
    # homology-like: block bidiagonal structure, all-structural pivots
    import scipy.sparse as sp

    n = 400
    rows = np.concatenate([np.arange(n), np.arange(n)])
    cols = np.concatenate([np.arange(n), (np.arange(n) + 1) % n])
    vals = np.concatenate([np.ones(n), -np.ones(n)]).astype(np.int64)
    A = SparseGFp.from_scipy(
        sp.csr_matrix((vals, (rows, cols)), shape=(n, n)), F.p)
    fa = echelonize(A, device_rounds=True)
    assert fa.r == n - 1  # circulant difference matrix: rank n-1


def test_resident_tier_b(rng):
    # tier-B prime (p > 92681): device waves use the 16x16 split multiply
    f2 = field(2147483629)  # < 2**31
    A = SparseGFp.rand(f2, 120, 120, 0.03, rng)
    fa = echelonize(A, device_rounds=True)
    fb = echelonize(A, device_rounds=False)
    assert fa.r == fb.r


def test_resident_big_p_disabled(rng):
    # p >= 2**31: device arithmetic unsupported -> silently host path
    f2 = field(4294967291)
    A = SparseGFp.rand(f2, 60, 60, 0.05, rng)
    fa = echelonize(A, device_rounds=True)
    fb = echelonize(A, device_rounds=False)
    assert fa.r == fb.r


def test_resident_manual_only_default():
    # The option is experimental/manual-only: the shipped default must be
    # off (the resident waves lose to the host loop at every validated
    # pool size — see EchelonizeOptions.device_rounds docstring).
    from spasm_tpu.echelonize import EchelonizeOptions, _device_rounds_enabled
    opts = EchelonizeOptions()
    assert opts.device_rounds is False
    # When forced, the gate must be reachable for in-range primes.
    opts.device_rounds = True
    A = SparseGFp.rand(F, 20, 20, 0.1, np.random.default_rng(0))
    assert _device_rounds_enabled(opts, F, A.to_scipy())


def test_resident_L_falls_back(rng):
    A = SparseGFp.rand(F, 150, 150, 0.03, rng)
    fa = echelonize(A, device_rounds=True, L=True)  # L -> host loop
    assert fa.L @ fa.U == A
