"""Certificates, PRNG, Freivalds verification, SpMV."""

import io

import numpy as np
import pytest

from spasm_tpu import SparseGFp, echelonize, field, matrix_hash
from spasm_tpu.certificate import (RankCertificate, SpasmPRNG,
                                   certificate_rank_create,
                                   certificate_rank_verify,
                                   factorization_verify,
                                   rank_certificate_load,
                                   rank_certificate_save)

F = field(42013)


def test_prng_deterministic():
    a = SpasmPRNG(b"\x01" * 32, 42013, 0)
    b = SpasmPRNG(b"\x01" * 32, 42013, 0)
    assert [a.u32() for _ in range(10)] == [b.u32() for _ in range(10)]
    c = SpasmPRNG(b"\x01" * 32, 42013, 1)
    assert [a.u32() for _ in range(10)] != [c.u32() for _ in range(10)]


def test_prng_zzp_range():
    prng = SpasmPRNG.simple(42013, 7)
    vals = prng.zzp_vector(2000)
    assert vals.min() >= F.mhalfp and vals.max() <= F.halfp
    # roughly uniform: both signs occur
    assert (vals > 0).any() and (vals < 0).any()


def test_spmv(rng):
    A = SparseGFp.rand(F, 15, 22, 0.3, rng)
    x = F.rand(15, rng)
    want = F.normalize(x @ A.to_dense().astype(np.int64))
    np.testing.assert_array_equal(A.xapy(x), want)
    z = F.rand(22, rng)
    want2 = F.normalize(A.to_dense().astype(np.int64) @ z)
    np.testing.assert_array_equal(A.axpy(z), want2)
    # with accumulation
    y = F.rand(22, rng)
    np.testing.assert_array_equal(A.xapy(x, y), F.normalize(want + y))


def test_certificate_roundtrip(rng):
    A = SparseGFp.rand(F, 20, 25, 0.15, rng)
    h = matrix_hash(A)
    cert = certificate_rank_create(A, h)
    assert cert.r == echelonize(A).r
    assert certificate_rank_verify(A, h, cert)


def test_certificate_rejects_wrong_rank(rng):
    A = SparseGFp.rand(F, 15, 15, 0.2, rng)
    h = matrix_hash(A)
    cert = certificate_rank_create(A, h)
    # tamper: claim different rank with truncated data
    bad = RankCertificate(r=cert.r - 1, prime=cert.prime, hash=cert.hash,
                          i=cert.i[:-1], j=cert.j[:-1], x=cert.x[:-1],
                          y=cert.y[:-1])
    assert not certificate_rank_verify(A, h, bad)
    # tamper: wrong hash
    assert not certificate_rank_verify(A, b"\x00" * 32, cert)
    # tamper: perturb a response value
    bad2 = RankCertificate(r=cert.r, prime=cert.prime, hash=cert.hash,
                           i=cert.i, j=cert.j,
                           x=F.normalize(cert.x + 1), y=cert.y)
    assert not certificate_rank_verify(A, h, bad2)


def test_certificate_save_load(rng, tmp_path):
    A = SparseGFp.rand(F, 12, 14, 0.2, rng)
    h = matrix_hash(A)
    cert = certificate_rank_create(A, h)
    path = str(tmp_path / "cert.txt")
    rank_certificate_save(cert, path)
    loaded = rank_certificate_load(path)
    assert loaded.r == cert.r and loaded.prime == cert.prime
    assert loaded.hash == cert.hash
    np.testing.assert_array_equal(loaded.i, cert.i)
    np.testing.assert_array_equal(loaded.x, cert.x)
    assert certificate_rank_verify(A, h, loaded)


def test_factorization_verify(rng):
    A = SparseGFp.rand(F, 18, 20, 0.2, rng)
    fact = echelonize(A, L=True)
    assert factorization_verify(A, fact, seed=3)
    # corrupt U: flip one value
    U2 = fact.U
    d = U2.data.copy()
    d[0] = F.normalize(d[0] + 1)
    import dataclasses

    from spasm_tpu.csr import SparseGFp as S
    U_bad = S(U2.field, U2.n, U2.m, U2.indptr.copy(), U2.indices.copy(), d,
              _canonical=True)
    bad = dataclasses.replace(fact, U=U_bad)
    assert not factorization_verify(A, bad, seed=3)


def test_certificate_rank_deficient(rng):
    B = SparseGFp.rand(F, 20, 4, 0.4, rng)
    C = SparseGFp.rand(F, 4, 18, 0.4, rng)
    A = B @ C
    h = matrix_hash(A)
    cert = certificate_rank_create(A, h)
    assert cert.r <= 4
    assert certificate_rank_verify(A, h, cert)


def test_prng_golden_vectors():
    """The committed golden file pins SpasmPRNG's exact bitstream (the
    (LE, STATE) convention documented in certificate.py); any drift in
    the PRNG breaks cross-verification groundwork (tools/prng_golden.py
    enumerates all candidate conventions for a future libspasm check)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import prng_golden

    with open(prng_golden.GOLDEN) as fh:
        committed = json.load(fh)
    assert committed == prng_golden.build()


def test_zzp_vector_matches_scalar_stream():
    # the vectorized draw must be bit-identical to scalar zzp() calls,
    # including buffer continuity across interleaved scalar/vector draws
    import hashlib

    from spasm_tpu.certificate import SpasmPRNG

    seed = hashlib.sha256(b"stream-test").digest()
    for p in (42013, 3, 65537, 2**31 - 1, 4294967291):
        a = SpasmPRNG(seed, p, seq=7)
        b = SpasmPRNG(seed, p, seq=7)
        ref = [a.zzp() for _ in range(500)]
        got = []
        got.extend(b.zzp_vector(3).tolist())
        got.append(b.zzp())
        got.extend(b.zzp_vector(490).tolist())
        got.extend(b.zzp() for _ in range(6))
        assert got == ref, p
