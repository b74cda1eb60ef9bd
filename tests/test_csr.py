"""SparseGFp container: construction, canonical form, structural ops,
algebra — golden round-trips vs scipy / dense oracles."""

import io

import numpy as np
import pytest
import scipy.sparse as sp

from spasm_tpu.csr import (SparseGFp, Triplet, inverse_permutation, ipvec,
                           pvec, random_permutation)
from spasm_tpu.field import Field, field
from spasm_tpu import io as sio

F = field(42013)


def rand_mat(rng, n=23, m=31, density=0.2, p=42013):
    return SparseGFp.rand(field(p), n, m, density, rng)


def test_from_coo_sums_duplicates():
    a = SparseGFp.from_coo(F, 2, 2, [0, 0, 1], [1, 1, 0], [5, 7, 42013])
    assert a.nnz == 1  # duplicates summed to 12; 42013 = 0 dropped
    assert a[0, 1] == 12
    assert a[1, 0] == 0


def test_from_coo_duplicates_vs_bigint_oracle(rng):
    # heavy-duplicate randomized construction vs an exact big-int oracle
    n, m, k = 40, 30, 4000  # ~3.3 duplicates per cell on average
    i = rng.integers(0, n, k)
    j = rng.integers(0, m, k)
    v = rng.integers(-(10**9), 10**9, k)
    a = SparseGFp.from_coo(F, n, m, i, j, v)
    dense = np.zeros((n, m), dtype=object)
    for r, c, x in zip(i, j, v):
        dense[r, c] += int(x)
    want = F.normalize((dense % 42013).astype(np.int64))
    np.testing.assert_array_equal(a.to_dense(), want)
    # canonical invariants: sorted indices, no stored zeros, balanced range
    assert a.indptr[-1] == np.count_nonzero(want)
    for r in range(n):
        assert np.all(np.diff(a.indices[a.indptr[r]:a.indptr[r + 1]]) > 0)
    assert np.all(a.data != 0)
    assert a.data.max() <= 42013 // 2 and a.data.min() >= -(42013 // 2)


def test_from_coo_empty_and_cancelling():
    e = SparseGFp.from_coo(F, 4, 5, [], [], [])
    assert e.nnz == 0 and e.shape == (4, 5)
    z = SparseGFp.from_coo(F, 5, 5, [1, 1], [2, 2], [3, 42010])
    assert z.nnz == 0  # duplicates sum to 0 mod p and are dropped


def test_canonical_balanced():
    a = SparseGFp.from_coo(F, 1, 3, [0, 0], [2, 0], [42012, 21007])
    # 42012 = -1 balanced, 21007 = -21006 balanced
    assert a[0, 0] == -21006
    assert a[0, 2] == -1
    assert list(a.indices) == [0, 2]  # sorted within row


def test_dense_roundtrip(rng):
    a = rand_mat(rng)
    b = SparseGFp.from_dense(a.to_dense(), 42013)
    assert a == b


def test_scipy_roundtrip(rng):
    a = rand_mat(rng)
    b = SparseGFp.from_scipy(a.to_scipy(), 42013)
    assert a == b


def test_transpose_involution(rng):
    # reference test: double transpose identity (test/runtests.jl:12-15)
    a = rand_mat(rng)
    assert a.T.T == a
    np.testing.assert_array_equal(a.T.to_dense(), a.to_dense().T)


def test_runtests_construction():
    # the reference's 3x4 matrix (test/runtests.jl:3): note the Julia wrapper
    # transposes; we build row-major directly
    m = SparseGFp.from_coo(F, 3, 4, [0, 0, 2, 2], [0, 1, 2, 3], [1, 2, 3, 4])
    want = np.zeros((3, 4), np.int64)
    want[0, 0], want[0, 1], want[2, 2], want[2, 3] = 1, 2, 3, 4
    np.testing.assert_array_equal(m.to_dense(), want)


def test_submatrix(rng):
    a = rand_mat(rng)
    s = a.submatrix(3, 10, 5, 20)
    np.testing.assert_array_equal(s.to_dense(), a.to_dense()[3:10, 5:20])
    s2 = a[range(3, 10), range(5, 20)]
    assert s == s2


def test_select_rows(rng):
    a = rand_mat(rng)
    rows = np.array([5, 2, 2, 17])
    s = a.select_rows(rows)
    np.testing.assert_array_equal(s.to_dense(), a.to_dense()[rows])


def test_select_cols(rng):
    a = rand_mat(rng)
    col_map = np.full(a.m, -1, np.int64)
    keep = np.array([1, 4, 9, 30])
    col_map[keep] = np.arange(keep.size)
    s = a.select_cols(col_map, keep.size)
    np.testing.assert_array_equal(s.to_dense(), a.to_dense()[:, keep])


def test_permute(rng):
    a = rand_mat(rng, 8, 6)
    p = random_permutation(8, rng)
    qinv = random_permutation(6, rng)
    b = a.permute(p, qinv)
    dense = a.to_dense()
    want = dense[p][:, inverse_permutation(qinv)]
    np.testing.assert_array_equal(b.to_dense(), want)


def test_pvec_ipvec(rng):
    p = random_permutation(10, rng)
    b = rng.integers(0, 100, 10)
    np.testing.assert_array_equal(ipvec(p, pvec(p, b)), b)


def test_stack(rng):
    a = rand_mat(rng, 5, 7)
    b = rand_mat(rng, 3, 7)
    v = a.vstack(b)
    np.testing.assert_array_equal(
        v.to_dense(), np.vstack([a.to_dense(), b.to_dense()]))
    c = rand_mat(rng, 5, 4)
    h = a.hstack(c)
    np.testing.assert_array_equal(
        h.to_dense(), np.hstack([a.to_dense(), c.to_dense()]))


def test_algebra(rng):
    a = rand_mat(rng, 9, 9)
    b = rand_mat(rng, 9, 9)
    f = F
    np.testing.assert_array_equal(
        (a + b).to_dense(),
        f.normalize(a.to_dense().astype(np.int64) + b.to_dense()))
    np.testing.assert_array_equal(
        (a - b).to_dense(),
        f.normalize(a.to_dense().astype(np.int64) - b.to_dense()))
    np.testing.assert_array_equal(
        (a * 7).to_dense(), f.normalize(7 * a.to_dense().astype(np.int64)))
    want = f.normalize(a.to_dense().astype(object) @ b.to_dense().astype(object))
    np.testing.assert_array_equal((a @ b).to_dense(), want.astype(np.int64))


def test_matmul_large_prime(rng):
    p = 2**31 - 1
    a = rand_mat(rng, 6, 5, 0.5, p)
    b = rand_mat(rng, 5, 4, 0.5, p)
    f = field(p)
    want = f.normalize(a.to_dense().astype(object) @ b.to_dense().astype(object))
    np.testing.assert_array_equal((a @ b).to_dense(), want.astype(np.int64))


def test_eye_identity(rng):
    a = rand_mat(rng, 6, 6)
    assert SparseGFp.eye(F, 6) @ a == a


def test_triplet():
    t = Triplet(p=42013)
    t.push(0, 0, 1).push(0, 1, 2).push(1, 0, 3).push(1, 1, 6)
    assert t.nnz == 4
    assert (t.n, t.m) == (2, 2)
    a = t.compress()
    np.testing.assert_array_equal(a.to_dense(), [[1, 2], [3, 6]])
    t.transpose_inplace()
    at = t.compress()
    np.testing.assert_array_equal(at.to_dense(), [[1, 3], [2, 6]])


def test_getindex_scalar(rng):
    a = rand_mat(rng)
    d = a.to_dense()
    for i, j in [(0, 0), (5, 7), (22, 30)]:
        assert a[i, j] == d[i, j]


def test_findnzs(rng):
    a = rand_mat(rng, 5, 5, 0.4)
    triples = list(a.findnzs())
    assert len(triples) == a.nnz
    d = np.zeros((5, 5), np.int64)
    for i, j, v in triples:
        d[i, j] = v
    np.testing.assert_array_equal(d, a.to_dense())


# ---------------- I/O ----------------


def test_sms_roundtrip(rng):
    a = rand_mat(rng)
    buf = io.BytesIO()
    sio.save_sms(a, buf)
    buf.seek(0)
    b = sio.load_sms(buf, 42013)
    assert a == b


def test_sms_hash_stable(rng, tmp_path):
    a = rand_mat(rng)
    path = str(tmp_path / "m.sms")
    sio.save_sms(a, path)
    b, digest = sio.load_sms(path, 42013, get_hash=True)
    assert a == b
    assert digest == sio.matrix_hash(a)
    assert len(digest) == 32


def test_sms_negative_values_and_reduction(tmp_path):
    path = str(tmp_path / "m.sms")
    with open(path, "w") as fh:
        fh.write("2 2 M\n1 1 -1\n1 2 42013\n2 1 84027\n0 0 0\n")
    a = sio.load_sms(path, 42013)
    assert a[0, 0] == -1
    assert a[0, 1] == 0  # p reduces to zero, dropped
    assert a[1, 0] == 1  # 2p + 1
    assert a.nnz == 2


def test_pnm(tmp_path, rng):
    a = rand_mat(rng, 50, 40, 0.1)
    for mode, magic in [(1, b"P4"), (2, b"P5"), (3, b"P6")]:
        path = str(tmp_path / f"m{mode}.pnm")
        sio.save_pnm(a, path, 20, 25, mode)
        data = open(path, "rb").read()
        assert data.startswith(magic)


def test_triplet_sms(rng):
    t = Triplet(p=42013)
    t.push(0, 0, 1).push(1, 1, -5)
    buf = io.BytesIO()
    sio.save_sms(t, buf)
    buf.seek(0)
    a = sio.load_sms(buf, 42013)
    assert a == t.compress()
