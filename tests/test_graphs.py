"""Matching, structural rank, DM, SCC, Block decomposition."""

import numpy as np
import pytest

from spasm_tpu import SparseGFp, field
from spasm_tpu.blocks import (assemble, assemble_kernel, block_decompose,
                              echelonize_blocks, kernel_blocks, rank_blocks,
                              sparse_triangular_solve_blocks)
from spasm_tpu.graphs import (DM, dulmage_mendelsohn, maximum_matching,
                              strongly_connected_components, structural_rank)
from spasm_tpu.solve import rank

F = field(42013)


def test_matching_simple():
    A = SparseGFp.from_dense([[1, 0, 0], [1, 1, 0], [0, 0, 0]], 42013)
    size, jmatch, imatch = maximum_matching(A)
    assert size == 2
    # consistency
    for i, j in enumerate(jmatch):
        if j >= 0:
            assert imatch[j] == i
            assert A[i, int(j)] != 0


def test_structural_rank_bounds(rng):
    A = SparseGFp.rand(F, 20, 25, 0.1, rng)
    sr = structural_rank(A)
    assert rank(A) <= sr <= min(20, 25)


def test_structural_rank_full():
    A = SparseGFp.eye(F, 5)
    assert structural_rank(A) == 5


def test_dm_permuted_block_triangular(rng):
    A = SparseGFp.rand(F, 12, 15, 0.15, rng)
    dm = dulmage_mendelsohn(A)
    n, m = A.shape
    assert sorted(dm.p.tolist()) == list(range(n))
    assert sorted(dm.q.tolist()) == list(range(m))
    assert dm.rr[0] == 0 and dm.rr[4] == n
    assert dm.cc[0] == 0 and dm.cc[4] == m
    assert dm.r[0] == 0 and dm.r[-1] == n
    assert dm.c[0] == 0 and dm.c[-1] == m
    assert dm.nb == len(dm.r) - 1
    # coarse structure: the square part is perfectly matched
    sq_rows = dm.rr[2] - dm.rr[1]
    sq_cols = dm.cc[3] - dm.cc[2]
    assert sq_rows == sq_cols
    # DM closure properties in the permuted matrix:
    P = A.to_dense()[dm.p][:, dm.q]
    # vertical rows have entries only in V columns
    assert not P[dm.rr[2]:, :dm.cc[3]].any()
    # H columns have entries only in H rows
    assert not P[dm.rr[1]:, :dm.cc[2]].any()


def test_dm_square_scc_blocks():
    # block upper triangular pattern with 2 diagonal blocks
    d = np.zeros((4, 4), np.int64)
    d[0, 0] = d[0, 1] = d[1, 0] = 1  # block {0,1}
    d[2, 2] = d[3, 3] = d[2, 3] = 1  # block {2},{3}
    d[1, 2] = 1  # coupling upper
    A = SparseGFp.from_dense(d, 42013)
    dm = dulmage_mendelsohn(A)
    P = A.to_dense()[dm.p][:, dm.q]
    # strictly-below-diagonal blocks are empty
    for k in range(dm.nb):
        r1 = dm.r[k + 1]
        c0 = dm.c[k]
        assert not P[r1:, c0:dm.c[k + 1]].any()


def test_scc():
    d = np.zeros((5, 5), np.int64)
    # cycle 0->1->0 ; 2->3->4->2 ; edge 1->2 couples the two SCCs
    d[0, 1] = d[1, 0] = 1
    d[2, 3] = d[3, 4] = d[4, 2] = 1
    d[1, 2] = 1
    for i in range(5):
        d[i, i] = 1
    A = SparseGFp.from_dense(d, 42013)
    dm = strongly_connected_components(A)
    assert dm.nb == 2
    sizes = np.diff(dm.r)
    assert sorted(sizes.tolist()) == [2, 3]
    # topological: permuted matrix is block upper triangular
    P = A.to_dense()[dm.p][:, dm.q]
    r1 = dm.r[1]
    assert not P[r1:, :r1].any()


# ---------------- blocks ----------------


def make_block_diag(rng):
    f = F
    A1 = SparseGFp.rand(f, 4, 5, 0.5, rng)
    A2 = SparseGFp.rand(f, 3, 3, 0.7, rng)
    n, m = 7, 8
    d = np.zeros((n, m), np.int64)
    d[:4, :5] = A1.to_dense()
    d[4:, 5:] = A2.to_dense()
    # interleave rows/cols to make components non-contiguous
    rp = np.array([0, 4, 1, 5, 2, 6, 3])
    cp = np.array([0, 5, 1, 6, 2, 7, 3, 4])
    return SparseGFp.from_dense(d[rp][:, cp], 42013)


def test_block_decompose_roundtrip(rng):
    A = make_block_diag(rng)
    blk = block_decompose(A)
    assert len(blk) >= 2
    B = assemble(blk, F)
    assert B == A


def test_block_rank(rng):
    A = make_block_diag(rng)
    blk = block_decompose(A)
    assert rank_blocks(blk) == rank(A)


def test_block_kernel(rng):
    A = make_block_diag(rng)
    blk = block_decompose(A)
    kb = kernel_blocks(blk)
    K = assemble_kernel(kb, F)
    # every assembled kernel row annihilates A
    assert (A @ K.T).nnz == 0
    from spasm_tpu.solve import kernel
    assert K.shape[0] == kernel(A).shape[0]


def test_block_triangular_solve(rng):
    A = make_block_diag(rng)
    blk = block_decompose(A)
    eblk = echelonize_blocks(blk)
    # consistent RHS: random combination of U rows per block
    import scipy.sparse as sp
    total_u = sum(e.U.shape[0] for e in eblk.blocks)
    X0 = SparseGFp.rand(F, 4, total_u, 0.6, rng)
    # build B = X0 @ blockdiag(U) mapped through col maps
    off = 0
    Bd = np.zeros((4, A.m), np.int64)
    for b, e in enumerate(eblk.blocks):
        cols = np.asarray(eblk.block2col[b])
        Ub = e.U.to_dense().astype(np.int64)
        Bd[:, cols] = F.normalize(
            Bd[:, cols] + X0.to_dense()[:, off:off + e.U.shape[0]] @ Ub)
        off += e.U.shape[0]
    B = SparseGFp.from_dense(F.normalize(Bd), 42013)
    X = sparse_triangular_solve_blocks(eblk, B)
    assert X is not None
    # verify: X @ blockdiag(U) == B through the maps
    off = 0
    got = np.zeros((4, A.m), np.int64)
    Xd = X.to_dense().astype(np.int64)
    for b, e in enumerate(eblk.blocks):
        cols = np.asarray(eblk.block2col[b])
        got[:, cols] = F.normalize(
            got[:, cols] + Xd[:, off:off + e.U.shape[0]]
            @ e.U.to_dense().astype(np.int64))
        off += e.U.shape[0]
    np.testing.assert_array_equal(F.normalize(got), B.to_dense())
