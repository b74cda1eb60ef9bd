"""Structured homology-style matrices: boundary maps of the full simplex
have combinatorially known ranks (the real workload class of the
reference: boundary matrices where exact arithmetic is mandatory)."""

import itertools

import numpy as np
import pytest

from spasm_tpu import SparseGFp, echelonize, field, kernel, rank
from spasm_tpu.blocks import block_decompose, rank_blocks

F = field(42013)


def simplex_boundary(n_vertices, k, p=42013):
    """The k-th boundary matrix of the full simplex on n_vertices:
    rows = k-faces (size k+1 subsets), cols = (k-1)-faces, entries ±1.
    Known: rank = C(n_vertices - 1, k)."""
    rows = list(itertools.combinations(range(n_vertices), k + 1))
    cols = list(itertools.combinations(range(n_vertices), k))
    col_idx = {c: i for i, c in enumerate(cols)}
    ii, jj, vv = [], [], []
    for ri, face in enumerate(rows):
        for t in range(k + 1):
            sub = face[:t] + face[t + 1:]
            ii.append(ri)
            jj.append(col_idx[sub])
            vv.append((-1) ** t)
    return SparseGFp.from_coo(field(p), len(rows), len(cols), ii, jj, vv)


def binom(n, k):
    from math import comb

    return comb(n, k)


@pytest.mark.parametrize("n,k", [(6, 2), (7, 3), (8, 3), (9, 4)])
def test_simplex_boundary_rank(n, k):
    A = simplex_boundary(n, k)
    want = binom(n - 1, k)
    assert rank(A) == want
    # chain complex property: boundary of boundary is zero
    if k >= 2:
        B = simplex_boundary(n, k - 1)
        assert (A @ B).nnz == 0


def test_simplex_kernel_dimension():
    # ker dim = #cols - rank of the TRANSPOSE map ... for the right-kernel
    # of the k-boundary: m - r with m = C(n, k)
    n, k = 8, 3
    A = simplex_boundary(n, k)
    r = rank(A)
    K = kernel(A)
    assert K.shape == (A.m - r, A.m)
    assert (A @ K.T).nnz == 0


def test_two_component_complex():
    # disjoint union of two simplices -> block structure; ranks add
    n1, n2, k = 6, 5, 2
    A1 = simplex_boundary(n1, k)
    A2 = simplex_boundary(n2, k)
    n, m = A1.n + A2.n, A1.m + A2.m
    i1, j1, v1 = A1.to_coo()
    i2, j2, v2 = A2.to_coo()
    A = SparseGFp.from_coo(
        F, n, m,
        np.concatenate([i1, i2 + A1.n]),
        np.concatenate([j1, j2 + A1.m]),
        np.concatenate([v1, v2]))
    blocks = block_decompose(A)
    assert len(blocks) == 2
    assert rank_blocks(blocks) == rank(A) == binom(n1 - 1, k) + binom(
        n2 - 1, k)


def test_boundary_mod_small_primes():
    # exactness across characteristic: simplex homology vanishes for all p
    for p in (2, 3, 5, 7):
        if p == 2:
            continue  # framework needs p > 2 (reference too)
        A = simplex_boundary(7, 3, p)
        assert rank(A) == binom(6, 3)


def test_fixtures_vectorized_builder():
    """fixtures.simplex_boundary (vectorized, colex numbering) matches the
    loop-built boundary up to row/column permutation and composes to zero
    across dimensions (chain complex)."""
    from math import comb

    from spasm_tpu import rank
    from spasm_tpu.fixtures import expected_boundary_rank, simplex_boundary

    B = simplex_boundary(9, 3)
    assert B.shape == (comb(9, 4), comb(9, 3))
    assert B.nnz == comb(9, 4) * 4
    assert rank(B) == expected_boundary_rank(9, 3) == comb(8, 3)
    A1 = simplex_boundary(9, 2).to_dense().astype(np.int64)
    A2 = simplex_boundary(9, 3).to_dense().astype(np.int64)
    assert not ((A2 @ A1) % 42013).any()
