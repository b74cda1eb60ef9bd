"""Structured fixture generators for the reference's problem domain.

The reference's target workloads are huge homology boundary matrices
(GL7d/relat class, SURVEY.md section 0).  Those exact matrices are not
available in this environment; the k-th boundary matrix of the FULL
simplex on n vertices is the standard stand-in — same chain-complex
structure (d o d = 0), combinatorially known rank C(n-1, k).

``simplex_boundary`` is fully vectorized: faces are ranked by the
combinatorial number system (colex rank of an ascending k-subset
{c_0 < ... < c_{k-1}} is sum_i C(c_i, i+1)), so building the 11.8M-nnz
d8 boundary of the 24-simplex takes ~2 s instead of ~70 s of Python
loops.  Column numbering is colex (a permutation of the lex numbering
used elsewhere) — rank/kernel dimensions are invariant under column
permutation.
"""

from __future__ import annotations

from math import comb

import numpy as np

from .csr import SparseGFp
from .field import DEFAULT_PRIME, field


def simplex_boundary(n: int, k: int, p: int = DEFAULT_PRIME) -> SparseGFp:
    """k-th boundary matrix of the full simplex on n vertices:
    (C(n, k+1), C(n, k)) with k+1 nonzeros per row, exact rank
    C(n-1, k)."""
    if not (0 < k < n):
        raise ValueError(f"need 0 < k < n, got k={k}, n={n}")
    R = _combs_colex(n, k + 1)  # (C(n, k+1), k+1), colex order
    binom = np.zeros((n, k + 2), np.int64)
    for c in range(n):
        for i in range(1, k + 2):
            binom[c, i] = comb(c, i)
    nr = R.shape[0]
    # rows AND columns numbered by colex rank, so boundary matrices of
    # consecutive degrees compose (d o d == 0 across dimensions); R is
    # generated IN colex order, so row ids are implicit
    ii = np.repeat(np.arange(nr, dtype=np.int64), k + 1)
    jj = np.empty(nr * (k + 1), np.int64)
    vv = np.empty(nr * (k + 1), np.int64)
    pos = np.arange(1, k + 1, dtype=np.int64)[None, :]
    for t in range(k + 1):
        F = np.delete(R, t, axis=1)  # (nr, k) ascending k-subsets
        jj[t::k + 1] = binom[F, pos].sum(axis=1)
        vv[t::k + 1] = (-1) ** t
    return SparseGFp.from_coo(field(p), nr, comb(n, k), ii, jj, vv,
                              sum_duplicates=False)


def expected_boundary_rank(n: int, k: int) -> int:
    return comb(n - 1, k)


def _combs_colex(n: int, k: int, _memo=None) -> np.ndarray:
    """All ascending k-subsets of range(n) as a (C(n, k), k) array in
    colex order, built by the vectorized recursion
    combs(n, k) = combs(n-1, k) ++ (combs(n-1, k-1) | {n-1})
    (no Python-level iteration over subsets; the memo lives per top-level
    call so the intermediate tables are freed afterwards)."""
    if _memo is None:
        _memo = {}
    key = (n, k)
    if key in _memo:
        return _memo[key]
    if k == 0:
        out = np.zeros((1, 0), np.int64)
    elif k > n:
        out = np.zeros((0, k), np.int64)
    else:
        a = _combs_colex(n - 1, k, _memo)
        b = _combs_colex(n - 1, k - 1, _memo)
        out = np.vstack([
            a, np.hstack([b, np.full((b.shape[0], 1), n - 1, np.int64)])])
    _memo[key] = out
    return out
