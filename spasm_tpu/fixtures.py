"""Structured fixture generators for the reference's problem domain.

The reference's target workloads are huge homology boundary matrices
(GL7d/relat class, SURVEY.md section 0).  Those exact matrices are not
available in this environment; the k-th boundary matrix of the FULL
simplex on n vertices is the standard stand-in — same chain-complex
structure (d o d = 0), combinatorially known rank C(n-1, k).

``simplex_boundary`` is fully vectorized AND memory-traffic-lean (this
VM's effective memory bandwidth is low, so traffic dominates wall time
at the 53M-nnz d9 scale):

* faces are ranked by the combinatorial number system (colex rank of an
  ascending k-subset {c_0 < ... < c_{k-1}} is sum_i C(c_i, i+1)); the
  subset table is built once in **int8** (vertices < 128);
* the k+1 face ranks of each row come from two binomial gathers and two
  exclusive cumsums (prefix keeps position weights, suffix shifts them
  down) instead of k+1 `np.delete` passes;
* per row the ranks are strictly DECREASING in the removed position t,
  so emitting them reversed yields canonical CSR directly — no 53M-entry
  lexsort.

Row and column numbering is colex (a permutation of the lex numbering) —
rank/kernel dimensions are invariant under the permutation, and boundary
matrices of consecutive degrees still compose (d o d == 0).
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
    import scipy.sparse as sp

    R = _combs_colex(n, k + 1)  # (C(n, k+1), k+1) int8, colex order
    nr = R.shape[0]
    binom = np.zeros((n, k + 2), np.int64)
    for c in range(n):
        for i in range(1, k + 2):
            binom[c, i] = comb(c, i)
    # removing position t from the ascending (k+1)-subset leaves
    # positions i < t with weight C(c_i, i+1) and positions i > t shifted
    # down with weight C(c_i, i):
    #   rank_t = sum_{i<t} C(c_i, i+1) + sum_{i>t} C(c_i, i)
    # rank_t strictly decreases in t (removing a smaller element keeps a
    # colex-larger face), so the reversed row is ascending: canonical CSR.
    # Chunked over row blocks: temporaries stay small and page-warm
    # (first-touch faults are the cost on this VM, utils/hostmem.py).
    indices = np.empty(nr * (k + 1), np.int64)
    sign = np.array([(-1) ** t for t in range(k, -1, -1)], np.int64)
    data = np.tile(sign, nr)
    pos1 = np.arange(1, k + 2, dtype=np.int64)[None, :]
    chunk = 1 << 20
    for r0 in range(0, nr, chunk):
        Rc = R[r0:r0 + chunk]
        A = binom[Rc, pos1]        # C(c_i, i+1)
        B = binom[Rc, pos1 - 1]    # C(c_i, i)
        ranks = np.zeros((Rc.shape[0], k + 1), np.int64)
        np.cumsum(A[:, :-1], axis=1, out=ranks[:, 1:])   # exclusive prefix
        ranks[:, :-1] += B[:, ::-1].cumsum(axis=1)[:, -2::-1]
        indices[r0 * (k + 1):(r0 + Rc.shape[0]) * (k + 1)] = (
            ranks[:, ::-1].reshape(-1))
    indptr = np.arange(nr + 1, dtype=np.int64) * (k + 1)
    S = sp.csr_matrix((data, indices, indptr), shape=(nr, comb(n, k)))
    # +-1 entries are already balanced mod any p > 2
    return SparseGFp.from_scipy(S, field(p).p, assume_canonical=True)


def expected_boundary_rank(n: int, k: int) -> int:
    return comb(n - 1, k)


def _combs_colex(n: int, k: int, _memo=None) -> np.ndarray:
    """All ascending k-subsets of range(n) as a (C(n, k), k) **int8**
    array in colex order, built by the vectorized recursion
    combs(n, k) = combs(n-1, k) ++ (combs(n-1, k-1) | {n-1})
    (no Python-level iteration over subsets; the memo lives per top-level
    call so the intermediate tables are freed afterwards).  int8 holds
    n <= 128 — an 8x traffic cut that matters at C(26, 10) scale."""
    if n > 127:
        raise ValueError("int8 subset table supports n <= 127")
    if _memo is None:
        _memo = {}
    key = (n, k)
    if key in _memo:
        return _memo[key]
    if k == 0:
        out = np.zeros((1, 0), np.int8)
    elif k > n:
        out = np.zeros((0, k), np.int8)
    else:
        a = _combs_colex(n - 1, k, _memo)
        b = _combs_colex(n - 1, k - 1, _memo)
        nb = b.shape[0]
        out = np.empty((a.shape[0] + nb, k), np.int8)
        out[:a.shape[0]] = a
        out[a.shape[0]:, :k - 1] = b
        out[a.shape[0]:, k - 1] = n - 1
    _memo[key] = out
    return out
