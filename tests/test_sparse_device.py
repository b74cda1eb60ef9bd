"""Device-resident sparse wave elimination vs the host scipy waves."""

import numpy as np
import pytest
import scipy.sparse as sp

from spasm_tpu import SparseGFp, field
from spasm_tpu.elimination import compute_levels, wave_eliminate
from spasm_tpu.ops.sparse_device import eliminate_device
from spasm_tpu.pivots import find_structural_pivots

F = field(42013)


def make_case(rng, n=50, m=60, density=0.08):
    A = SparseGFp.rand(F, n, m, density, rng)
    prows, pcols, _ = find_structural_pivots(A)
    npiv = prows.size
    S = A.to_scipy()
    Up = sp.csr_matrix(S[prows])
    vals = np.asarray(Up[np.arange(npiv), pcols]).ravel()
    scales = F.inv(vals)
    row_of = np.repeat(np.arange(npiv), np.diff(Up.indptr))
    Up.data = F.normalize(Up.data * scales[row_of])
    U = SparseGFp.from_scipy(Up, F.p)
    levels = compute_levels(U, pcols)
    rest = np.setdiff1d(np.arange(n), prows)
    B = SparseGFp.from_scipy(sp.csr_matrix(S[rest]), F.p)
    return U, pcols, levels, B


def test_device_matches_host(rng):
    U, pcols, levels, B = make_case(rng)
    got = eliminate_device(F, U, pcols, levels, B)
    assert got is not None, "capacity overflow unexpected at this size"
    want_sp, _ = wave_eliminate(F, U.to_scipy(), pcols, levels,
                                B.to_scipy())
    want = SparseGFp.from_scipy(want_sp, F.p)
    assert got == want
    # all pivot columns eliminated
    assert not np.isin(got.indices, pcols).any()


def test_device_multilevel(rng):
    # force deeper elimination DAGs with a denser matrix
    U, pcols, levels, B = make_case(rng, 40, 40, 0.25)
    assert levels.max() >= 1  # multi-wave case
    got = eliminate_device(F, U, pcols, levels, B)
    assert got is not None
    want_sp, _ = wave_eliminate(F, U.to_scipy(), pcols, levels,
                                B.to_scipy())
    assert got == SparseGFp.from_scipy(want_sp, F.p)


def test_device_overflow_detected(rng):
    U, pcols, levels, B = make_case(rng, 60, 60, 0.2)
    # absurdly small capacity must report overflow, not wrong results
    got = eliminate_device(F, U, pcols, levels, B, cap_factor=0.001,
                           cap_hits=4)
    assert got is None


def test_device_empty_pivots(rng):
    B = SparseGFp.rand(F, 10, 12, 0.3, rng)
    U = SparseGFp.zeros(F, 0, 12)
    got = eliminate_device(F, U, np.zeros(0, np.int64),
                           np.zeros(0, np.int64), B)
    assert got == B
