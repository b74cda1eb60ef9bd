"""Round-granular checkpoint / resume + profiling hooks."""

import numpy as np
import pytest

import spasm_tpu as st
from spasm_tpu import SparseGFp, echelonize, field
from spasm_tpu.solve import rref_of_U

F = field(42013)


def test_checkpoint_resume_equivalence(rng, tmp_path):
    A = SparseGFp.rand(F, 400, 400, 0.01, rng)  # sparse: does rounds
    path = str(tmp_path / "state.npz")
    # run with checkpointing: state saved after each round
    f_full = echelonize(A, checkpoint=path, max_round=3)
    # resume from the saved state (post last round) and finish again
    f_res = echelonize(A, resume=path, max_round=3)
    assert f_res.r == f_full.r
    assert rref_of_U(f_res) == rref_of_U(f_full)


def test_checkpoint_resume_midway(rng, tmp_path):
    A = SparseGFp.rand(F, 400, 400, 0.01, rng)
    p1 = str(tmp_path / "r1.npz")
    # stop after one round, checkpointing
    f1 = echelonize(A, checkpoint=p1, max_round=1)
    # resume and allow more rounds
    f2 = echelonize(A, resume=p1, max_round=3)
    f_ref = echelonize(A, max_round=3)
    assert f2.r == f_ref.r == f1.r
    assert rref_of_U(f2) == rref_of_U(f_ref)


def test_checkpoint_wrong_prime(rng, tmp_path):
    A = SparseGFp.rand(F, 20, 20, 0.2, rng)
    path = str(tmp_path / "s.npz")
    echelonize(A, checkpoint=path, max_round=1)
    B = SparseGFp.rand(field(65537), 20, 20, 0.2, rng)
    with pytest.raises(ValueError):
        echelonize(B, resume=path)


def test_checkpoint_with_L(rng, tmp_path):
    from spasm_tpu.solve import solve

    A = SparseGFp.rand(F, 400, 400, 0.01, rng)
    path = str(tmp_path / "l.npz")
    echelonize(A, checkpoint=path, L=True, max_round=2)
    fact = echelonize(A, resume=path, L=True, max_round=2)
    assert fact.L @ fact.U == A
    # reduced-round slot segments (lp_order) must survive the resume
    ref = echelonize(A, L=True, max_round=2)
    if ref.lp_order is not None:
        np.testing.assert_array_equal(fact.lp_order, ref.lp_order)
    x0 = F.rand(A.n, rng)
    b = F.normalize(x0 @ A.to_dense().astype(np.int64))
    x = solve(fact, b)
    assert x is not None
    np.testing.assert_array_equal(
        F.normalize(x @ A.to_dense().astype(np.int64)), b)


def test_dense_finish_checkpoint_resume(rng, tmp_path, monkeypatch):
    """Block-granular dense-finish checkpoint: kill the run mid-finish,
    resume from the sidecar, get the identical factorization — without
    redoing the completed blocks."""
    import importlib

    from spasm_tpu import echelonize as ech_fn
    from spasm_tpu.ops import dense as dense_ops

    # the package rebinds the name `spasm_tpu.echelonize` to the function;
    # importlib gets the module (for DENSE_CKPT_INTERVAL_S)
    ech_mod = importlib.import_module("spasm_tpu.echelonize")

    A = SparseGFp.rand(F, 500, 400, 0.3, rng)  # dense: finish at round 0
    opts = dict(dense_block_size=64)
    ref = ech_fn(A, **opts)

    path = str(tmp_path / "dense.npz")
    monkeypatch.setattr(ech_mod, "DENSE_CKPT_INTERVAL_S", 0.0)
    calls = {"n": 0}
    real_rref = dense_ops.rref

    def failing_rref(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated preemption")
        return real_rref(*a, **kw)

    monkeypatch.setattr(dense_ops, "rref", failing_rref)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        ech_fn(A, checkpoint=path, **opts)
    import os

    assert os.path.exists(path + ".dense")  # sidecar survived the crash
    monkeypatch.setattr(dense_ops, "rref", real_rref)

    resumed_blocks = {"n": 0}

    def counting_rref(*a, **kw):
        resumed_blocks["n"] += 1
        return real_rref(*a, **kw)

    monkeypatch.setattr(dense_ops, "rref", counting_rref)
    fact = ech_fn(A, resume=path, **opts)
    assert fact.r == ref.r
    assert rref_of_U(fact) == rref_of_U(ref)
    # the resume skipped the already-completed blocks (500/64 = 8 total;
    # 3 completed before the simulated crash)
    assert resumed_blocks["n"] <= 6
    assert not os.path.exists(path + ".dense")  # cleaned after completion


def test_dense_finish_checkpoint_resume_device_loop(rng, tmp_path,
                                                    monkeypatch):
    """The DEVICE streaming block loop saves and resumes the same sidecar:
    shrink the host cutoff and the fused budget so a small matrix takes
    the streaming device path, kill it mid-loop, resume."""
    import importlib
    import os

    from spasm_tpu import echelonize as ech_fn
    from spasm_tpu.ops import dense as dense_ops

    ech_mod = importlib.import_module("spasm_tpu.echelonize")
    monkeypatch.setattr(dense_ops, "HOST_CUTOFF", 1)
    monkeypatch.setattr(dense_ops, "HOST_CUTOFF_BIGP", 1)
    monkeypatch.setattr(dense_ops, "FUSED_BUDGET", 1)  # force streaming
    monkeypatch.setattr(ech_mod, "DENSE_CKPT_INTERVAL_S", 0.0)
    A = SparseGFp.rand(F, 400, 300, 0.3, rng)
    opts = dict(dense_block_size=64)
    ref = ech_fn(A, **opts)

    path = str(tmp_path / "dev.npz")
    calls = {"n": 0}
    real_step = dense_ops.blocked_finish_step

    def failing_step(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated preemption")
        return real_step(*a, **kw)

    monkeypatch.setattr(dense_ops, "blocked_finish_step", failing_step)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        ech_fn(A, checkpoint=path, **opts)
    assert os.path.exists(path + ".dense")
    monkeypatch.setattr(dense_ops, "blocked_finish_step", real_step)
    fact = ech_fn(A, resume=path, **opts)
    assert fact.r == ref.r
    assert rref_of_U(fact) == rref_of_U(ref)
    assert not os.path.exists(path + ".dense")


def test_dense_finish_stale_sidecar_ignored(rng, tmp_path):
    """A sidecar from a DIFFERENT matrix/finish must be ignored, not
    resumed (validated against prime/r0/tail shape/nnz)."""
    from spasm_tpu import checkpoint as ckpt

    A = SparseGFp.rand(F, 300, 250, 0.3, rng)
    path = str(tmp_path / "stale.npz")
    ref = echelonize(A, dense_block_size=64)
    # save a round checkpoint, then plant a mismatching sidecar
    echelonize(A, checkpoint=path, dense_block_size=64)
    ckpt.save_dense_state(path + ".dense", field_p=F.p, r0=999,
                          s_nnz=1, n_s=1, na=1, b0=1,
                          Uh=np.zeros((1, 1), np.int64),
                          piv_cols_loc=[0], piv_rows_glob=[0],
                          dry_blocks=0)
    fact = echelonize(A, resume=path, dense_block_size=64)
    assert fact.r == ref.r
    assert rref_of_U(fact) == rref_of_U(ref)


def test_phase_profiling():
    from spasm_tpu.utils.profiling import phase, phase_records, reset_phases

    reset_phases()
    with phase("outer"):
        with phase("inner"):
            pass
    names = [n for n, _ in phase_records]
    assert names == ["inner", "outer"]


def test_multihost_helpers():
    from spasm_tpu.parallel.multihost import (global_mesh, host_local_rows,
                                              initialize)

    nproc, pid = initialize()
    assert nproc >= 1 and pid == 0
    mesh = global_mesh()
    lo, hi = host_local_rows(100, mesh)
    assert lo == 0 and hi == 100  # single process owns everything


def test_save_load_lu(tmp_path, rng):
    """Whole-factorization persistence (the reference's savable CSR
    factors, SURVEY section 5): solves and kernels work identically on a
    reloaded LU."""
    import spasm_tpu as st
    from spasm_tpu import gesv, kernel

    f = st.field(42013)
    A = st.SparseGFp.rand(f, 120, 100, 0.05, rng)
    fact = st.echelonize(A, L=True)
    path = str(tmp_path / "fact.npz")
    st.save_lu(path, fact)
    fact2 = st.load_lu(path)
    assert fact2.r == fact.r and fact2.U == fact.U and fact2.L == fact.L
    np.testing.assert_array_equal(fact2.qinv, fact.qinv)
    if fact.lp_order is None:
        assert fact2.lp_order is None
    else:
        np.testing.assert_array_equal(fact2.lp_order, fact.lp_order)
    assert fact2.L @ fact2.U == A
    X0 = st.SparseGFp.rand(f, 3, 120, 0.1, rng)
    B = X0 @ A
    X, ok = gesv(fact2, B)
    assert ok.all() and X @ A == B
    assert kernel(fact2) == kernel(fact)
