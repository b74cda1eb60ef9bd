"""CLI tools: end-to-end through subprocess pipes (like the reference's own
integration tests, src/SpaSM.jl:1123-1143)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import spasm_tpu as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, stdin_bytes=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [sys.executable, "-m", "spasm_tpu.cli"] + args,
        input=stdin_bytes, capture_output=True, timeout=600, env=env)


@pytest.fixture(scope="module")
def sms_2x2():
    A = st.SparseGFp.from_dense([[1, 3], [2, 6]], 42013)
    return st.dumps_sms(A)


def test_rank_tool(sms_2x2):
    out = run_cli(["rank"], sms_2x2)
    assert out.returncode == 0
    assert b"rank = 1" in out.stderr


def test_kernel_tool(sms_2x2, tmp_path):
    qf = str(tmp_path / "qinv.txt")
    out = run_cli(["kernel", "--qinv-file", qf], sms_2x2)
    assert out.returncode == 0
    import io

    K = st.load_sms(io.BytesIO(out.stdout), 42013)
    np.testing.assert_array_equal(K.to_dense(), [[3, -1]])
    qinv = np.loadtxt(qf, dtype=np.int64)
    assert (qinv >= -1).all() and qinv.size == 2


def test_transpose_tool(sms_2x2):
    out = run_cli(["transpose"], sms_2x2)
    import io

    T = st.load_sms(io.BytesIO(out.stdout), 42013)
    np.testing.assert_array_equal(T.to_dense(), [[1, 2], [3, 6]])


def test_stack_tool(tmp_path, sms_2x2):
    a = str(tmp_path / "a.sms")
    open(a, "wb").write(sms_2x2)
    out = run_cli(["stack", a, a])
    import io

    S = st.load_sms(io.BytesIO(out.stdout), 42013)
    assert S.shape == (4, 2)


def test_vertical_swap_tool(sms_2x2):
    out = run_cli(["vertical_swap"], sms_2x2)
    import io

    S = st.load_sms(io.BytesIO(out.stdout), 42013)
    np.testing.assert_array_equal(S.to_dense(), [[2, 6], [1, 3]])


def test_dm_tool(sms_2x2):
    out = run_cli(["dm"], sms_2x2)
    assert out.returncode == 0
    assert b"blocks =" in out.stdout


def test_bitmap_tool(sms_2x2, tmp_path):
    pnm = str(tmp_path / "out.pgm")
    out = run_cli(["bitmap", "--x", "2", "--y", "2", "--output", pnm],
                  sms_2x2)
    assert out.returncode == 0
    assert open(pnm, "rb").read().startswith(b"P5")


def test_check_cert_tool(tmp_path, rng):
    from spasm_tpu.certificate import (certificate_rank_create,
                                       rank_certificate_save)

    A = st.SparseGFp.rand(st.field(42013), 10, 10, 0.3, rng)
    sms = str(tmp_path / "m.sms")
    st.save_sms(A, sms)
    A2, h = st.load_sms(sms, 42013, get_hash=True)
    cert = certificate_rank_create(A2, st.matrix_hash(A2))
    cf = str(tmp_path / "c.txt")
    rank_certificate_save(cert, cf)
    out = run_cli(["check_cert", "--cert", cf, sms])
    assert out.returncode == 0, out.stderr
    assert b"certificate OK" in out.stderr


def test_solve_tool(tmp_path, rng):
    f = st.field(42013)
    A = st.SparseGFp.rand(f, 8, 10, 0.4, rng)
    X0 = st.SparseGFp.rand(f, 3, 8, 0.5, rng)
    B = X0 @ A
    am = str(tmp_path / "a.sms")
    st.save_sms(A, am)
    out = run_cli(["solve", "--matrix", am], st.dumps_sms(B))
    assert out.returncode == 0, out.stderr
    import io

    X = st.load_sms(io.BytesIO(out.stdout), 42013)
    assert X @ A == B
