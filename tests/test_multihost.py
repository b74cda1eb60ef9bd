"""Multi-host helpers (parallel/multihost): single-process semantics and
mesh/ownership math on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from spasm_tpu.parallel import multihost


def test_initialize_single_process_noop():
    nproc, pid = multihost.initialize()
    assert nproc == jax.process_count() == 1
    assert pid == jax.process_index() == 0


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.shape["rows"] == len(jax.devices())
    assert list(mesh.axis_names) == ["rows"]


def test_host_local_rows_partition():
    mesh = multihost.global_mesh()
    n = 103  # deliberately not divisible by the mesh size
    lo, hi = multihost.host_local_rows(n, mesh)
    # single process owns every device, hence every row
    assert (lo, hi) == (0, n)
    # ownership is consistent with even sharding padded to the mesh
    nshards = mesh.shape["rows"]
    per = -(-n // nshards)
    assert per * nshards >= n


def test_host_local_rows_respects_device_order():
    mesh = multihost.global_mesh()
    # all devices belong to process 0 -> the range is contiguous from 0
    lo, hi = multihost.host_local_rows(64, mesh)
    assert lo == 0 and hi == 64
