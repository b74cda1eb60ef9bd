"""Row-sharded sparse Schur updates over a device mesh.

The sparse analog of sharded.py's dense rounds (SURVEY.md section 2.11,
item 1): the working matrix's rows are partitioned across the mesh, the
pivot-row block U (selected per round) is replicated — the role the
pivot-row all-gather plays over ICI — and every shard eliminates its rows
independently with the device-resident sparse waves
(ops/sparse_device.wave_eliminate_device).  No cross-shard traffic is
needed during a wave: Schur updates are row-local once U is replicated.

Pivot selection stays a host-global step for now (the sparse structural
search is cheap relative to elimination); a device-side FL election via
segment-min + pmin is the round-2 path to a fully resident loop.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..csr import SparseGFp
from ..field import Field
from ..ops.sparse_device import ell_pack, wave_eliminate_device


def shard_rows(B: SparseGFp, nshards: int, cap_per_shard: int):
    """Partition B's rows evenly into per-shard COO blocks of identical
    static capacity (padding rows = local row count sentinel)."""
    n = B.n
    per = -(-n // nshards)
    i, j, v = B.to_coo()
    rows_l = np.full((nshards, cap_per_shard), per, np.int32)
    cols_l = np.zeros((nshards, cap_per_shard), np.int32)
    vals_l = np.zeros((nshards, cap_per_shard), np.int32)
    for s in range(nshards):
        mask = (i >= s * per) & (i < (s + 1) * per)
        cnt = int(mask.sum())
        if cnt > cap_per_shard:
            raise ValueError("cap_per_shard too small for shard nnz")
        rows_l[s, :cnt] = i[mask] - s * per
        cols_l[s, :cnt] = j[mask]
        vals_l[s, :cnt] = v[mask]
    return rows_l, cols_l, vals_l, per


def sharded_sparse_eliminate(f: Field, mesh: Mesh, U: SparseGFp, piv_cols,
                             levels, B: SparseGFp, cap_factor: int = 8,
                             axis: str = "rows"):
    """Eliminate U's pivot columns from all rows of B, rows sharded over
    the mesh.  Returns the eliminated SparseGFp or None on any shard's
    capacity overflow (caller falls back to the host waves)."""
    nshards = mesh.shape[axis]
    npiv, m = U.shape
    if npiv == 0:
        return B
    per_nnz = max(1, -(-B.nnz // nshards))
    cap = max(1024, 1 << int(cap_factor * per_nnz - 1).bit_length())
    cap_hits = max(256, cap // 8)
    rows_l, cols_l, vals_l, per = shard_rows(B, nshards, cap)

    u_cols, u_vals = ell_pack(U)
    col2piv = np.full(m, -1, np.int64)
    col2piv[np.asarray(piv_cols)] = np.arange(npiv)
    depth = int(np.asarray(levels).max()) + 1

    sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    rows_d = jax.device_put(jnp.asarray(rows_l), sharding)
    cols_d = jax.device_put(jnp.asarray(cols_l), sharding)
    vals_d = jax.device_put(jnp.asarray(vals_l), sharding)
    uc = jax.device_put(jnp.asarray(u_cols, jnp.int32), rep)
    uv = jax.device_put(jnp.asarray(u_vals, jnp.int32), rep)
    pcd = jax.device_put(jnp.asarray(np.asarray(piv_cols), jnp.int32), rep)
    lvd = jax.device_put(jnp.asarray(np.asarray(levels), jnp.int32), rep)
    c2p = jax.device_put(jnp.asarray(col2piv, jnp.int32), rep)

    def body(r_l, c_l, v_l, uc_, uv_, pc_, lv_, c2p_):
        rr, cc, vv, nnz, ovf = wave_eliminate_device(
            f, cap, cap_hits, depth, r_l[0], c_l[0], v_l[0],
            uc_, uv_, pc_, lv_, c2p_, per)
        return (rr[None], cc[None], vv[None], nnz[None], ovf[None])

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(), P(), P(), P(), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(axis), P(axis)))
    rr, cc, vv, nnz, ovf = fn(rows_d, cols_d, vals_d, uc, uv, pcd, lvd, c2p)
    if bool(np.asarray(ovf).any()):
        return None
    rr = np.asarray(rr)
    cc = np.asarray(cc)
    vv = np.asarray(vv)
    out_i, out_j, out_v = [], [], []
    for s in range(nshards):
        keep = rr[s] < per
        out_i.append(rr[s][keep].astype(np.int64) + s * per)
        out_j.append(cc[s][keep].astype(np.int64))
        out_v.append(vv[s][keep].astype(np.int64))
    return SparseGFp.from_coo(
        f, B.n, m, np.concatenate(out_i), np.concatenate(out_j),
        np.concatenate(out_v), sum_duplicates=False)
