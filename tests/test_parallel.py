"""Distributed elimination over a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from spasm_tpu.field import field
from spasm_tpu.parallel.sharded import (distributed_rank,
                                        elimination_round, make_mesh)

F = field(42013)


def dense_rank_oracle(p, X):
    X = [[int(v) % p for v in row] for row in np.asarray(X)]
    n, m = len(X), len(X[0]) if len(X) else 0
    rank = 0
    for j in range(m):
        piv = next((i for i in range(rank, n) if X[i][j] % p), None)
        if piv is None:
            continue
        X[rank], X[piv] = X[piv], X[rank]
        inv = pow(X[rank][j], p - 2, p)
        X[rank] = [(v * inv) % p for v in X[rank]]
        for i in range(n):
            if i != rank and X[i][j]:
                c = X[i][j]
                X[i] = [(a - c * b) % p for a, b in zip(X[i], X[rank])]
        rank += 1
    return rank


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_round_eliminates_pivot_columns(mesh, rng):
    n, m = 64, 96
    X = F.rand((n, m), rng).astype(np.int32)
    Xd = jax.device_put(X, NamedSharding(mesh, P("rows", None)))
    X2, U, cols, valid, npiv = jax.jit(
        lambda x: elimination_round(F, mesh, x, panel=16))(Xd)
    assert int(npiv) > 0
    pc = np.asarray(cols)[np.asarray(valid)]
    got = np.asarray(X2)
    assert not got[:, pc].any()
    # remaining rows stay in the row space: rank(original) ==
    # npiv + rank(remaining)
    r_orig = dense_rank_oracle(F.p, X)
    r_rest = dense_rank_oracle(F.p, got)
    assert r_orig == int(npiv) + r_rest


def test_distributed_rank_full(mesh, rng):
    X = F.rand((48, 48), rng)
    assert distributed_rank(F, mesh, X, panel=16) == dense_rank_oracle(
        F.p, X)


def test_distributed_rank_deficient(mesh, rng):
    A = F.rand((40, 6), rng)
    B = F.rand((6, 32), rng)
    X = F.normalize(A @ B)
    assert distributed_rank(F, mesh, X, panel=8) == dense_rank_oracle(
        F.p, X)


def test_distributed_rank_shard_count_invariant(rng):
    # same result on 1, 2, 4, 8 shards (deterministic election)
    X = F.rand((40, 40), rng)
    want = dense_rank_oracle(F.p, X)
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        assert distributed_rank(F, mesh, X, panel=8) == want


def test_distributed_rank_zero(mesh):
    X = np.zeros((16, 16), np.int64)
    assert distributed_rank(F, mesh, X) == 0
