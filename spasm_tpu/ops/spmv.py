"""Device-side SpMV over GF(p) (``spasm_spmv.c`` analog,
src/SpaSM.jl:632-658) — COO segment-sum formulation.

Products are pre-reduced to balanced form (|v| <= p/2), then accumulated in
int32 with static chunking so a segment can never overflow: a chunk of
C = 2**30 // (p//2) terms keeps any partial segment sum below 2**31, and
chunks combine with modular adds.  Used by the certificate / Freivalds
verification path on device and as the building block for sharded SpMV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from ..field import Field
from . import modmul


class DeviceCOO:
    """A sparse GF(p) matrix resident on device in COO form (static nnz)."""

    def __init__(self, f: Field, n, m, rows, cols, vals):
        self.field = f
        self.n = int(n)
        self.m = int(m)
        self.rows = jnp.asarray(rows, jnp.int32)
        self.cols = jnp.asarray(cols, jnp.int32)
        self.vals = jnp.asarray(vals, jnp.int32)

    @classmethod
    def from_csr(cls, A):
        i, j, v = A.to_coo()
        return cls(A.field, A.n, A.m, i, j, v)


def _chunk_terms(f: Field) -> int:
    return max(1, (1 << 30) // max(1, f.halfp))


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _segment_accumulate(f: Field, nseg: int, chunk: int, seg_ids, terms):
    """sum_{k in segment} terms[k] mod p, exact, via chunked segment_sum."""
    nnz = terms.shape[0]
    nchunks = -(-nnz // chunk)
    pad = nchunks * chunk - nnz
    if pad:
        terms = jnp.pad(terms, (0, pad))
        seg_ids = jnp.pad(seg_ids, (0, pad), constant_values=nseg)
    terms = terms.reshape(nchunks, chunk)
    seg_ids = seg_ids.reshape(nchunks, chunk)

    def body(c, acc):
        part = jax.ops.segment_sum(terms[c], seg_ids[c],
                                   num_segments=nseg + 1)
        return modmul.add(f, acc, modmul.normalize(f, part))

    acc0 = jnp.zeros(nseg + 1, jnp.int32)
    return jax.lax.fori_loop(0, nchunks, body, acc0)[:nseg]


def xapy(A: DeviceCOO, x, y=None):
    """y <- x @ A + y on device."""
    f = A.field
    x = jnp.asarray(x, jnp.int32)
    prod = modmul.mul(f, A.vals, x[A.rows])
    out = _segment_accumulate(f, A.m, _chunk_terms(f), A.cols, prod)
    if y is not None:
        out = modmul.add(f, out, jnp.asarray(y, jnp.int32))
    return out


def axpy(A: DeviceCOO, x, y=None):
    """y <- A @ x + y on device."""
    f = A.field
    x = jnp.asarray(x, jnp.int32)
    prod = modmul.mul(f, A.vals, x[A.cols])
    out = _segment_accumulate(f, A.n, _chunk_terms(f), A.rows, prod)
    if y is not None:
        out = modmul.add(f, out, jnp.asarray(y, jnp.int32))
    return out
