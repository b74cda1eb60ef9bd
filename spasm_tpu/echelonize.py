"""Multi-round echelonization driver — the heart of the framework.

Mirrors the observable algorithm of ``spasm_echelonize``
(src/SpaSM.jl:815-866, README.md:19-38):

    round k: structural pivot search (FL + greedy completion, pivots.py)
             -> if enough pivots: form the Schur complement of the
                remaining rows and recurse on it
    stop:    not enough pivots (min_pivot_proportion) or max_round
    finish:  by density / aspect ratio: dense device RREF (the FFPACK
             replacement, ops/dense.py) or GPLU-style sparse left-looking
             elimination (host, for very sparse tails)

All elimination runs through the level-wave machinery (elimination.py), so
the global pivot list — structural pivots of every round, then finishing
pivots — is one append-invariant sequence usable as a static elimination
order (no per-row DFS).

The result ``LU`` matches the reference's semantics (src/SpaSM.jl:262-305):
U is r x m with unit pivots located by qinv (qinv[j] = pivot index in
column j or -1), p maps U rows to original A rows, and L (optional,
``opts.L``) satisfies A == L @ U exactly mod p.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .csr import SparseGFp
from .elimination import compute_levels, wave_eliminate
from .field import Field
from .ops import dense as dense_ops
from .pivots import find_structural_pivots
from .sputil import mod_reduce
from .utils.logging import log, push_verbose, wtime


@dataclasses.dataclass
class EchelonizeOptions:
    """The reference's 13-field options struct (src/SpaSM.jl:325-343).
    Defaults chosen to match the reference's observable behavior; flag
    names are kept verbatim."""

    enable_greedy_pivot_search: bool = True
    enable_tall_and_skinny: bool = True
    enable_dense: bool = True
    enable_GPLU: bool = True
    L: bool = False
    complete: bool = False
    min_pivot_proportion: float = 0.1
    max_round: int = 3
    sparsity_threshold: float = 0.05
    dense_block_size: int = 1000
    low_rank_ratio: float = 0.5
    tall_and_skinny_ratio: float = 5.0
    low_rank_start_weight: float = -1.0

    # TPU-specific knob: max dense elements for the device finish
    dense_budget: int = 200_000_000


def parse_echelonize_opts(opts=None, **kwargs) -> EchelonizeOptions:
    opts = dataclasses.replace(opts) if opts else EchelonizeOptions()
    for k, v in kwargs.items():
        if not hasattr(opts, k):
            raise TypeError(f"unknown echelonize option {k!r}")
        setattr(opts, k, v)
    return opts


@dataclasses.dataclass
class LU:
    """Echelonization result (the reference's spasm_lu, src/SpaSM.jl:262).

    U rows are listed in elimination (pivot) order; ``levels`` caches the
    wave schedule for later solves."""

    field: Field
    n: int                 # rows of the original A
    m: int                 # cols of the original A
    r: int                 # rank
    complete: bool
    U: SparseGFp           # (r, m) unit pivots
    qinv: np.ndarray       # (m,) column -> pivot index or -1
    p: np.ndarray          # (r,) pivot index -> original row of A
    piv_cols: np.ndarray   # (r,) pivot index -> column
    L: "SparseGFp | None"  # (n, r) with A == L @ U, if requested
    levels: np.ndarray     # (r,) wave level of each pivot
    # pivots >= dense_piv_start come from the dense (Jordan RREF) finish:
    # their L[p] block is a general invertible matrix, not triangular —
    # solves treat it densely (solve.py).  None = no dense block.
    dense_piv_start: "int | None" = None

    @property
    def rank(self) -> int:
        return self.r

    def __repr__(self):
        return (f"LU: rank {self.r}, complete {self.complete}, "
                f"U {self.U.shape}, L "
                f"{self.L.shape if self.L is not None else None}")


def echelonize(A: SparseGFp, opts: EchelonizeOptions | None = None,
               verbose=False, **kwargs) -> LU:
    """Echelonize A (src/SpaSM.jl:860-866).  `verbose` may be a bool or an
    nnz threshold (reference semantics: verbose = nnz(A) >= threshold)."""
    opts = parse_echelonize_opts(opts, **kwargs)
    if not isinstance(verbose, bool):
        verbose = A.nnz >= verbose
    with push_verbose(verbose):
        return _echelonize_impl(A, opts)


def _echelonize_impl(A: SparseGFp, opts: EchelonizeOptions) -> LU:
    f = A.field
    n, m = A.shape
    t_start = wtime()
    log(f"[echelonize] Start on {n} x {m} matrix with {A.nnz} nnz")

    S = mod_reduce(A.to_scipy(), f)     # current Schur complement
    row_origin = np.arange(n, dtype=np.int64)

    U_blocks: list[sp.csr_matrix] = []  # scaled pivot row blocks
    piv_cols_all: list[np.ndarray] = []
    piv_origin_all: list[np.ndarray] = []
    L_parts: list[tuple] = []           # (rows_orig, piv_idx, value)
    r = 0

    round_idx = 0
    while round_idx < opts.max_round:
        if S.shape[0] == 0 or S.nnz == 0:
            break
        log(f"[echelonize] round {round_idx}")
        Sw = SparseGFp.from_scipy(S, f.p)
        t0 = wtime()
        prows, pcols, counts = find_structural_pivots(
            Sw, enable_greedy=opts.enable_greedy_pivot_search)
        log(f"[pivots] Faugère-Lachartre: {counts['faugere-lachartre']} "
            f"pivots found [{wtime() - t0:.1f}s]")
        log(f"[pivots] greedy cycle-free completion: {counts['greedy']} "
            f"pivots found [{wtime() - t0:.1f}s]")
        log(f"[pivots] {prows.size} pivots found")
        npiv = prows.size
        nrows_active = int((np.diff(S.indptr) > 0).sum())
        if npiv < opts.min_pivot_proportion * max(1, min(nrows_active,
                                                         S.shape[1])):
            log("[echelonize] not enough pivots found; stopping")
            break

        # scale pivot rows to unit pivots
        Upart = S[prows]  # (npiv, m) in pivot order
        piv_vals = np.asarray(
            Upart[np.arange(npiv), pcols]).ravel().astype(np.int64)
        scales = f.inv(piv_vals)
        Upart = sp.csr_matrix(Upart)
        row_of_entry = np.repeat(np.arange(npiv), np.diff(Upart.indptr))
        Upart.data = f.normalize(Upart.data * scales[row_of_entry])

        # Schur complement of the remaining rows vs the new pivot block.
        # New-block levels are self-contained: S rows already have zeros at
        # all earlier pivot columns, so cross-block edges cannot exist here.
        Ublock_w = SparseGFp.from_scipy(Upart, f.p)
        levels_blk = compute_levels(Ublock_w, pcols)
        rest_mask = np.ones(S.shape[0], bool)
        rest_mask[prows] = False
        rest_rows = np.flatnonzero(rest_mask)
        t0 = wtime()
        S_rest = S[rest_rows]
        S_new, C = wave_eliminate(f, Upart, pcols, levels_blk, S_rest,
                                  record_coeffs=opts.L)
        dens = S_new.nnz / max(1, S_new.shape[0] * S_new.shape[1])
        log(f"Schur complement: {S_new.shape[0]} * {S_new.shape[1]} "
            f"[{S_new.nnz} nz / density= {dens:.3f}], "
            f"{wtime() - t0:.1f}s")

        if opts.L:
            # pivot rows: a_orig = pivot_val * u_k  (self coefficient)
            L_parts.append((row_origin[prows], r + np.arange(npiv),
                            piv_vals))
            Cc = C.tocoo()
            L_parts.append((row_origin[rest_rows][Cc.row], r + Cc.col,
                            Cc.data))

        U_blocks.append(Upart)
        piv_cols_all.append(pcols.astype(np.int64))
        piv_origin_all.append(row_origin[prows])
        r += npiv
        S = S_new
        row_origin = row_origin[rest_rows]
        round_idx += 1

    # ---------------- finish ----------------
    if S.shape[0] and S.nnz:
        nrows = int((np.diff(S.indptr) > 0).sum())
        alive_cols = np.unique(S.indices)
        dens = S.nnz / max(1, nrows * alive_cols.size)
        aspect = S.shape[0] / max(1, S.shape[1])
        log(f"[echelonize] finishing; density = {dens:.3f}; "
            f"aspect ratio = {aspect:.1f}")
        dense_elems = nrows * alive_cols.size
        use_dense = (opts.enable_dense and dense_elems <= opts.dense_budget
                     and (dens >= opts.sparsity_threshold
                          or not opts.enable_GPLU
                          or dense_elems <= 1_000_000))
        dense_piv_start = None
        if use_dense:
            blk = _dense_finish(f, S, row_origin, alive_cols, r, opts,
                                L_parts)
            if blk is not None:
                dense_piv_start = r
        else:
            blk = _gplu_finish(f, S, row_origin, r, opts, L_parts)
        if blk is not None:
            Upart, pcols, porig = blk
            U_blocks.append(Upart)
            piv_cols_all.append(pcols)
            piv_origin_all.append(porig)
            r += pcols.size
    else:
        dense_piv_start = None

    # ---------------- assemble ----------------
    if U_blocks:
        U_sp = sp.vstack([sp.csr_matrix(b) for b in U_blocks], format="csr")
        piv_cols = np.concatenate(piv_cols_all)
        p_vec = np.concatenate(piv_origin_all)
    else:
        U_sp = sp.csr_matrix((0, m), dtype=np.int64)
        piv_cols = np.zeros(0, np.int64)
        p_vec = np.zeros(0, np.int64)
    U = SparseGFp.from_scipy(U_sp, f.p)
    qinv = np.full(m, -1, np.int64)
    qinv[piv_cols] = np.arange(r)
    levels = compute_levels(U, piv_cols)

    L = None
    if opts.L:
        # rows of A that eliminated to zero contribute their recorded
        # coefficient rows; all parts were accumulated in L_parts
        if L_parts:
            li = np.concatenate([np.asarray(t[0], np.int64) for t in L_parts])
            lj = np.concatenate([np.asarray(t[1], np.int64) for t in L_parts])
            lv = np.concatenate([np.asarray(t[2], np.int64) for t in L_parts])
        else:
            li = lj = lv = np.zeros(0, np.int64)
        L = SparseGFp.from_coo(f, n, r, li, lj, lv, sum_duplicates=False)

    fact = LU(field=f, n=n, m=m, r=r, complete=False, U=U, qinv=qinv,
              p=p_vec, piv_cols=piv_cols, L=L, levels=levels,
              dense_piv_start=dense_piv_start)
    if opts.complete:
        from .solve import rref_of_U  # cycle-free local import
        # rref_of_U orders rows by pivot column; realign pivot metadata.
        # Against an RREF, any row's elimination coefficients are simply its
        # values at the pivot columns, so L is a column selection of A.
        order = np.argsort(piv_cols, kind="stable")
        qinv_c = np.full(m, -1, np.int64)
        qinv_c[piv_cols[order]] = np.arange(r)
        L_c = None
        if opts.L:
            sel = np.full(m, -1, np.int64)
            sel[piv_cols[order]] = np.arange(r)
            L_c = A.select_cols(sel, r)
        fact = dataclasses.replace(
            fact, U=rref_of_U(fact), complete=True, qinv=qinv_c,
            piv_cols=piv_cols[order], p=p_vec[order],
            levels=np.zeros(r, np.int64), L=L_c,
            dense_piv_start=0 if opts.L else None)  # L_c is not triangular
    log(f"[echelonize] Done in {wtime() - t_start:.1f}s. Rank {r}, "
        f"{U.nnz} nz in basis")
    return fact


def _dense_finish(f: Field, S, row_origin, alive_cols, r0, opts, L_parts):
    """Dense device RREF of the remaining Schur complement — the FFPACK
    path (src/SpaSM.jl:802-812).  Columns are compressed to alive_cols."""
    nrows = S.shape[0]
    log(f"[echelonize/dense] processing matrix of dimension "
        f"{nrows} x {alive_cols.size}")
    col_of = {c: i for i, c in enumerate(alive_cols)}
    Sd = np.zeros((nrows, alive_cols.size), dtype=np.int32)
    Sc = S.tocoo()
    colmap = np.full(S.shape[1], -1, np.int64)
    colmap[alive_cols] = np.arange(alive_cols.size)
    Sd[Sc.row, colmap[Sc.col]] = f.normalize(Sc.data)
    out = dense_ops.rref(f, Sd)
    rank = out["rank"]
    if rank == 0:
        return None
    R = out["R"][out["piv_rows"]]  # (rank, n_alive) canonical RREF rows
    piv_cols_local = out["piv_cols"]
    # back to original column space
    Rsp = sp.csr_matrix(R.astype(np.int64))
    Rsp = sp.csr_matrix((Rsp.data, alive_cols[Rsp.indices], Rsp.indptr),
                        shape=(rank, S.shape[1]))
    pcols = alive_cols[piv_cols_local]
    porig = row_origin[out["piv_rows"]]
    if opts.L:
        # dense U block is a full RREF: every S row reduces against it with
        # coefficients = its values at the pivot columns (single wave)
        Csub = sp.csc_matrix(S)[:, pcols].tocoo()
        L_parts.append((row_origin[Csub.row], r0 + Csub.col, Csub.data))
    log("[echelonize/dense] done")
    return mod_reduce(Rsp, f), pcols.astype(np.int64), porig


def _gplu_finish(f: Field, S, row_origin, r0, opts, L_parts):
    """GPLU-style left-looking sparse elimination of the tail on the host
    (src/SpaSM.jl:815, README.md:34-36 '[echelonize/GPLU]').

    Processes rows sequentially; each row is eliminated against the pivots
    found so far (worklist in pivot order — valid because GPLU pivots also
    satisfy the append invariant), then becomes a pivot if nonzero."""
    import heapq

    n_s, m = S.shape
    log(f"[echelonize/GPLU] processing matrix of dimension {n_s} x {m}")
    S = mod_reduce(S, f)
    qinv_loc = {}            # col -> local pivot index
    U_rows: list[tuple] = []  # (cols array, vals array)
    piv_cols: list[int] = []
    piv_rows_origin: list[int] = []
    p64 = f.p
    for i in range(n_s):
        lo, hi = S.indptr[i], S.indptr[i + 1]
        x = {}  # col -> value (python ints, exact)
        heap = []
        for c, v in zip(S.indices[lo:hi], S.data[lo:hi]):
            x[int(c)] = int(v)
            k = qinv_loc.get(int(c))
            if k is not None:
                heapq.heappush(heap, k)
        coeffs = {}
        seen = set()
        while heap:
            k = heapq.heappop(heap)
            if k in seen:
                continue
            seen.add(k)
            c_k = piv_cols[k]
            coef = x.get(c_k, 0) % p64
            if coef == 0:
                continue
            coeffs[k] = coef
            ucols, uvals = U_rows[k]
            for c, v in zip(ucols, uvals):
                c = int(c)
                nv = (x.get(c, 0) - coef * int(v)) % p64
                if nv:
                    x[c] = nv
                    k2 = qinv_loc.get(c)
                    if k2 is not None and k2 not in seen:
                        heapq.heappush(heap, k2)
                else:
                    x.pop(c, None)
        x = {c: v % p64 for c, v in x.items() if v % p64}
        if opts.L and coeffs:
            ks = np.fromiter(coeffs.keys(), np.int64)
            vs = f.normalize(np.fromiter(coeffs.values(), np.int64))
            L_parts.append((np.full(ks.size, row_origin[i]), r0 + ks, vs))
        if x:
            j = min(x)
            pv = x[j]
            pinv = int(f.to_unsigned(f.inv(pv)))
            cols = np.fromiter(sorted(x.keys()), np.int64)
            vals = f.normalize(
                np.array([x[c] * pinv for c in cols], dtype=object))
            k_new = len(piv_cols)
            qinv_loc[j] = k_new
            U_rows.append((cols, vals.astype(np.int64)))
            piv_cols.append(j)
            piv_rows_origin.append(int(row_origin[i]))
            if opts.L:
                L_parts.append((np.array([row_origin[i]]),
                                np.array([r0 + k_new]),
                                np.array([int(f.normalize(pv))])))
    if not piv_cols:
        log("[echelonize/GPLU] empty tail")
        return None
    log("[echelonize/GPLU] full rank reached" if len(piv_cols) == n_s
        else f"[echelonize/GPLU] rank {len(piv_cols)}")
    rows_i = np.concatenate([np.full(c.size, k, np.int64)
                             for k, (c, _) in enumerate(U_rows)])
    cols_j = np.concatenate([c for c, _ in U_rows])
    vals_v = np.concatenate([v for _, v in U_rows])
    Usp = sp.csr_matrix((vals_v, (rows_i, cols_j)),
                        shape=(len(piv_cols), m), dtype=np.int64)
    return (mod_reduce(Usp, f), np.array(piv_cols, np.int64),
            np.array(piv_rows_origin, np.int64))
