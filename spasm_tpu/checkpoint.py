"""Round-granular checkpoint / resume for echelonization.

The reference has no incremental checkpointing (SURVEY.md section 5); its
persistence is SMS files.  Long TPU runs want better: the multi-round
echelonize driver is naturally round-structured, so after every round we
can persist (U blocks so far, pivot metadata, the current Schur complement,
row origins, options) and resume exactly where a preempted run stopped.

Format: one .npz per state (atomic rename), schema-versioned.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import scipy.sparse as sp

SCHEMA = 1


def save_state(path: str, *, field_p: int, round_idx: int, r: int,
               S, row_origin, U_sp, piv_cols, piv_origin, opts_dict,
               L_parts=None):
    """Persist an in-progress echelonization (atomic)."""
    S = sp.csr_matrix(S)
    U_sp = sp.csr_matrix(U_sp)
    payload = dict(
        schema=SCHEMA, field_p=field_p, round_idx=round_idx, r=r,
        S_shape=np.array(S.shape), S_indptr=S.indptr,
        S_indices=S.indices, S_data=S.data,
        row_origin=np.asarray(row_origin),
        U_shape=np.array(U_sp.shape), U_indptr=U_sp.indptr,
        U_indices=U_sp.indices, U_data=U_sp.data,
        piv_cols=np.asarray(piv_cols), piv_origin=np.asarray(piv_origin),
        opts_keys=np.array(sorted(opts_dict.keys())),
        opts_vals=np.array([float(opts_dict[k])
                            for k in sorted(opts_dict.keys())]),
    )
    if L_parts:
        payload["L_i"] = np.concatenate(
            [np.asarray(t[0], np.int64) for t in L_parts])
        payload["L_j"] = np.concatenate(
            [np.asarray(t[1], np.int64) for t in L_parts])
        payload["L_v"] = np.concatenate(
            [np.asarray(t[2], np.int64) for t in L_parts])
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_state(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        if int(z["schema"]) != SCHEMA:
            raise ValueError(f"unknown checkpoint schema {int(z['schema'])}")
        out = dict(
            field_p=int(z["field_p"]), round_idx=int(z["round_idx"]),
            r=int(z["r"]),
            S=sp.csr_matrix((z["S_data"], z["S_indices"], z["S_indptr"]),
                            shape=tuple(z["S_shape"])),
            row_origin=z["row_origin"],
            U=sp.csr_matrix((z["U_data"], z["U_indices"], z["U_indptr"]),
                            shape=tuple(z["U_shape"])),
            piv_cols=z["piv_cols"], piv_origin=z["piv_origin"],
            opts={str(k): float(v) for k, v in
                  zip(z["opts_keys"], z["opts_vals"])},
        )
        if "L_i" in z.files:
            out["L_parts"] = [(z["L_i"], z["L_j"], z["L_v"])]
        else:
            out["L_parts"] = []
    return out
