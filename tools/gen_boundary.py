#!/usr/bin/env python
"""Generate homology-style SMS fixtures: k-th boundary matrix of the full
simplex on n vertices (exact rank C(n-1, k)) — stand-ins for GL7d/relat
matrices, which are not available in this environment.

Usage:  python tools/gen_boundary.py N K [out.sms]
"""

import itertools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from math import comb

import spasm_tpu as st


def main():
    n, k = int(sys.argv[1]), int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    rows = list(itertools.combinations(range(n), k + 1))
    cols = {c: i for i, c in enumerate(
        itertools.combinations(range(n), k))}
    ii, jj, vv = [], [], []
    for ri, face in enumerate(rows):
        for t in range(k + 1):
            ii.append(ri)
            jj.append(cols[face[:t] + face[t + 1:]])
            vv.append((-1) ** t)
    A = st.SparseGFp.from_coo(st.field(42013), len(rows), len(cols),
                              ii, jj, vv)
    st.save_sms(A, out if out else sys.stdout.buffer)
    print(f"# {A.n} x {A.m}, nnz {A.nnz}, true rank {comb(n - 1, k)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
