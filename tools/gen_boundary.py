#!/usr/bin/env python
"""Generate homology-style SMS fixtures: k-th boundary matrix of the full
simplex on n vertices (exact rank C(n-1, k)) — stand-ins for GL7d/relat
matrices, which are not available in this environment.

Usage:  python tools/gen_boundary.py N K [out.sms]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from math import comb

import spasm_tpu as st
from spasm_tpu.fixtures import simplex_boundary


def main():
    n, k = int(sys.argv[1]), int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    A = simplex_boundary(n, k)
    st.save_sms(A, out if out else sys.stdout.buffer)
    print(f"# {A.n} x {A.m}, nnz {A.nnz}, true rank {comb(n - 1, k)}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
