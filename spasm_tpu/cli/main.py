"""Command-line tools mirroring the reference's CLI side layer
(SURVEY.md section 1: rank, kernel, echelonize, solve, dm, bitmap,
check_cert, stack, transpose, vertical_swap; flags from
src/SpaSM.jl:1123-1143).

Usage:  python -m spasm_tpu.cli <tool> [options]  (SMS on stdin unless a
file is given; results on stdout, diagnostics on stderr — `rank` prints
``rank = N`` on stderr exactly like the reference tool, whose output the
Julia wrapper scrapes)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..utils.hostmem import tune_host_malloc

tune_host_malloc()  # slow-first-touch VM lever; see utils/hostmem.py


def _common_flags(p):
    p.add_argument("--modulus", type=int, default=42013)
    p.add_argument("--dense-block-size", type=int, default=None)
    p.add_argument("--no-greedy-pivot-search", action="store_true")
    p.add_argument("--no-low-rank-mode", action="store_true")
    p.add_argument("--low-rank-start-weight", type=float, default=None)
    p.add_argument("--max-round", type=int, default=None)
    p.add_argument("--no-fill-filter", action="store_true",
                   help="disable the Markowitz pivot fill filter")
    p.add_argument("--num-devices", type=int, default=None,
                   help="row-shard over a mesh of this many devices "
                        "(the OMP_NUM_THREADS analog)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("input", nargs="?", default=None,
                   help="SMS file (default: stdin)")


def _ech_opts(args):
    kw = {}
    if args.dense_block_size is not None:
        kw["dense_block_size"] = args.dense_block_size
    if args.no_greedy_pivot_search:
        kw["enable_greedy_pivot_search"] = False
    if args.no_low_rank_mode:
        kw["enable_tall_and_skinny"] = False
    if args.low_rank_start_weight is not None:
        kw["low_rank_start_weight"] = args.low_rank_start_weight
    if args.max_round is not None:
        kw["max_round"] = args.max_round
    if args.no_fill_filter:
        kw["pivot_fill_filter"] = None
    return kw


def _load(args):
    import spasm_tpu as st

    src = args.input if args.input else sys.stdin.buffer
    return st.load_sms(src, p=args.modulus)


def _mesh(args):
    if getattr(args, "num_devices", None) is None:
        return None
    from spasm_tpu.parallel.sharded import make_mesh

    return make_mesh(args.num_devices)


def tool_rank(args):
    import spasm_tpu as st

    st.set_log(True)
    A = _load(args)
    fact = st.echelonize(A, verbose=True, mesh=_mesh(args),
                         **_ech_opts(args))
    print(f"rank = {fact.r}", file=sys.stderr)
    return 0


def tool_kernel(args):
    import spasm_tpu as st

    A = _load(args)
    fact = st.echelonize(A, verbose=args.verbose, **_ech_opts(args))
    K = st.kernel(fact)
    st.save_sms(K, sys.stdout.buffer)
    if args.qinv_file:
        np.savetxt(args.qinv_file, fact.qinv, fmt="%d")
    print(f"rank = {fact.r}", file=sys.stderr)
    return 0


def tool_echelonize(args):
    import spasm_tpu as st

    A = _load(args)
    fact = st.echelonize(A, verbose=args.verbose, **_ech_opts(args))
    st.save_sms(fact.U, sys.stdout.buffer)
    if args.qinv_file:
        np.savetxt(args.qinv_file, fact.qinv, fmt="%d")
    print(f"rank = {fact.r}", file=sys.stderr)
    return 0


def tool_solve(args):
    import spasm_tpu as st

    A = st.load_sms(args.matrix, p=args.modulus)
    B = _load(args)
    fact = st.echelonize(A, L=True, verbose=args.verbose, **_ech_opts(args))
    X, ok = st.gesv(fact, B)
    st.save_sms(X, sys.stdout.buffer)
    print("ok = " + "".join("1" if o else "0" for o in ok), file=sys.stderr)
    return 0 if ok.all() else 1


def tool_dm(args):
    import spasm_tpu as st
    from spasm_tpu.graphs import dulmage_mendelsohn

    A = _load(args)
    dm = dulmage_mendelsohn(A)
    print(f"blocks = {dm.nb}")
    print("p =", " ".join(map(str, dm.p)))
    print("q =", " ".join(map(str, dm.q)))
    print("r =", " ".join(map(str, dm.r)))
    print("c =", " ".join(map(str, dm.c)))
    print("rr =", " ".join(map(str, dm.rr)))
    print("cc =", " ".join(map(str, dm.cc)))
    return 0


def tool_bitmap(args):
    import spasm_tpu as st

    A = _load(args)
    st.save_pnm(A, args.output or sys.stdout.buffer, args.x, args.y,
                args.mode)
    return 0


def tool_check_cert(args):
    import spasm_tpu as st
    from spasm_tpu.certificate import (SpasmPRNG, certificate_rank_verify,
                                       rank_certificate_load)

    src = args.input if args.input else sys.stdin.buffer
    A, h = st.load_sms(src, p=args.modulus, get_hash=True)
    proof = rank_certificate_load(args.cert)
    # certificates are seeded from the SMS *stream* hash
    # (load_sms(get_hash=True)); verify against that first, falling back to
    # the canonical matrix hash for certificates created from an in-memory
    # matrix (certificate_rank_create's default fingerprint).  Our own
    # bitstream (LE-STATE) is tried first; a foreign (libspasm-produced)
    # certificate file is then checked under every committed PRNG
    # byte-convention candidate (tests/golden/prng_vectors.json), so a
    # cross-verification against real libspasm output is one CLI run.
    ok = False
    hash_candidates = (h, st.matrix_hash(A))
    for variant in SpasmPRNG.VARIANTS:
        for hash_ in hash_candidates:
            if certificate_rank_verify(A, hash_, proof, variant=variant):
                ok = True
                if variant != "LE-STATE":
                    print(f"note: verified under PRNG variant {variant}",
                          file=sys.stderr)
                break
        if ok:
            break
    print("certificate OK" if ok else "certificate INVALID",
          file=sys.stderr)
    return 0 if ok else 1


def tool_stack(args):
    import spasm_tpu as st

    A = st.load_sms(args.a, p=args.modulus)
    B = st.load_sms(args.b, p=args.modulus)
    st.save_sms(A.vstack(B), sys.stdout.buffer)
    return 0


def tool_transpose(args):
    import spasm_tpu as st

    A = _load(args)
    st.save_sms(A.T, sys.stdout.buffer)
    return 0


def tool_vertical_swap(args):
    import spasm_tpu as st

    A = _load(args)
    st.save_sms(A.select_rows(np.arange(A.n - 1, -1, -1)),
                sys.stdout.buffer)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(prog="spasm_tpu.cli")
    sub = parser.add_subparsers(dest="tool", required=True)

    for name, fn, extra in [
        ("rank", tool_rank, []),
        ("kernel", tool_kernel, ["qinv"]),
        ("echelonize", tool_echelonize, ["qinv"]),
        ("solve", tool_solve, ["matrix"]),
        ("dm", tool_dm, []),
        ("bitmap", tool_bitmap, ["bitmap"]),
        ("check_cert", tool_check_cert, ["cert"]),
        ("stack", tool_stack, ["ab"]),
        ("transpose", tool_transpose, []),
        ("vertical_swap", tool_vertical_swap, []),
    ]:
        p = sub.add_parser(name)
        if "ab" in extra:
            p.add_argument("a")
            p.add_argument("b")
            p.add_argument("--modulus", type=int, default=42013)
        else:
            _common_flags(p)
        if "qinv" in extra:
            p.add_argument("--qinv-file", default=None)
        if "matrix" in extra:
            p.add_argument("--matrix", required=True)
        if "bitmap" in extra:
            p.add_argument("--x", type=int, default=None)
            p.add_argument("--y", type=int, default=None)
            p.add_argument("--mode", type=int, default=2)
            p.add_argument("--output", default=None)
        if "cert" in extra:
            p.add_argument("--cert", required=True)
        p.set_defaults(fn=fn)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
