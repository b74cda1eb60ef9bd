"""Generate (or check) the committed PRNG golden vectors.

The reference's `spasm_prng_ctx` layout is quoted verbatim in
src/SpaSM.jl:355-372: `block[11]` u32 words with `block[0:8] == H(matrix)`,
`block[8] = prime`, `block[9] = counter`, `block[10] = seq`; each refill
hashes the 44-byte block with SHA-256 and yields 8 output words.  Three
byte-level details are NOT derivable from that quote (libspasm's C source
is not present in this environment):

  (E) endianness of the non-hash words block[8:11] in memory
      - LE: little-endian (x86-native struct layout)   <- our choice
      - BE: big-endian
  (W) output word convention for hash[8]
      - STATE: the SHA-256 state words h0..h7 (== big-endian reading of
        the digest bytes)                               <- our choice
      - MEM: little-endian reading of the digest bytes
  (R) the rejection loop of spasm_prng_ZZp
      - draw u32 & mask until < prime                   <- our choice
        (mask = 2^i - 1, smallest i with 2^i > prime, quoted in the
        struct comment, so only the loop shape is inferred)

This tool prints the first 16 u32 outputs for ALL four (E, W) variants
for each golden case, so once a libspasm build ever becomes available,
`spasm_prng_u32` can be compared against every candidate in one run and
the matching variant identified.  The committed file
tests/golden/prng_vectors.json pins OUR (LE, STATE) bitstream — any
accidental change to certificate.SpasmPRNG breaks the golden test.

Usage: python tools/prng_golden.py [--write]
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spasm_tpu.certificate import SpasmPRNG  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "prng_vectors.json")

CASES = [
    # (seed bytes as hex, prime, seq)
    ("00" * 32, 42013, 0),
    ("00" * 32, 42013, 1),
    ("deadbeef" * 8, 42013, 0),
    ("deadbeef" * 8, 65537, 0),
    ("0123456789abcdef" * 4, 2147483647, 0),   # 2^31 - 1
    ("0123456789abcdef" * 4, 4294967291, 0),   # 2^32 - 5
    ("ffffffff" * 8, 3, 7),
]
N_U32 = 16
N_ZZP = 16


def u32_variant(seed: bytes, prime: int, seq: int, counter: int,
                endian: str, words: str) -> list[int]:
    """One refill's 8 output words under the given conventions."""
    fmt = "<III" if endian == "LE" else ">III"
    block = seed + struct.pack(fmt, prime & 0xFFFFFFFF, counter,
                               seq & 0xFFFFFFFF)
    digest = hashlib.sha256(block).digest()
    out_fmt = ">8I" if words == "STATE" else "<8I"
    return list(struct.unpack(out_fmt, digest))


def build():
    data = {"format": "see tools/prng_golden.py", "cases": []}
    for seed_hex, prime, seq in CASES:
        seed = bytes.fromhex(seed_hex)
        prng = SpasmPRNG(seed, prime, seq)
        ours_u32 = [prng.u32() for _ in range(N_U32)]
        prng2 = SpasmPRNG(seed, prime, seq)
        ours_zzp = [prng2.zzp() for _ in range(N_ZZP)]
        variants = {}
        for e in ("LE", "BE"):
            for w in ("STATE", "MEM"):
                v = (u32_variant(seed, prime, seq, 0, e, w)
                     + u32_variant(seed, prime, seq, 1, e, w))
                variants[f"{e}-{w}"] = v
        assert variants["LE-STATE"] == ours_u32, "SpasmPRNG drifted from " \
            "its documented (LE, STATE) convention"
        data["cases"].append({
            "seed": seed_hex, "prime": prime, "seq": seq,
            "mask": prng.mask,
            "u32_LE_STATE_ours": ours_u32,
            "zzp_ours": ours_zzp,
            "u32_variants_first16": variants,
        })
    return data


def main():
    data = build()
    if "--write" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            json.dump(data, fh, indent=1)
        print(f"wrote {GOLDEN}")
    else:
        with open(GOLDEN) as fh:
            committed = json.load(fh)
        if committed == data:
            print("golden vectors MATCH")
        else:
            print("golden vectors DIFFER")
            sys.exit(1)


if __name__ == "__main__":
    main()
