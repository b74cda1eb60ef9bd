"""REAL multi-process distributed run (two OS processes, gloo collectives
over TCP — the DCN analog): tools/multihost_demo.py spawns two workers
that build a global 8-device mesh, run one distributed elimination round,
and must agree bit-exactly on the replicated pivot panel."""

import os
import subprocess
import sys


def test_two_process_distributed_round():
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "multihost_demo.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run([sys.executable, demo], capture_output=True,
                         text=True, timeout=420, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST OK" in out.stdout
