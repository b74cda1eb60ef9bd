#!/usr/bin/env python
"""Measure axon link characteristics: dispatch latency, H2D/D2H bandwidth,
sync cost — then instrument the bench rank()'s dense finish."""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import spasm_tpu as st

f = st.field(42013)
rng = np.random.default_rng(0)


@jax.jit
def tiny(x):
    return x + 1


# dispatch + sync latency
x = jnp.zeros((8, 128), jnp.int32)
jax.block_until_ready(tiny(x))
t0 = time.time()
for _ in range(20):
    x = tiny(x)
jax.block_until_ready(x)
print(f"20 chained tiny dispatches + 1 sync: {time.time()-t0:.3f} s")

t0 = time.time()
for _ in range(20):
    jax.block_until_ready(tiny(x))
print(f"20 synced tiny dispatches: {time.time()-t0:.3f} s "
      f"({(time.time()-t0)/20*1e3:.0f} ms each)")

# H2D bandwidth
for mb in (1, 16, 64):
    a = np.zeros((mb * 256 * 1024,), np.int32)
    t0 = time.time()
    d = jnp.asarray(a)
    jax.block_until_ready(d)
    dt = time.time() - t0
    print(f"H2D {mb} MB: {dt:.3f} s ({mb/dt:.1f} MB/s)")

# D2H bandwidth
for mb in (1, 16, 64):
    d = jnp.zeros((mb * 256 * 1024,), jnp.int32)
    jax.block_until_ready(d)
    t0 = time.time()
    a = np.asarray(d)
    dt = time.time() - t0
    print(f"D2H {mb} MB: {dt:.3f} s ({mb/dt:.1f} MB/s)")

# scalar D2H readback (int(...) of device scalar)
d = jnp.int32(5) + jnp.int32(2)
jax.block_until_ready(d)
t0 = time.time()
for _ in range(5):
    v = int(d)
print(f"5 scalar readbacks: {time.time()-t0:.3f} s")
