#!/usr/bin/env python
"""Probe: is Pallas HBM traffic lane-padded? Copy [B,T,C] via a trivial
kernel at C=16/32/64/128 with equal logical bytes; if narrow-C runs ~128/C
slower, Pallas operands are (8,128)-tiled in HBM and narrow stores pay it."""

import signal
import time

import numpy as np

signal.alarm(1800)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

TOTAL = 16 * 120000 * 32  # elements (0.25 GB f32)


def bench(C, tile=2048, reps=3, iters=4):
    T = TOTAL // (16 * C)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, T, C), jnp.float32)
    n_t = T // tile

    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(16, n_t),
            in_specs=[pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0))],
            out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((16, T, C), jnp.float32),
        )(x)

    y = run(x)
    _ = float(jnp.sum(y[:, :8]))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            y = run(x)
        _ = float(jnp.sum(y[:, :8]))
        best = min(best, (time.time() - t0) / iters * 1000)
    gbs = 2 * TOTAL * 4 / (best / 1000) / 1e9
    print(f"C={C:4d} T={T}: {best:.2f} ms  ({gbs:.0f} GB/s logical r+w)", flush=True)


for C in (128, 64, 32, 16):
    bench(C)

# XLA elementwise baseline at C=32 for comparison.
x = jax.random.normal(jax.random.PRNGKey(0), (16, TOTAL // (16 * 32), 32), jnp.float32)


@jax.jit
def xmul(x):
    return x * 2.0


y = xmul(x)
_ = float(jnp.sum(y[:, :8]))
best = 1e9
for _ in range(3):
    t0 = time.time()
    for _ in range(4):
        y = xmul(x)
    _ = float(jnp.sum(y[:, :8]))
    best = min(best, (time.time() - t0) / 4 * 1000)
print(f"XLA x*2 at C=32: {best:.2f} ms ({2*TOTAL*4/(best/1000)/1e9:.0f} GB/s)", flush=True)
print("done", flush=True)
