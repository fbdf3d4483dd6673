#!/usr/bin/env python
"""Probe Mosaic divisibility-prover forms for offset Element block starts."""

import signal

import numpy as np

signal.alarm(900)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)

B, T, C = 2, 4096, 32
TILE = 512
rng = np.random.default_rng(0)
x_np = rng.standard_normal((B, T, C)).astype(np.float32)
x = jnp.asarray(x_np)


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def run(out_map, width):
    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec(
            (pl.Element(1), pl.Element(TILE), pl.Element(C)), out_map
        ),
        out_shape=jax.ShapeDtypeStruct((B, width, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    err = np.abs(out[:, 8 : 8 + T] - 2.0 * x_np).max()
    return f"err={err:.2e}"


probe("O1 plain 8 + t*TILE", lambda: run(lambda b, t: (b, 8 + t * TILE, 0), 8 + T + 8))
probe(
    "O2 mul-form 8*(1 + t*(TILE//8))",
    lambda: run(lambda b, t: (b, 8 * (1 + t * (TILE // 8)), 0), 8 + T + 8),
)
probe(
    "O3 mul-form (t*(TILE//8) + 1)*8",
    lambda: run(lambda b, t: (b, (t * (TILE // 8) + 1) * 8, 0), 8 + T + 8),
)


# Input Element with the same offset form (for a tile-front-pad fallback).
def run_in(in_map, pre):
    xw = jnp.pad(x, ((0, 0), (pre, 8), (0, 0)))

    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0, 8 : 8 + TILE] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(TILE + 16), pl.Element(C)), in_map)
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(xw)
    out = np.asarray(out)
    err = np.abs(out - 2.0 * x_np).max()
    return f"err={err:.2e}"


probe(
    "I1 input 8*(t*(TILE//8)) + 0 (sanity)",
    lambda: run_in(lambda b, t: (b, 8 * (t * (TILE // 8)), 0), 8),
)
probe(
    "I2 input (t+1)*TILE - 8 mul-form",
    lambda: run_in(lambda b, t: (b, ((t + 1) * (TILE // 8) - 1) * 8, 0), TILE),
)
print("done", flush=True)
