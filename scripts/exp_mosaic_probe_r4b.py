#!/usr/bin/env python
"""Isolate the r4 probe failures: index-map max vs in-kernel cond vs select."""

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
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# A: max in index map, NO cond in kernel (numerics wrong at t=0 on purpose).
def pa():
    halo = 24

    def kernel(x_ref, o_ref):
        rows = x_ref[0]
        o_ref[0] = rows[16 : 16 + TILE] * 2.0

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TILE + halo), pl.Element(C)),
                lambda b, t: (b, jnp.maximum(t * TILE - 16, 0), 0),
            )
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    err = np.abs(out[:, TILE:] - 2.0 * x_np[:, TILE - 16 : T - TILE - 16 + T - TILE]).max() if False else np.abs(
        out[:, TILE : 2 * TILE] - 2.0 * x_np[:, TILE - 16 : 2 * TILE - 16]
    ).max()
    return f"interior_err={err:.2e}"


# B: plain blocks, in-kernel lax.cond on program_id selecting row windows.
def pb():
    def kernel(x_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0]
        o_ref[0] = jax.lax.cond(
            t == 0, lambda: rows * 2.0, lambda: rows * 3.0
        )

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    want = np.concatenate([2.0 * x_np[:, :TILE], 3.0 * x_np[:, TILE:]], axis=1)
    return f"err={np.abs(out - want).max():.2e}"


# C: same but jnp.where select of two full tiles (no cond).
def pc():
    def kernel(x_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0]
        o_ref[0] = jnp.where(t == 0, rows * 2.0, rows * 3.0)

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    want = np.concatenate([2.0 * x_np[:, :TILE], 3.0 * x_np[:, TILE:]], axis=1)
    return f"err={np.abs(out - want).max():.2e}"


# D: Element spec with max index map + where-select (A + C combined).
def pd():
    halo = 24

    def kernel(x_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0]
        a = rows[0:TILE] * 2.0
        b_ = rows[16 : 16 + TILE] * 2.0
        o_ref[0] = jnp.where(t == 0, a, b_)

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TILE + halo), pl.Element(C)),
                lambda b, t: (b, jnp.maximum(t * TILE - 16, 0), 0),
            )
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    return f"err={np.abs(out - 2.0 * x_np).max():.2e}"


# E: strided tap via lax.slice with strides.
def pe():
    r = 2

    def kernel(x_ref, o_ref):
        rows = x_ref[0]
        a = jax.lax.slice(rows, (0, 0), (TILE - 1, C), (r, 1))
        b_ = jax.lax.slice(rows, (1, 0), (TILE, C), (r, 1))
        o_ref[0] = a + b_

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE // r, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T // r, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    want = x_np[:, 0::r] + x_np[:, 1::r]
    return f"err={np.abs(out - want).max():.2e}"


probe("A Element+max, no cond", pa)
probe("B plain blocks + lax.cond", pb)
probe("C plain blocks + where", pc)
probe("D Element+max + where", pd)
probe("E lax.slice strided taps", pe)
print("done", flush=True)
