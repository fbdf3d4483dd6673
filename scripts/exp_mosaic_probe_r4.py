#!/usr/bin/env python
"""Mosaic capability probes for the fused encodec-stage kernel design (r4).

P1: Element index_map containing max(t*tile - 16, 0) — needed to read an
    UNPADDED [B, T, C] input with halo without a front-pad materialization.
P2: strided sublane slice rows[j::r] inside the kernel (down-conv taps).
P3: in-kernel reshape [rows, C] -> [rows/r, r*C] (stride folding alternative).

Each probe prints OK/FAIL with the error head; numerics checked vs NumPy.
"""

import signal
import sys

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
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# --- P1: max() in index map --------------------------------------------------
def p1():
    halo = 24  # 16 front slack + k-1 rounded

    def kernel(x_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0]  # [TILE + halo, C]
        # For t == 0 the block starts at row 0 (not t*TILE - 16): local
        # offset of global row t*TILE is 16 for t > 0, 0 for t == 0.
        def body(off):
            return rows[off : off + TILE] * 2.0

        o_ref[0] = jax.lax.cond(t == 0, lambda: body(0), lambda: body(16))

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
    err = np.abs(out - 2.0 * x_np).max()
    return f"max_err={err:.2e}"


# --- P1b: select-free variant: two input refs (interior + head) -------------
def p1b():
    halo = 24

    def kernel(x_ref, head_ref, o_ref):
        t = pl.program_id(1)
        rows = x_ref[0]

        def interior():
            return rows[16 : 16 + TILE] * 2.0

        def head():
            return head_ref[0, :TILE] * 2.0

        o_ref[0] = jax.lax.cond(t == 0, head, interior)

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TILE + halo), pl.Element(C)),
                # always nonnegative: garbage overlap for t=0, unused there
                lambda b, t: (b, jnp.maximum(t * TILE - 16, 0), 0),
            ),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(TILE + 8), pl.Element(C)),
                lambda b, t: (b, 0, 0),  # constant head block
            ),
        ],
        out_specs=pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
    )(x, x)
    out = np.asarray(out)
    err = np.abs(out - 2.0 * x_np).max()
    return f"max_err={err:.2e}"


# --- P2: strided sublane slice ----------------------------------------------
def p2():
    r = 2

    def kernel(x_ref, o_ref):
        rows = x_ref[0]  # [TILE, C]
        o_ref[0] = rows[0::r] + rows[1::r]

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE // r, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T // r, C), jnp.float32),
    )(x)
    out = np.asarray(out)
    want = x_np[:, 0::r] + x_np[:, 1::r]
    err = np.abs(out - want).max()
    return f"max_err={err:.2e}"


# --- P3: reshape [rows, C] -> [rows/r, r*C] ----------------------------------
def p3():
    r = 2

    def kernel(x_ref, o_ref):
        rows = x_ref[0]  # [TILE, C]
        o_ref[0] = rows.reshape(TILE // r, r * C)

    out = pl.pallas_call(
        kernel,
        grid=(B, T // TILE),
        in_specs=[pl.BlockSpec((1, TILE, C), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, TILE // r, r * C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T // r, r * C), jnp.float32),
    )(x)
    out = np.asarray(out)
    want = x_np.reshape(B, T // r, r * C)
    err = np.abs(out - want).max()
    return f"max_err={err:.2e}"


probe("P1 max-in-index-map", p1)
probe("P1b dual-ref head", p1b)
probe("P2 strided sublane slice", p2)
probe("P3 sublane->lane reshape", p3)
print("done", flush=True)
