#!/usr/bin/env python
"""Feasibility probe: pl.Element halo (overlapping) input blocks on TPU.

A fused STFT frontend kernel needs each grid cell to read rows
[t*T_TILE, t*T_TILE + T_TILE + M - 1) of a hop-row matrix — overlapping
reads that Blocked specs cannot express. pl.Element(block_size, padding)
documents elementwise start indices; this probe checks Mosaic actually
lowers it: out[t] = sum of a 3-row sliding window over halo-read rows.

Usage: python scripts/exp_element_halo.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    T_TILE, HALO, LANES = 16, 8, 128  # halo rounded to 8 (sublane divisibility)
    T = 64  # total output rows

    def kernel(x_ref, out_ref):
        rows = x_ref[:]  # [T_TILE + HALO, LANES]; only rows 0..T_TILE+2 used
        acc = rows[0:T_TILE]
        acc = acc + rows[1 : 1 + T_TILE]
        acc = acc + rows[2 : 2 + T_TILE]
        out_ref[:] = acc

    x = np.arange((T + HALO) * LANES, dtype=np.float32).reshape(T + HALO, LANES)

    out = pl.pallas_call(
        kernel,
        grid=(T // T_TILE,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(T_TILE + HALO, (0, 0)), pl.Element(LANES, (0, 0))),
                lambda i: (i * T_TILE, 0),
            )
        ],
        out_specs=pl.BlockSpec((T_TILE, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, LANES), jnp.float32),
        interpret=args.cpu,
    )(jnp.asarray(x))

    ref = x[0:T] + x[1 : 1 + T] + x[2 : 2 + T]
    diff = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"backend={jax.default_backend()} max|diff|={diff:.3e}")
    assert diff == 0.0, "halo mismatch"
    print("Element halo OK")


if __name__ == "__main__":
    main()
