#!/usr/bin/env python
"""Pallas fused conv1+relu+pool1 kernel experiment for VGGish.

Round-3 profile: the conv1 slice (Cin=1 3x3 conv + 2x2/2 max pool) costs
7.67 ms of a 42.3 ms B=256-file step — XLA materializes the 2.0 GB
[2560, 96, 64, 64] conv1 output because reduce_window cannot fuse its
producer, and the Cin=1 conv runs at ~7% MXU utilization.

Kernel formulation (banded matmul, lane-aligned): for each row shift
dr in {-1,0,1}, conv-over-mel-columns is a dense [64, 4096] banded matmul
  B_dr[cin, cout*64 + ch] = w[dr+1, cin-cout+1, 0, ch]  (|cin-cout| <= 1)
so  acc[bp*96, 4096] = sum_dr rowshift(x, dr).reshape(bp*96, 64) @ B_dr.
+bias, ReLU, then the 2x2/2 pool collapses row pairs (sublane max) and
col pairs (adjacent 64-blocks of the 4096 lane axis) entirely in VMEM;
only the [bp, 48, 32, 64] pooled output ever reaches HBM.

Measures: standalone conv1+pool slice (XLA vs kernel), full step with the
kernel spliced in, parity (f32 interpret vs XLA).

Usage: python scripts/exp_vggish_conv1.py [--files 256] [--iters 16] [--cpu]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import functools
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_banded(w: np.ndarray) -> np.ndarray:
    """[3, 3, 1, 64] conv kernel -> [3, 64, 4096] banded matrices."""
    assert w.shape == (3, 3, 1, 64), w.shape
    band = np.zeros((3, 64, 64 * 64), w.dtype)
    for dr in range(3):
        for dc in range(3):
            off = dc - 1  # cin = cout + off
            couts = np.arange(64)
            cins = couts + off
            ok = (cins >= 0) & (cins < 64)
            for co, ci in zip(couts[ok], cins[ok]):
                band[dr, ci, co * 64:(co + 1) * 64] = w[dr, dc, 0, :]
    return band


def fused_conv1_pool(x, band, bias, *, bp: int, interpret: bool = False):
    """[N, 96, 64] patches -> [N, 48, 32, 64] pooled conv1 activations."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    assert n % bp == 0, (n, bp)
    dt = x.dtype

    def kernel(x_ref, band_ref, bias_ref, out_ref):
        xx = x_ref[:]  # [bp, 96, 64]
        z = jnp.zeros((bp, 1, 64), dt)
        x_dn = jnp.concatenate([z, xx[:, :-1]], axis=1)   # row r -> x[r-1]
        x_up = jnp.concatenate([xx[:, 1:], z], axis=1)    # row r -> x[r+1]
        m = bp * 96
        # One dense matmul: the 3 row shifts stacked on K (=192) keep the MXU
        # pipeline full vs three K=64 matmuls.
        xcat = jnp.concatenate([x_dn, xx, x_up], axis=-1).reshape(m, 192)
        acc = jnp.dot(xcat, band_ref[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + jnp.tile(bias_ref[:], (1, 64)), 0.0)
        h = h.reshape(bp, 48, 2, 4096).max(axis=2)
        # Col-pair pool: the 4096 lane axis is (c_out, ch) = (2p+q)*64+ch, so
        # grouping lanes into 128-blocks puts the pooled pair at block halves.
        # (A direct (32, 2, 64) lane split fails Mosaic layout inference.)
        h = h.reshape(bp, 48, 32, 128)
        h = jnp.maximum(h[..., :64], h[..., 64:])
        out_ref[:] = h.astype(dt)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 48, 32, 64), dt),
        grid=(n // bp,),
        in_specs=[
            pl.BlockSpec((bp, 96, 64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((192, 4096), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, 48, 32, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, band.reshape(192, 4096), bias)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.vggish import (
        CONV_CFG, init_vggish_params,
    )
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, files={args.files}", flush=True)
    params = init_vggish_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("vggish", params, dt)

    w1 = np.asarray(params["features"][0]["w"], np.float32)
    band = jnp.asarray(make_banded(w1)).astype(dt)
    bias1 = jnp.asarray(params["features"][0]["b"], jnp.float32).reshape(1, 64)

    s = 160000
    patches_per = fe.vggish_num_patches(s)
    n_pat = args.files * patches_per
    wave = jax.random.normal(jax.random.PRNGKey(1), (args.files, s), jnp.float32) * 0.1

    # ---- parity: f32 interpret kernel vs XLA conv+pool ----
    xs = jax.random.normal(jax.random.PRNGKey(2), (4, 96, 64), jnp.float32)
    ref = common.max_pool2d(
        jax.nn.relu(common.conv2d(xs[..., None], params["features"][0]["w"].astype(jnp.float32),
                                  params["features"][0]["b"].astype(jnp.float32))),
        (2, 2), (2, 2))
    band32 = jnp.asarray(make_banded(w1))
    got = fused_conv1_pool(xs, band32, bias1, bp=2, interpret=True)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"parity (f32 interpret, 4 patches): max abs {err:.2e}", flush=True)
    # On-TPU interpret mode executes dots at DEFAULT (bf16) precision, so the
    # bound is loose there; the exact check is the --cpu run (2.4e-7).
    assert err < (1e-4 if jax.default_backend() == "cpu" else 3e-2), err

    def rest_of_model(h):
        conv_i = 1
        for v in CONV_CFG[2:]:  # skip conv1 + pool1
            if v == "M":
                h = common.max_pool2d(h, (2, 2), (2, 2))
            else:
                p = params["features"][conv_i]
                h = jax.nn.relu(common.conv2d(h, p["w"], p["b"]))
                conv_i += 1
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(common.linear(h, **params["embeddings"][0]))
        h = jax.nn.relu(common.linear(h, **params["embeddings"][1]))
        return common.linear(h, **params["embeddings"][2])

    def step(wave, mode, bp=4):
        pats = fe.vggish_patches_batch(wave, patches_per).reshape(-1, 96, 64).astype(dt)
        if mode == "xla":
            h = common.max_pool2d(
                jax.nn.relu(common.conv2d(pats[..., None], params["features"][0]["w"],
                                          params["features"][0]["b"])),
                (2, 2), (2, 2))
        else:
            h = fused_conv1_pool(pats, band, bias1, bp=bp)
        return rest_of_model(h)

    def slice_only(wave, mode, bp=4):
        pats = fe.vggish_patches_batch(wave, patches_per).reshape(-1, 96, 64).astype(dt)
        if mode == "xla":
            return common.max_pool2d(
                jax.nn.relu(common.conv2d(pats[..., None], params["features"][0]["w"],
                                          params["features"][0]["b"])),
                (2, 2), (2, 2))
        return fused_conv1_pool(pats, band, bias1, bp=bp)

    def bench(fn_builder, label):
        fn = jax.jit(lambda acc, w: acc + jnp.sum(fn_builder(w).astype(jnp.float32)))
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, wave)
        v = float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, wave)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        amin = args.files * 10.0 / 60.0
        print(f"{label:28} {ms:8.2f} ms  ({amin / (ms / 1e3):7.1f} audio-min/s, "
              f"compile {compile_s:.0f}s)", flush=True)
        return v, ms

    v_ref, _ = bench(lambda w: slice_only(w, "xla"), "slice xla conv1+pool")
    for bp in (2, 4, 8, 16):
        if n_pat % bp:
            continue
        v, _ = bench(lambda w, bp=bp: slice_only(w, "pallas", bp), f"slice pallas bp={bp}")
        print(f"    slice sum rel-dev vs xla: {abs(v - v_ref) / abs(v_ref):.2e}", flush=True)
    v_ref, _ = bench(lambda w: step(w, "xla"), "full step xla")
    for bp in (2, 4, 8, 16):
        if n_pat % bp:
            continue
        v, _ = bench(lambda w, bp=bp: step(w, "pallas", bp), f"full step pallas bp={bp}")
        print(f"    step sum rel-dev vs xla: {abs(v - v_ref) / abs(v_ref):.2e}", flush=True)


if __name__ == "__main__":
    main()
