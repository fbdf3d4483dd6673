#!/usr/bin/env python
"""Per-stage profile of the PANN (CNN14) step at the shipped configuration.

Times prefix-slices of the fused step — the log-mel frontend, bn0, each of
the six ConvBlocks, and the pooling/fc tail — with scalar forcing and chain
dispatch. PANN has never been per-stage profiled (rounds 1-2 tuned only the
batch size and dtype).

Usage: python scripts/exp_pann_profile.py [--sr 16000] [--iters 16]
       [--batch 128] [--cpu]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sr", type=int, default=16000, choices=[8000, 16000, 32000])
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="pin CPU (env sitecustomize overrides JAX_PLATFORMS)")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.pann import _conv_block, init_pann_params
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, sr={args.sr}, B={args.batch}", flush=True)
    params = init_pann_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("pann", params, dt)

    cfg = fe.PANN_CONFIGS[args.sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    t_i = fe.pann_num_frames(int(10.0 * args.sr), hop)
    grid = fe.pann_valid_time(t_i)
    length = grid * hop + n_fft

    def prefix(params, wave, n_valid, n_blocks: int, tail: bool):
        mel = fe.pann_logmel_batch(wave, args.sr, grid, n_valid)
        h = mel.astype(dt)
        if n_blocks < 0:
            return mel
        h = common.batch_norm(h, params["bn0"])[..., None]
        for i, blk in enumerate(params["blocks"][:n_blocks]):
            h = _conv_block(blk, h, pool=1 if i == 5 else 2)
        if tail:
            h = h.astype(jnp.float32)
            h = jnp.mean(h, axis=2)
            h = jnp.max(h, axis=1) + jnp.mean(h, axis=1)
            h = h.astype(dt)
            h = jax.nn.relu(common.linear(h, **params["fc1"]))
        return h

    wave = jax.random.normal(jax.random.PRNGKey(1), (args.batch, length), jnp.float32) * 0.1
    n_valid = jnp.full((args.batch,), t_i, jnp.int32)

    configs = [("frontend (log-mel)", -1, False), ("+bn0 (noop slice)", 0, False)] + [
        (f"+block{i}", i, False) for i in range(1, 7)
    ] + [("+tail (full)", 6, True)]
    prev = 0.0
    for name, nb, tail in configs:
        fn = jax.jit(
            lambda acc, w, nv, nb=nb, tail=tail: acc
            + jnp.sum(prefix(params, w, nv, nb, tail).astype(jnp.float32))
        )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, wave, n_valid)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, wave, n_valid)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:20} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms
    amin = args.batch * 10.0 / 60.0
    print(f"full step at B={args.batch}: {prev:.1f} ms -> "
          f"{amin / (prev / 1e3):.1f} audio-min/s/chip", flush=True)


if __name__ == "__main__":
    main()
