#!/usr/bin/env python
"""Per-stage profile of the PANN step at the shipped configuration
(B=128 x 10 s files, platform-default bf16, 32k-24 frame grid).

Times prefix-slices of the fused step — the reflect-pad log-mel frontend,
bn0, each ConvBlock (conv1 / conv2+pool attributed separately for block 1,
whole blocks after), the f32 pooling tail, and fc1 — with scalar forcing
and chain dispatch. PANN has never been per-stage profiled (rounds 1-2d
tuned batch/wire/dtype only); it is the second-fastest family and block 1
is the suspected VGGish-conv1-style soft spot (Cin=1, [B, T, 64, 64]
materialization).

Usage: python scripts/exp_pann_profile.py [--files 128] [--iters 16]
       [--sr 16000] [--cpu]
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
    ap.add_argument("--files", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.pann import init_pann_params
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    sr = args.sr
    cfg = fe.PANN_CONFIGS[sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    t_raw = fe.pann_num_frames(10 * sr, hop)
    t_grid = fe.pann_valid_time(t_raw)
    wave_len = t_grid * hop + n_fft
    print(
        f"backend: {jax.default_backend()}, files={args.files}, sr={sr}, "
        f"t_grid={t_grid}, wave_len={wave_len}",
        flush=True,
    )

    params = init_pann_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("pann", params, dt)

    wave = (
        jax.random.normal(jax.random.PRNGKey(1), (args.files, wave_len), jnp.float32)
        * 0.1
    )
    n_valid = jnp.full((args.files,), t_raw, jnp.int32)

    def prefix(wave, n_stage: int, tail: int):
        """n_stage: -1 mel only, 0 +bn0, 1 +blk1conv1, 2 +blk1conv2+pool,
        3..7 +block2..block6, tail: 1 pooling tail, 2 +fc1."""
        mel = fe.pann_logmel_batch(wave, sr, t_grid, n_valid)
        if n_stage < 0:
            return mel
        # the pipeline's bf16_forward casts the mel before the model
        h = common.batch_norm(mel.astype(dt), params["bn0"])
        if n_stage >= 1:
            h = h[..., None]
            p = params["blocks"][0]
            h = jax.nn.relu(common.batch_norm(common.conv2d(h, p["conv1"]["w"]), p["bn1"]))
        if n_stage >= 2:
            p = params["blocks"][0]
            h = jax.nn.relu(common.batch_norm(common.conv2d(h, p["conv2"]["w"]), p["bn2"]))
            h = common.avg_pool2d(h, (2, 2), (2, 2))
        for i in range(1, n_stage - 1):
            blk = params["blocks"][i]
            x = jax.nn.relu(common.batch_norm(common.conv2d(h, blk["conv1"]["w"]), blk["bn1"]))
            x = jax.nn.relu(common.batch_norm(common.conv2d(x, blk["conv2"]["w"]), blk["bn2"]))
            h = common.avg_pool2d(x, (2, 2), (2, 2)) if i < 5 else x
        if tail >= 1:
            h = h.astype(jnp.float32)
            h = jnp.mean(h, axis=2)
            h = jnp.max(h, axis=1) + jnp.mean(h, axis=1)
            h = h.astype(dt)
        if tail >= 2:
            h = jax.nn.relu(common.linear(h, **params["fc1"]))
        return h

    configs = [("frontend (log-mel)", -1, 0), ("+bn0", 0, 0),
               ("+blk1 conv1 (1->64)", 1, 0), ("+blk1 conv2+pool", 2, 0)]
    configs += [(f"+block{i} ({c[1]}ch)", i + 1, 0)
                for i, c in enumerate(
                    ((64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)), 2)]
    configs += [("+pool tail (f32)", 7, 1), ("+fc1 (2048->2048)", 7, 2)]

    prev = 0.0
    for name, ns, tail in configs:
        fn = jax.jit(
            lambda acc, w, ns=ns, tail=tail: acc
            + jnp.sum(prefix(w, ns, tail).astype(jnp.float32))
        )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, wave)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, wave)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:22} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms
    amin = args.files * 10.0 / 60.0
    print(f"full step at files={args.files}: {prev:.1f} ms -> "
          f"{amin / (prev / 1e3):.1f} audio-min/s/chip", flush=True)


if __name__ == "__main__":
    main()
