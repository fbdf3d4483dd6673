#!/usr/bin/env python
"""Per-stage profile of the CLAP (HTSAT-tiny) step (TODO #7: stage-0 slice).

Times prefix-slices of clap_forward — stage0 (bicubic interp matmul + bn0 +
reshape_wav2img + 4x4 patch embed + LN), each Swin stage, final norm +
projection — with scalar forcing and chain dispatch, so per-stage costs are
the differences. ``--attn xla`` profiles the XLA assembly instead of the
fused Pallas kernel (useful when the remote Pallas compile path is slow).

Usage: python scripts/exp_clap_profile.py [--iters 16] [--batch 32] [--attn auto]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--attn", default="auto", choices=["auto", "fused", "xla"])
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU platform (the env sitecustomize overrides "
                         "JAX_PLATFORMS, so the env var alone does NOT work)")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, attn={args.attn}", flush=True)
    params = M.init_clap_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("clap", params, dt)
    fused = M._resolve_attn(args.attn)

    def prefix_forward(params, log_mel, n_stages: int, tail: bool):
        b, t, f = log_mel.shape
        interp = jnp.asarray(M._bicubic_time_matrix(t, M.TARGET_T)).astype(log_mel.dtype)
        h = jnp.einsum("ot,btf->bof", interp, log_mel)
        h = common.batch_norm(h, params["bn0"])
        h = h.reshape(b, 4, 256, 64)
        h = jnp.transpose(h, (0, 1, 3, 2)).reshape(b, 256, 256)[..., None]
        pe = params["patch_embed"]
        h = common.conv2d(h, pe["conv"]["w"], pe["conv"]["b"], stride=(4, 4), padding="VALID")
        h = h.reshape(b, -1, 96)
        h = common.layer_norm(h, **pe["norm"])
        for i, stage in enumerate(params["stages"][:n_stages]):
            res, heads = M._STAGE_RES[i], M.NUM_HEADS[i]
            for j, blk in enumerate(stage["blocks"]):
                shift = 0 if (j % 2 == 0 or res <= M.WINDOW_SIZE) else M.WINDOW_SIZE // 2
                h = M._swin_block(blk, h, res, heads, shift, fused)
            if "downsample" in stage:
                h = M._patch_merging(stage["downsample"], h, res)
        if tail:
            h = common.layer_norm(h, **params["norm"])
            emb = jnp.mean(h, axis=1)
            proj = params["projection"]
            emb = jax.nn.relu(common.linear(emb, **proj["fc1"]))
            emb = common.linear(emb, **proj["fc2"])
            return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return h

    mel = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1001, 64), jnp.float32)
    mel = (mel * 3.0 - 40.0).astype(dt)

    configs = [("stage0 (interp..LN)", 0, False)] + [
        (f"+swin{i}", i, False) for i in (1, 2, 3, 4)
    ] + [("+tail (full)", 4, True)]
    prev = 0.0
    for name, ns, tail in configs:
        fn = jax.jit(
            lambda acc, m, ns=ns, tail=tail: acc
            + jnp.sum(prefix_forward(params, m, ns, tail).astype(jnp.float32))
        )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, mel)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, mel)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:20} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms
    amin = args.batch * 10.0 / 60.0
    print(f"full step at B={args.batch}: {prev:.1f} ms -> "
          f"{amin / (prev / 1e3):.1f} audio-min/s/chip (frontend excluded)", flush=True)


if __name__ == "__main__":
    main()
