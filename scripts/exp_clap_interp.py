#!/usr/bin/env python
"""CLAP stage-0 bicubic-interp experiments.

Round-3 sub-profile (exp_clap_stage0.py): the 1001->1024 bicubic time-interp
einsum is 2.12 ms of the ~20 ms B=32 CLAP step — a 4.2 GFLOP f32 matmul at
~5% of roofline (HIGH precision = 3 bf16 passes, [B, 1001, 64] operand with
a 64-element minor dim).

Variants (full clap_forward, scalar forcing, chain dispatch):
  stock     : shipped path (f32 einsum, HIGH precision)
  bf16      : interp matrix + log_mel cast to bf16, DEFAULT precision,
              f32 accumulation (1 MXU pass instead of 3)
  bf16T     : bf16 + transposed formulation — contract on [B, 64, 1001]
              so the matmul output [B, 64, 1024] lands full-lane and
              feeds reshape_wav2img's [B, q, f, tt] layout directly
              (skips the separate transpose materialization)

Embedding-level delta vs stock is printed for each variant (the FAD-level
bar is checked separately by exp_fused_block_fad.py-style scoring).

Usage: python scripts/exp_clap_interp.py [--batch 32] [--iters 16] [--cpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from frechet_audio_distance_exported_tpu.config import matmul_precision, model_dtype
    from frechet_audio_distance_exported_tpu.models import clap as clap_mod
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.clap import (
        EMBED_DIM, FREQ_RATIO, MEL_BINS, NUM_HEADS, SPEC_SIZE, TARGET_T,
        WINDOW_SIZE, _STAGE_RES, _bicubic_time_matrix, _patch_merging,
        _resolve_attn, _swin_block, init_clap_params,
    )
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, B={args.batch}", flush=True)
    params = init_clap_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("clap", params, dt)

    log_mel = (
        jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1001, 64), jnp.float32)
        * 2.0 - 4.0
    )

    def tail_from_img(x, b, fused_attn):
        pe = params["patch_embed"]
        x = x.astype(pe["conv"]["w"].dtype)
        x = common.conv2d(x, pe["conv"]["w"], pe["conv"]["b"], stride=(4, 4), padding="VALID")
        x = x.reshape(b, -1, EMBED_DIM)
        x = common.layer_norm(x, **pe["norm"])
        for i, stage in enumerate(params["stages"]):
            res, heads = _STAGE_RES[i], NUM_HEADS[i]
            for j, blk in enumerate(stage["blocks"]):
                shift = 0 if (j % 2 == 0 or res <= WINDOW_SIZE) else WINDOW_SIZE // 2
                x = _swin_block(blk, x, res, heads, shift, fused_attn)
            if "downsample" in stage:
                x = _patch_merging(stage["downsample"], x, res)
        x = common.layer_norm(x, **params["norm"]).astype(jnp.float32)
        emb = jnp.mean(x, axis=1)
        proj = params["projection"]
        emb = jax.nn.relu(common.linear(emb, **proj["fc1"]))
        emb = common.linear(emb, **proj["fc2"])
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    fused_attn = _resolve_attn("auto")
    interp_f32 = jnp.asarray(_bicubic_time_matrix(1001, TARGET_T))
    interp_bf16 = interp_f32.astype(jnp.bfloat16)

    def fwd(log_mel, mode):
        b, t, f = log_mel.shape
        if mode == "stock":
            x = jnp.einsum(
                "ot,btf->bof", interp_f32, log_mel,
                preferred_element_type=jnp.float32, precision=matmul_precision(),
            )
            x = common.batch_norm(x, params["bn0"])
            x = x.reshape(b, FREQ_RATIO, TARGET_T // FREQ_RATIO, MEL_BINS)
            x = jnp.transpose(x, (0, 1, 3, 2))
            x = x.reshape(b, SPEC_SIZE, SPEC_SIZE)[..., None]
        elif mode == "bf16":
            x = jnp.einsum(
                "ot,btf->bof", interp_bf16, log_mel.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            x = common.batch_norm(x, params["bn0"])
            x = x.reshape(b, FREQ_RATIO, TARGET_T // FREQ_RATIO, MEL_BINS)
            x = jnp.transpose(x, (0, 1, 3, 2))
            x = x.reshape(b, SPEC_SIZE, SPEC_SIZE)[..., None]
        else:  # bf16T
            # [B, t, f] -> [B, f, t]; contract t on the lane dim; the output
            # [B, f, 1024] feeds wav2img without the separate big transpose.
            xT = jnp.swapaxes(log_mel, 1, 2).astype(jnp.bfloat16)  # [B, 64, 1001]
            x = jnp.einsum(
                "bft,ot->bfo", xT, interp_bf16,
                preferred_element_type=jnp.float32,
            )  # [B, 64, 1024]
            # bn0 is per-mel-bin: broadcast over the trailing time dim.
            p = params["bn0"]
            scale = p["gamma"] * jax.lax.rsqrt(p["var"] + 1e-5)
            shift = p["beta"] - p["mean"] * scale
            x = x * scale[None, :, None] + shift[None, :, None]
            # wav2img from [B, f, T]: target [B, q, f, tt] with T = q*tt
            x = x.reshape(b, MEL_BINS, FREQ_RATIO, TARGET_T // FREQ_RATIO)
            x = jnp.transpose(x, (0, 2, 1, 3))
            x = x.reshape(b, SPEC_SIZE, SPEC_SIZE)[..., None]
        return tail_from_img(x, b, fused_attn)

    # CPU-exactness of the bf16T reshape plumbing: bf16 vs bf16T share the
    # operand dtype, so any difference beyond matmul association order is a
    # plumbing bug; stock-vs-bf16 shows the pure dtype effect.
    if args.cpu:
        a = fwd(log_mel[:2], "stock")
        b16 = fwd(log_mel[:2], "bf16")
        b16t = fwd(log_mel[:2], "bf16T")
        print(f"bf16  vs stock: {float(jnp.max(jnp.abs(b16 - a))):.2e}", flush=True)
        print(f"bf16T vs bf16 : {float(jnp.max(jnp.abs(b16t - b16))):.2e}", flush=True)
        return

    ref_emb = None
    for mode in ("stock", "bf16", "bf16T"):
        fn = jax.jit(
            lambda acc, lm, mode=mode: acc + jnp.sum(fwd(lm, mode).astype(jnp.float32))
        )
        emb = jax.jit(functools.partial(fwd, mode=mode))(log_mel)
        emb.block_until_ready()
        if ref_emb is None:
            ref_emb = emb
        delta = float(jnp.max(jnp.abs(emb.astype(jnp.float32) - ref_emb.astype(jnp.float32))))
        cos = float(jnp.mean(jnp.sum(emb * ref_emb, axis=-1)))
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, log_mel)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, log_mel)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        amin = args.batch * 10.0 / 60.0
        print(
            f"{mode:6} {ms:8.2f} ms  {amin / (ms / 1e3):7.1f} audio-min/s  "
            f"emb max-abs {delta:.2e} cos {cos:.6f}  (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
