#!/usr/bin/env python
"""VGGish fused Pallas frontend vs the shipped single-matmul XLA form.

The VGGish frontend is 9.44 ms of the 42.3 ms step at B=256
(exp_vggish_profile.py). The PANN/CLAP pipelined kernel was accepted
(+23% CLAP); this measures the VGGish-geometry variant
(ops/pallas_frontend.fused_vggish_logmel: magnitude STFT, HTK mel,
log(x+0.01)) standalone and inside the full fused step.

Usage: python scripts/exp_vggish_pallas_front.py [--iters 16]
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
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models.vggish import (
        init_vggish_params,
        vggish_forward,
    )
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops.pallas_frontend import (
        fused_vggish_logmel,
    )
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    B, P = 256, 10
    num_frames = P * fe.VGGISH_PATCH_FRAMES  # 960
    s = num_frames * fe.VGGISH_HOP + fe.VGGISH_FFT
    wave = jax.random.normal(jax.random.PRNGKey(1), (B, s), jnp.float32) * 0.1

    params = init_vggish_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("vggish", params, dt)

    def timed(fn, *xs):
        acc = jnp.zeros((), jnp.float32)
        acc = fn(acc, *xs)
        jax.block_until_ready(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, *xs)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # numerics: kernel vs shipped XLA (bf16 DEFAULT vs HIGH single-matmul)
    mel_x = fe.vggish_logmel_batch(wave[:8], num_frames)
    mel_k = fused_vggish_logmel(wave[:8], num_frames)
    d = float(jnp.max(jnp.abs(mel_x - mel_k)))
    print(f"kernel-vs-xla log-mel max|diff| = {d:.3e} (log scale)", flush=True)

    front_x = jax.jit(lambda a, w: a + jnp.sum(fe.vggish_logmel_batch(w, num_frames)))
    front_k = jax.jit(lambda a, w: a + jnp.sum(fused_vggish_logmel(w, num_frames)))

    def step(frontend):
        def f(acc, params, w):
            mel = frontend(w)
            patches = mel.reshape(B, P, 96, 64).reshape(-1, 96, 64)
            emb = vggish_forward(params, patches.astype(dt))
            return acc + jnp.sum(emb.astype(jnp.float32))

        return jax.jit(f)

    step_x = step(lambda w: fe.vggish_logmel_batch(w, num_frames))
    step_k = step(lambda w: fused_vggish_logmel(w, num_frames))

    for _ in range(2):  # interleave twice
        ms_fx = timed(front_x, wave)
        ms_fk = timed(front_k, wave)
        ms_sx = timed(step_x, params, wave)
        ms_sk = timed(step_k, params, wave)
        amin = B * P * 0.96 / 60.0
        print(
            f"front xla {ms_fx:6.2f} ms | front kernel {ms_fk:6.2f} ms || "
            f"step xla {ms_sx:6.2f} ms ({amin/ms_sx*1e3:6.1f} am/s) | "
            f"step kernel {ms_sk:6.2f} ms ({amin/ms_sk*1e3:6.1f} am/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
