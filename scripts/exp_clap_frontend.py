#!/usr/bin/env python
"""CLAP 48 kHz mel-frontend scaling probe: why does the fused step lose at
B=64 when the bare forward wins there?

Implied frontend+stats slice (fused-step minus forward-only, interleaved
bench runs): ~1.6 ms at B=32 but ~5.6 ms at B=64. Times the frontend alone
(pann_logmel_batch at the CLAP config), the stats epilogue alone, and the
full fused step at B in {32, 64}, plus the frontend's chunk stages, to
locate the superlinearity.

Usage: python scripts/exp_clap_frontend.py [--iters 16]
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
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops import stats
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params = M.init_clap_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("clap", params, dt)

    n_fft = fe.PANN_CONFIGS[fe.CLAP_SAMPLE_RATE]["window_size"]
    length = fe.CLAP_MAX_SAMPLES + n_fft

    def timed(fn, *xs):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, *xs)
        jax.block_until_ready(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, *xs)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / args.iters * 1e3, compile_s

    for b in (32, 64):
        wave = (
            jax.random.normal(jax.random.PRNGKey(1), (b, length), jnp.float32) * 0.1
        )
        n_valid = jnp.full((b,), fe.CLAP_TIME_FRAMES, jnp.int32)
        mel_const = jax.random.normal(
            jax.random.PRNGKey(2), (b, fe.CLAP_TIME_FRAMES, 64), jnp.float32
        )
        emb_const = jax.random.normal(jax.random.PRNGKey(3), (b, 512), jnp.float32)

        front = jax.jit(lambda acc, w, nv: acc + jnp.sum(
            fe.pann_logmel_batch(w, fe.CLAP_SAMPLE_RATE, fe.CLAP_TIME_FRAMES, nv)))
        fwd = jax.jit(lambda acc, m: acc + jnp.sum(
            M.clap_forward(params, m.astype(dt)).astype(jnp.float32)))

        def stats_step(acc_scalar, e):
            st = stats.init_stats(512)
            st = stats.update_stats(st, e, jnp.ones((e.shape[0],), jnp.float32))
            return acc_scalar + st.n

        stats_fn = jax.jit(stats_step)

        def fused(acc, w, nv):
            mel = fe.pann_logmel_batch(w, fe.CLAP_SAMPLE_RATE, fe.CLAP_TIME_FRAMES, nv)
            emb = M.clap_forward(params, mel.astype(dt)).astype(jnp.float32)
            return acc + jnp.sum(emb)

        fused_fn = jax.jit(fused)

        for name, fn, xs in (
            ("frontend only", front, (wave, n_valid)),
            ("forward only (const mel)", fwd, (mel_const,)),
            ("stats only (const emb)", stats_fn, (emb_const,)),
            ("frontend+forward fused", fused_fn, (wave, n_valid)),
        ):
            ms, comp = timed(fn, *xs)
            print(f"B={b:3} {name:26} {ms:8.2f} ms (compile {comp:.0f}s)", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
