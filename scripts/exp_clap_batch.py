#!/usr/bin/env python
"""CLAP batch-size sweep with the whole-block Swin kernel.

The shipped B=32 default was measured against the XLA attention assembly
(round 2: 207 -> 189 audio-min/s at B=64). The whole-block kernel streams
fc1/fc2 weights per grid cell, so a larger batch amortizes differently —
re-sweep B with attn='auto'.

Usage: python scripts/exp_clap_batch.py [--iters 16]
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
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params = M.init_clap_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("clap", params, dt)

    for b in (16, 32, 64, 128):
        log_mel = (
            jax.random.normal(jax.random.PRNGKey(1), (b, 1001, 64), jnp.float32)
            * 2.0 - 4.0
        )
        fn = jax.jit(
            lambda acc, lm: acc + jnp.sum(M.clap_forward(params, lm).astype(jnp.float32))
        )
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
        amin = b * 10.0 / 60.0
        print(f"B={b:4} {ms:8.2f} ms  {amin / (ms / 1e3):7.1f} audio-min/s  "
              f"({ms / b:.3f} ms/file, compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
