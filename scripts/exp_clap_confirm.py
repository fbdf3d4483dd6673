#!/usr/bin/env python
"""Confirm the shipped CLAP default path (attn='auto' -> whole-block kernel
for stages 1-3, attention-only at stage 4) full-forward throughput.

Usage: python scripts/exp_clap_confirm.py [--iters 16]
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

    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params = cast_model_params(
        "clap", M.init_clap_params(jax.random.PRNGKey(0)), jnp.bfloat16
    )
    mel = jax.random.normal(jax.random.PRNGKey(1), (32, 1001, 64), jnp.float32) * 10.0

    fn = jax.jit(
        lambda acc, m: acc
        + jnp.sum(M.clap_forward(params, m).astype(jnp.float32))
    )
    acc = jnp.zeros((), jnp.float32)
    acc = fn(acc, mel)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        acc = fn(acc, mel)
    float(acc)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    amin = 32 * 10.0 / 60.0
    print(f"clap auto (shipped): {ms:7.2f} ms ({amin / (ms / 1e3):6.1f} audio-min/s)",
          flush=True)


if __name__ == "__main__":
    main()
