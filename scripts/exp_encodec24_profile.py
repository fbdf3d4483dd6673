#!/usr/bin/env python
"""Per-stage profile of the encodec-24k step at the new B=128 default.

The round-2d profile (B=32 mixed: conv_in 5.2, stage1 23.9, stage2 15.0,
stage3 4.3, stage4 1.3, LSTM 8.7, conv_out 0.5 = 58.9 ms) predates the
bf16-operand LSTM and the B=128 re-knee (99.3 -> 222.9 audio-min/s); this
re-ranks the hotspots for the shipped configuration (causal, mono, mixed
precision via cast_model_params, bf16-op LSTM).

Usage: python scripts/exp_encodec24_profile.py [--iters 12] [--batch 128]
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
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as enc
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, B={args.batch}", flush=True)
    params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)
    params = cast_model_params("encodec", params, jnp.bfloat16)
    t = 240000  # 10 s @ 24 kHz
    x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1, t), jnp.float32) * 0.3

    def prefix_forward(params, wave, n_stages: int, lstm: bool, out: bool):
        h = jnp.swapaxes(wave, 1, 2).astype(params["conv_in"]["w"].dtype)
        h = enc._sconv(params["conv_in"], h, kernel=7, stride=1, causal=True)
        for ratio, stage in list(zip(enc.RATIOS, params["stages"]))[:n_stages]:
            h = h.astype(stage["res"]["conv1"]["w"].dtype)
            h = enc._res_block(stage["res"], h, causal=True)
            h = jax.nn.elu(h)
            h = enc._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=True)
        if lstm:
            h = h.astype(jnp.float32)
            h = enc._slstm(params["lstm"], h, op_dtype=jnp.bfloat16)
        if out:
            h = jax.nn.elu(h)
            h = enc._sconv(params["conv_out"], h, kernel=7, stride=1, causal=True)
        return h

    configs = [
        ("conv_in", 0, False, False),
        ("+stage1", 1, False, False),
        ("+stage2", 2, False, False),
        ("+stage3", 3, False, False),
        ("+stage4", 4, False, False),
        ("+lstm", 4, True, False),
        ("+conv_out (full)", 4, True, True),
    ]
    prev = 0.0
    for name, ns, lstm, out in configs:
        fn = jax.jit(
            lambda acc, w, ns=ns, lstm=lstm, out=out: acc
            + jnp.sum(prefix_forward(params, w, ns, lstm, out).astype(jnp.float32))
        )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, x)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, x)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:18} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms
    amin = args.batch * 10.0 / 60.0
    print(f"full step at B={args.batch}: {prev:.1f} ms -> "
          f"{amin / (prev / 1e3):.1f} audio-min/s/chip", flush=True)


if __name__ == "__main__":
    main()
