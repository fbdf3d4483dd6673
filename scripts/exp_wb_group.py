#!/usr/bin/env python
"""Per-stage group sweep for the WHOLE-BLOCK Swin kernel.

The global group sweep picked 4 (exp_swin_block.py); the attention-only
kernel's per-stage tuning (2 for C=96, 1 wider) added ~2.5% — the analogous
per-stage sweep for the whole-block kernel was never run. Post-tap4
profile: swin1 (C=96) is the biggest slice at 4.24 ms of the 11.4 ms step.

Sweeps group per channel width (stage4 is demoted to attention-only by
_swin_block, so only C in {96, 192, 384} matter).

Usage: python scripts/exp_wb_group.py [--iters 12]
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
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.ops import pallas_window_attn as pwa
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params = cast_model_params(
        "clap", M.init_clap_params(jax.random.PRNGKey(0)), jnp.bfloat16
    )
    mel = jax.random.normal(jax.random.PRNGKey(1), (32, 1001, 64), jnp.float32) * 10.0

    def bench(label, group_map):
        orig = pwa.swin_block_fused

        def wrapped(windows, *a, **kw):
            c = windows.shape[-1]
            g = group_map.get(c, 4)
            kw["group"] = min(g, kw["num_windows"])
            return orig(windows, *a, **kw)

        pwa.swin_block_fused = wrapped
        try:
            fn = jax.jit(
                lambda acc, m: acc
                + jnp.sum(
                    M.clap_forward.__wrapped__(params, m, attn="fused_block")
                    .astype(jnp.float32)
                )
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
            print(f"{label:24} {ms:7.2f} ms ({amin / (ms / 1e3):6.1f} audio-min/s)",
                  flush=True)
        finally:
            pwa.swin_block_fused = orig

    bench("baseline (all 4)", {})
    for c in (96, 192, 384):
        for g in (2, 8):
            bench(f"C={c} group={g}", {c: g})
    # re-baseline for drift
    bench("baseline (all 4)", {})


if __name__ == "__main__":
    main()
