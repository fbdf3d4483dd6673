#!/usr/bin/env python
"""Experiment: whole-Swin-block Pallas kernel (attention + MLP) vs the
attention-only kernel + XLA MLP.

The attention-only kernel (shipped round 2d, 1.4x) still round-trips its
output through HBM for the MLP half: LN2 read, [tokens, 4C] fc1
intermediate write+read, residual read. The whole-block kernel keeps the
MLP in VMEM per grid cell — the MLP is per-token, so window space is exact.

Measures (B=32, bf16, shipped CLAP dtype):
  1. numerics: full-forward fused vs fused_block embedding delta
  2. full-forward time: fused vs fused_block
  3. fused_block group sweep {1, 2, 4} (per-cell work doubled vs attention-
     only, so the round-2d optimum may shift)

Usage: python scripts/exp_swin_block.py [--iters 12]
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
    import numpy as np

    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.ops import pallas_window_attn as pwa
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params = cast_model_params(
        "clap", M.init_clap_params(jax.random.PRNGKey(0)), jnp.bfloat16
    )
    mel = jax.random.normal(jax.random.PRNGKey(1), (32, 1001, 64), jnp.float32) * 10.0

    # --- numerics (B=4 to keep compile cheap) ---
    a = M.clap_forward(params, mel[:4], attn="fused")
    b = M.clap_forward(params, mel[:4], attn="fused_block")
    d = float(jnp.max(jnp.abs(a - b)))
    cos = float(jnp.min(jnp.sum(a * b, axis=-1)))
    print(f"numerics fused vs fused_block: max|d|={d:.2e} min cos={cos:.6f}",
          flush=True)

    # --- timing ---
    def bench(label, attn, group_override=None):
        orig = pwa.swin_block_fused

        if group_override is not None:
            def wrapped(*a, **kw):
                kw["group"] = min(group_override, kw["num_windows"])
                return orig(*a, **kw)
            pwa.swin_block_fused = wrapped
        try:
            # trace the UNJITTED forward: clap_forward's inner jit cache is
            # keyed only on (avals, attn) and would ignore the group patch
            fn = jax.jit(
                lambda acc, m: acc
                + jnp.sum(
                    M.clap_forward.__wrapped__(params, m, attn=attn)
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
            print(f"{label:32} {ms:7.2f} ms ({amin / (ms / 1e3):6.1f} audio-min/s)",
                  flush=True)
        finally:
            pwa.swin_block_fused = orig

    bench("fused (attention-only kernel)", "fused")
    bench("fused_block (default groups)", "fused_block")
    for g in (1, 2, 4, 8, 16):
        bench(f"fused_block group={g}", "fused_block", group_override=g)

    # --- mixed per-stage mode: whole-block only for C <= threshold ---
    # (the wide late stages stream [C, 4C]+[4C, C] fc weights per grid cell
    # over few tokens; attention-only + XLA MLP may win there). Patch
    # _swin_block's mode, NOT _fused_call's whole_block flag — the latter
    # would silently drop the MLP half for demoted stages.
    orig_block = M._swin_block

    def make_mixed(cmax):
        def mixed(p, x, res, heads, shift, mode):
            if mode == "fused_block" and x.shape[-1] > cmax:
                mode = "fused"
            return orig_block(p, x, res, heads, shift, mode)
        return mixed

    for cmax in (96, 192, 384):
        M._swin_block = make_mixed(cmax)
        try:
            bench(f"fused_block only C<={cmax}", "fused_block")
        finally:
            M._swin_block = orig_block


if __name__ == "__main__":
    main()
