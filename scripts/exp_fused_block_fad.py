#!/usr/bin/env python
"""Acceptance probe for the whole-block Swin kernel: FAD-level delta of the
shipped TPU path (bf16 weights + fused_block attention) vs the reference
numerics (f32 weights + XLA attention), on synthetic log-mel "dirs" with an
O(1) true FAD. Mirrors the round-2d measurement that accepted the
attention-only kernel (2.06e-4 vs the 1e-3 bar).

Usage: python scripts/exp_fused_block_fad.py [--n 256]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256, help="files per dir")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.ops import stats
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    params32 = M.init_clap_params(jax.random.PRNGKey(0))
    params16 = cast_model_params("clap", params32, jnp.bfloat16)

    rng = np.random.default_rng(7)
    # Two "dirs" drawn from visibly different log-mel statistics so the true
    # FAD is O(1) — deltas are then meaningful on the reference's own scale.
    bg = rng.standard_normal((args.n, 1001, 64)).astype(np.float32) * 10.0 - 30.0
    ev = rng.standard_normal((args.n, 1001, 64)).astype(np.float32) * 12.0 - 25.0

    def embed(params, mels, attn, in_dtype):
        # The shipped pipeline casts the log-mel itself to the model dtype
        # before clap_forward (pipeline.bf16_forward, cast_input=True), so the
        # bf16 variants must include the input-quantization error too.
        outs = []
        for i in range(0, len(mels), 32):
            x = jnp.asarray(mels[i:i + 32]).astype(in_dtype)
            outs.append(np.asarray(
                M.clap_forward(params, x, attn=attn).astype(jnp.float32),
                np.float64))
        return np.concatenate(outs)

    def fad(params, attn, in_dtype):
        e_bg = embed(params, bg, attn, in_dtype)
        e_ev = embed(params, ev, attn, in_dtype)
        mu1, s1 = e_bg.mean(0), np.cov(e_bg, rowvar=False)
        mu2, s2 = e_ev.mean(0), np.cov(e_ev, rowvar=False)
        return stats.frechet_distance_np(mu1, s1, mu2, s2)

    ref = fad(params32, "xla", jnp.float32)
    print(f"f32 + xla          : {ref:.8f}", flush=True)
    for label, p, attn in (
        ("bf16 + xla        ", params16, "xla"),
        ("bf16 + fused      ", params16, "fused"),
        ("bf16 + fused_block", params16, "fused_block"),
    ):
        v = fad(p, attn, jnp.bfloat16)
        print(f"{label}: {v:.8f}  |delta|={abs(v - ref):.3e}", flush=True)


if __name__ == "__main__":
    main()
