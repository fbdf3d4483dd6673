#!/usr/bin/env python
"""Sub-slice profile of CLAP stage 0 (bicubic interp matmul -> bn0 ->
reshape_wav2img -> 4x4 patch embed -> LN), which is ~30% of the CLAP step
now that the Swin stages run in the whole-block Pallas kernel.

Times prefixes with scalar forcing and chain dispatch. Caveat: forcing an
intermediate changes what XLA can fuse, so deltas are indicative, not
exact attributions.

Usage: python scripts/exp_clap_stage0.py [--iters 16] [--batch 32] [--cpu]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import (
        matmul_precision, model_dtype,
    )
    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, B={args.batch}", flush=True)
    params = M.init_clap_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("clap", params, dt)

    mel = jax.random.normal(jax.random.PRNGKey(1), (args.batch, 1001, 64),
                            jnp.float32) * 10.0 - 30.0

    def prefix(log_mel, n: int):
        """Shipped stage-0 math (mirrors clap_forward) cut after sub-step n.
        Since round 3 the interp runs as the 4-tap gather form (clap.py
        _bicubic_taps); pass n=-1 for the old dense einsum, for comparison."""
        b, t, f = log_mel.shape
        if n == -1:
            interp = jnp.asarray(M._bicubic_time_matrix(t, M.TARGET_T))
            return jnp.einsum("ot,btf->bof", interp, log_mel,
                              preferred_element_type=jnp.float32,
                              precision=matmul_precision())
        idx, w = M._bicubic_taps(t, M.TARGET_T)
        idx, w = jnp.asarray(idx), jnp.asarray(w)
        x = None
        for k in range(4):
            term = w[:, k][None, :, None] * jnp.take(log_mel, idx[:, k], axis=1)
            x = term if x is None else x + term
        if n == 0:
            return x
        x = common.batch_norm(x, params["bn0"])
        if n == 1:
            return x
        x = x.reshape(b, M.FREQ_RATIO, M.TARGET_T // M.FREQ_RATIO, M.MEL_BINS)
        x = jnp.transpose(x, (0, 1, 3, 2))
        x = x.reshape(b, M.SPEC_SIZE, M.SPEC_SIZE)[..., None]
        if n == 2:
            return x
        pe = params["patch_embed"]
        x = x.astype(pe["conv"]["w"].dtype)
        x = common.conv2d(x, pe["conv"]["w"], pe["conv"]["b"], stride=(4, 4),
                          padding="VALID")
        if n == 3:
            return x
        x = x.reshape(b, -1, M.EMBED_DIM)
        x = common.layer_norm(x, **pe["norm"])
        return x

    names = ["dense einsum (old)", "interp tap4", "+bn0", "+reshape/transpose",
             "+patch conv", "+flatten/LN (full stage0)"]
    prev = 0.0
    for n, name in zip(range(-1, 5), names):
        fn = jax.jit(
            lambda acc, m, n=n: acc + jnp.sum(prefix(m, n).astype(jnp.float32))
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
        print(f"{name:28} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
