#!/usr/bin/env python
"""encodec-48k: bf16 for LATE stages only (stage3/4 +- stage2).

The round-2d precision study rejected early-stage bf16 (conv_in + 2 or 4
stages: ~0.8-1% relative embedding error, no better than full-mixed) — the
error concentrates in bf16 quantization of the raw-waveform path. The
LATE-stage-only mix was never measured: by stage 3 the signal is deep in
feature space ([B, 7.5k/1.5k, 256/512]) where bf16 rounding is ordinary
activation noise, and stages 3+4 carry 14.9 ms of the 149.8 ms step
(pre-LSTM-fix numbers). GN stays in the stage dtype (f32 moments via the
one-pass trick read bf16 inputs — same as the 24k mixed mode's layer mix).

Variants: f32 (baseline) / s4 (stage4 bf16) / s34 / s234.
Measures: full-forward timing, embedding delta, synthetic-dir FAD delta.

Usage: python scripts/exp_48k_late_bf16.py [--iters 8]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as E
    from frechet_audio_distance_exported_tpu.ops import stats as stats_ops

    print(f"backend: {jax.default_backend()}", flush=True)
    params32 = E.init_encodec_params(jax.random.PRNGKey(0), causal=False, channels=2)

    def cast_stages(params, bf16_stages):
        """bf16_stages: set of stage indices (0-based) to cast to bf16."""
        import copy

        p = copy.deepcopy(params)

        def cast(tree):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                tree,
            )

        p["stages"] = [
            cast(s) if i in bf16_stages else s for i, s in enumerate(p["stages"])
        ]
        return p

    def make_fwd(params):
        def fwd(w):
            x = w.astype(jnp.float32)
            h = jnp.swapaxes(x, 1, 2)
            h = E._sconv(params["conv_in"], h, kernel=7, stride=1, causal=False)
            for ratio, stage in zip(E.RATIOS, params["stages"]):
                h = h.astype(stage["res"]["conv1"]["w"].dtype)
                h = E._res_block(stage["res"], h, False)
                h = jax.nn.elu(h)
                h = E._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=False)
            h = h.astype(jnp.float32)
            h = E._slstm(params["lstm"], h, op_dtype=jnp.bfloat16)
            h = jax.nn.elu(h)
            h = E._sconv(params["conv_out"], h, kernel=7, stride=1, causal=False)
            return h

        return fwd

    B, S = 16, 480000
    wave = jax.random.normal(jax.random.PRNGKey(2), (B, 2, S), jnp.float32) * 0.1

    def timed(fn):
        g = jax.jit(lambda a, ww: a + jnp.sum(fn(ww).astype(jnp.float32)))
        acc = jnp.zeros((), jnp.float32)
        acc = g(acc, wave)
        jax.block_until_ready(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = g(acc, wave)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / args.iters * 1e3

    def fad(emb_bg, emb_ev):
        mu1, s1 = np.mean(emb_bg, 0), np.cov(emb_bg, rowvar=False)
        mu2, s2 = np.mean(emb_ev, 0), np.cov(emb_ev, rowvar=False)
        return stats_ops.frechet_distance_eigh_np(mu1, s1, mu2, s2)

    def dirs(fn):
        out = []
        for seed in (10, 20):
            w = jax.random.normal(jax.random.PRNGKey(seed), (32, 2, S), jnp.float32) * (
                0.05 + 0.002 * seed
            )
            es = []
            for i in range(0, 32, B):
                e = jax.jit(fn)(w[i : i + B])
                es.append(np.asarray(e.astype(jnp.float32), np.float64))
            e = np.concatenate(es)
            out.append(e.reshape(-1, e.shape[-1]))
        return out

    variants = [
        ("f32 ", set()),
        ("s4  ", {3}),
        ("s34 ", {2, 3}),
        ("s234", {1, 2, 3}),
    ]
    ref_emb = None
    ref_fad = None
    amin = B * 10.0 / 60.0
    for name, st in variants:
        fn = make_fwd(cast_stages(params32, st))
        ms = timed(fn)
        emb = np.asarray(jax.jit(fn)(wave).astype(jnp.float32), np.float64)
        if ref_emb is None:
            ref_emb = emb
        d = np.max(np.abs(emb - ref_emb))
        rel = d / np.max(np.abs(ref_emb))
        bg, ev = dirs(fn)
        v = fad(bg, ev)
        if ref_fad is None:
            ref_fad = v
        print(
            f"{name} {ms:7.2f} ms ({amin/(ms/1e3):5.1f} audio-min/s)  "
            f"emb rel {rel:.1e}  FAD {v:.6f} (|delta| {abs(v-ref_fad):.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
