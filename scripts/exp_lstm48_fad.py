#!/usr/bin/env python
"""48k Encodec: bf16-operand LSTM inside the otherwise-f32 default path.

The 48k full-mixed rejection (PARITY.md) was driven by bf16 quantization of
the raw-waveform early stages, NOT the LSTM: the operand-only rounding
measured 9.1e-5 relative at the LSTM output (exp_lstm_bf16.py). If the
48k FAD delta here is well inside the 1e-3 bar, the 48k default can keep
f32 convs and still take the 1.82x LSTM scan (12.6 ms of the 149.8 ms
step). Measures: full-step timing f32-LSTM vs bf16-op-LSTM, embedding
delta, synthetic-dir FAD delta.

Usage: python scripts/exp_lstm48_fad.py [--iters 8]
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
    params = E.init_encodec_params(jax.random.PRNGKey(0), causal=False, channels=2)

    def make_fwd(op_dtype):
        def fwd(w):
            x = w.astype(jnp.float32)
            h = jnp.swapaxes(x, 1, 2)
            h = E._sconv(params["conv_in"], h, kernel=7, stride=1, causal=False)
            for ratio, stage in zip(E.RATIOS, params["stages"]):
                h = E._res_block(stage["res"], h, False)
                h = jax.nn.elu(h)
                h = E._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=False)
            h = E._slstm(params["lstm"], h, op_dtype=op_dtype)
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

    f32 = make_fwd(jnp.float32)
    b16 = make_fwd(jnp.bfloat16)
    ms_a = timed(f32)
    ms_b = timed(b16)
    amin = B * 10.0 / 60.0
    print(
        f"48k B={B} full fwd: f32-lstm {ms_a:7.2f} ms ({amin/(ms_a/1e3):5.1f} audio-min/s), "
        f"bf16-ops {ms_b:7.2f} ms ({amin/(ms_b/1e3):5.1f}, {ms_a/ms_b:4.2f}x)",
        flush=True,
    )

    ea = np.asarray(jax.jit(f32)(wave), np.float64)
    eo = np.asarray(jax.jit(b16)(wave), np.float64)
    d = np.max(np.abs(ea - eo))
    print(f"emb delta: {d:.3e} (rel {d/np.max(np.abs(ea)):.1e})", flush=True)

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

    bg_a, ev_a = dirs(f32)
    ref = fad(bg_a, ev_a)
    bg_b, ev_b = dirs(b16)
    v = fad(bg_b, ev_b)
    print(f"FAD f32-lstm {ref:.8f} vs bf16-ops {v:.8f}  |delta|={abs(v-ref):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
