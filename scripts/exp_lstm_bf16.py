#!/usr/bin/env python
"""Encodec LSTM: bf16 recurrent-matmul operands (f32 state) vs stock.

The shipped _slstm scan measures ~11.6 us/step (8.7 ms of the 58.9 ms
24k B=32 step) — AT the recurrent-matmul floor: the two in-scan dots
([B, 512] x [512, 2048] + [B, 1024] x [1024, 2048]) carry 201 MFLOP/step,
and at HIGH precision (3 bf16 passes) with M=32 row occupancy the MXU
floor is ~12.6 us/step. A Pallas kernel cannot beat math it doesn't
change (priced and dropped — the earlier overhead-based estimate used
H=128; the LSTM is H=512).

The one lever left is precision: cast ONLY the dot operands (h states +
recurrent weights) to bf16 with DEFAULT precision (1 MXU pass), keeping
the carried h/c state, gate nonlinearities, and accumulation in f32.
Round-2's rejection was the FULL bf16 recurrence (state included) which
destroyed FAD; operand-only rounding is damped each step by the
saturating gates instead of compounding in the carry.

Measures: scan timing (24k/48k shapes), full-forward embedding delta,
and a synthetic-dir FAD probe vs the f32 path.

Usage: python scripts/exp_lstm_bf16.py [--iters 16]
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


def bf16_slstm(p, x, unroll: int = 20):
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import common

    x = x.astype(jnp.float32)
    b, t, h = x.shape
    p0, p1 = p["l0"], p["l1"]
    gates_x0 = common.linear(x.reshape(b * t, h), p0["w_ih"], p0["b_ih"]).reshape(b, t, 4 * h)
    gates_x0 = jnp.swapaxes(gates_x0, 0, 1)
    w0hh = p0["w_hh"].astype(jnp.bfloat16)
    b0hh = p0["b_hh"]
    w1 = jnp.concatenate([p1["w_ih"], p1["w_hh"]], axis=0).astype(jnp.bfloat16)
    b1 = p1["b_ih"] + p1["b_hh"]

    def cell(gates, c_prev):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c), c

    def step(carry, gx0):
        h0, c0, h1, c1 = carry
        g0 = gx0 + jnp.matmul(
            h0.astype(jnp.bfloat16), w0hh, preferred_element_type=jnp.float32
        ) + b0hh
        y0, c0 = cell(g0, c0)
        g1 = jnp.matmul(
            jnp.concatenate([y0, h1], axis=-1).astype(jnp.bfloat16), w1,
            preferred_element_type=jnp.float32,
        ) + b1
        y1, c1 = cell(g1, c1)
        return (y0, c0, y1, c1), y1

    zeros = jnp.zeros((b, h), jnp.float32)
    _, ys = jax.lax.scan(step, (zeros, zeros, zeros, zeros), gates_x0, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1) + x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as E
    from frechet_audio_distance_exported_tpu.ops import stats as stats_ops

    print(f"backend: {jax.default_backend()}", flush=True)
    params = E.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)
    p = params["lstm"]

    def timed(fn, x):
        g = jax.jit(lambda a, xx: a + jnp.sum(fn(xx).astype(jnp.float32)))
        acc = jnp.zeros((), jnp.float32)
        acc = g(acc, x)
        jax.block_until_ready(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = g(acc, x)
        jax.block_until_ready(acc)
        return (time.perf_counter() - t0) / args.iters * 1e3

    for name, b, t in (("24k", 32, 750), ("48k", 16, 1500)):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, 512), jnp.float32) * 0.5
        ms_f32 = timed(lambda xx: E._slstm(p, xx), x)
        ms_b = timed(lambda xx: bf16_slstm(p, xx), x)
        a = E._slstm(p, x)
        o = bf16_slstm(p, x)
        d = float(jnp.max(jnp.abs(a - o)))
        rel = d / float(jnp.max(jnp.abs(a)))
        print(
            f"{name} B={b} T={t}: f32-scan {ms_f32:7.2f} ms, bf16-ops {ms_b:7.2f} ms "
            f"({ms_f32/ms_b:4.2f}x)  max|diff|={d:.3e} (rel {rel:.1e})",
            flush=True,
        )

    # Full-forward embedding delta + FAD probe (24k mixed precision, B=32).
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    pm = cast_model_params("encodec", params, jnp.bfloat16)
    wave = jax.random.normal(jax.random.PRNGKey(2), (32, 1, 240000), jnp.float32) * 0.1

    # The jitted entry's trace cache would serve the pre-swap trace for both
    # variants. Trace the unjitted body instead, and pin the baseline's
    # op_dtype to f32 explicitly (since round 3 the shipped default resolves
    # to bf16 operands on TPU via config.lstm_op_dtype(), which would make
    # swap=False measure bf16 too).
    raw_forward = E.encodec_forward_raw

    def fwd(swap):
        orig = E._slstm
        if swap:
            E._slstm = lambda pp, xx, unroll=20, **kw: bf16_slstm(pp, xx, unroll)
        else:
            E._slstm = lambda pp, xx, unroll=20, **kw: orig(
                pp, xx, unroll, op_dtype=jnp.float32
            )
        try:
            out = jax.jit(lambda w: raw_forward(pm, w, causal=True))(wave)
            return np.asarray(out.astype(jnp.float32), np.float64)
        finally:
            E._slstm = orig

    ea, eo = fwd(False), fwd(True)
    d = np.max(np.abs(ea - eo))
    rel = d / np.max(np.abs(ea))
    print(f"full-forward emb delta: {d:.3e} (rel {rel:.1e})", flush=True)

    # FAD probe: two synthetic dirs of 64 waves each.
    def fad(emb_bg, emb_ev):
        mu1, s1 = np.mean(emb_bg, 0), np.cov(emb_bg, rowvar=False)
        mu2, s2 = np.mean(emb_ev, 0), np.cov(emb_ev, rowvar=False)
        return stats_ops.frechet_distance_eigh_np(mu1, s1, mu2, s2)

    rng = np.random.default_rng(0)

    def dirs(swap):
        out = []
        for seed in (10, 20):
            k = jax.random.PRNGKey(seed)
            w = jax.random.normal(k, (64, 1, 240000), jnp.float32) * (0.05 + 0.02 * seed / 10)
            orig = E._slstm
            if swap:
                E._slstm = lambda pp, xx, unroll=20, **kw: bf16_slstm(pp, xx, unroll)
            else:
                E._slstm = lambda pp, xx, unroll=20, **kw: orig(
                    pp, xx, unroll, op_dtype=jnp.float32
                )
            try:
                e = jax.jit(lambda ww: raw_forward(pm, ww, causal=True))(w)
            finally:
                E._slstm = orig
            e = np.asarray(e.astype(jnp.float32), np.float64)
            out.append(e.reshape(-1, e.shape[-1]))
        return out

    bg_a, ev_a = dirs(False)
    ref = fad(bg_a, ev_a)
    bg_b, ev_b = dirs(True)
    v = fad(bg_b, ev_b)
    print(f"FAD f32-lstm {ref:.8f} vs bf16-ops {v:.8f}  |delta|={abs(v-ref):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
