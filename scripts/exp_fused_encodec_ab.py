#!/usr/bin/env python
"""Interleaved A/B of the fused Pallas encodec conv stages vs the XLA path.

Full forward (conv stages + LSTM + conv_out), B=16 x 10 s, f32, on TPU.
Variants: xla | fused(HIGHEST) | fused(DEFAULT). Scalar-fetch forcing
(block_until_ready lies through the tunnel — memory: axon-tpu-quirks).

Usage: python scripts/exp_fused_encodec_ab.py [--sr 48000] [--batch 16] [--reps 3]
"""

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.alarm(4500)

import jax
import jax.numpy as jnp
import numpy as np

from frechet_audio_distance_exported_tpu import config
from frechet_audio_distance_exported_tpu.models import encodec as enc
if not hasattr(enc, "_encoder_fused"):
    sys.exit(
        "fused encodec kernel torn out (round-5 hardware rejection); restore with:"
        " git apply -R scripts/patches/fused_encodec_kernel.patch"
    )

ap = argparse.ArgumentParser()
ap.add_argument("--sr", type=int, default=48000)
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--iters", type=int, default=6)
args = ap.parse_args()

causal = args.sr == 24000
ch = 1 if causal else 2
T = 10 * args.sr
B = args.batch

print(f"backend: {jax.default_backend()}  sr={args.sr} B={B} T={T}", flush=True)

params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=causal, channels=ch)
params = jax.device_put(params)
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, ch), jnp.float32) * 0.3
x = jax.device_put(x)


def tail(params, h):
    h = enc._slstm(params["lstm"], h, op_dtype=config.lstm_op_dtype())
    h = jax.nn.elu(h)
    return enc._sconv(params["conv_out"], h, kernel=7, stride=1, causal=causal)


@jax.jit
def f_xla(params, x):
    h = enc._sconv(params["conv_in"], x, kernel=7, stride=1, causal=causal)
    for ratio, stage in zip(enc.RATIOS, params["stages"]):
        h = enc._res_block(stage["res"], h, causal)
        h = jax.nn.elu(h)
        h = enc._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=causal)
    return jnp.sum(tail(params, h)), None


def make_fused(precision):
    @jax.jit
    def f(params, x):
        h = enc._encoder_fused(params, x, causal, precision=precision)
        return jnp.sum(tail(params, h)), None

    return f

variants = {
    "xla": f_xla,
    "fused_hi": make_fused(jax.lax.Precision.HIGHEST),
    "fused_def": make_fused(jax.lax.Precision.DEFAULT),
}

# Compile + numerics first.
vals = {}
for name, fn in variants.items():
    t0 = time.time()
    v, _ = fn(params, x)
    vals[name] = float(v)
    print(f"{name}: compile+run {time.time()-t0:.1f}s  sum={vals[name]:.6f}", flush=True)
ref = vals["xla"]
for name, v in vals.items():
    print(f"{name}: rel dev vs xla {abs(v-ref)/max(abs(ref),1e-9):.3e}", flush=True)

# Full-output numerics (not just the sum).
outs = {}
for name, fn in variants.items():
    if name == "xla":
        @jax.jit
        def full(params, x):
            h = enc._sconv(params["conv_in"], x, kernel=7, stride=1, causal=causal)
            for ratio, stage in zip(enc.RATIOS, params["stages"]):
                h = enc._res_block(stage["res"], h, causal)
                h = jax.nn.elu(h)
                h = enc._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=causal)
            return tail(params, h)
        outs[name] = np.asarray(full(params, x))

prec_map = {"fused_hi": jax.lax.Precision.HIGHEST, "fused_def": jax.lax.Precision.DEFAULT}
for name, prec in prec_map.items():
    @jax.jit
    def fullf(params, x, _p=prec):
        h = enc._encoder_fused(params, x, causal, precision=_p)
        return tail(params, h)
    outs[name] = np.asarray(fullf(params, x))
for name in ("fused_hi", "fused_def"):
    d = np.abs(outs[name] - outs["xla"])
    scale = np.abs(outs["xla"]).max()
    print(f"{name} vs xla: max_abs {d.max():.3e} (out scale {scale:.3f})", flush=True)

# Interleaved timing.
times = {k: [] for k in variants}
for rep in range(args.reps):
    for name, fn in variants.items():
        t0 = time.time()
        for _ in range(args.iters):
            v, _ = fn(params, x)
        _ = float(v)
        dt = (time.time() - t0) / args.iters * 1000
        times[name].append(dt)
        amin = B * 10 / 60 / (dt / 1000)
        print(f"rep{rep} {name}: {dt:.1f} ms/step = {amin:.1f} audio-min/s", flush=True)

for name, ts in times.items():
    ts = sorted(ts)
    print(f"{name}: median {ts[len(ts)//2]:.1f} ms  all={['%.1f' % t for t in ts]}", flush=True)
