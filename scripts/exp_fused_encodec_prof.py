#!/usr/bin/env python
"""Per-kernel isolation timing of the fused encodec pieces vs XLA slices.

Stage-1 48k geometry by default: B=16, T=480000, C=32, f32, GN on.
Each piece timed with scalar-fetch forcing, interleaved reps.
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

from frechet_audio_distance_exported_tpu.models import encodec as enc

try:
    from frechet_audio_distance_exported_tpu.ops import pallas_encodec as pe
except ImportError:
    sys.exit(
        "fused encodec kernel torn out (round-5 hardware rejection); restore with:"
        " git apply -R scripts/patches/fused_encodec_kernel.patch"
    )

ap = argparse.ArgumentParser()
ap.add_argument("--T", type=int, default=480000)
ap.add_argument("--C", type=int, default=32)
ap.add_argument("--batch", type=int, default=16)
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--iters", type=int, default=8)
ap.add_argument("--tiles", type=str, default="")
args = ap.parse_args()

B, T, C = args.batch, args.T, args.C
causal = False
print(f"backend: {jax.default_backend()}  B={B} T={T} C={C}", flush=True)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, T, C), jnp.float32) * 0.5
w1 = jax.random.normal(key, (3, C, C // 2), jnp.float32) * 0.1
b1 = jnp.zeros((C // 2,), jnp.float32)
ws = jax.random.normal(key, (1, C, C), jnp.float32) * 0.1
bs = jnp.zeros((C,), jnp.float32)
w2 = jax.random.normal(key, (1, C // 2, C), jnp.float32) * 0.1
b2 = jnp.zeros((C,), jnp.float32)
scale = jnp.ones((B, 1, C), jnp.float32)
shift = jnp.zeros((B, 1, C), jnp.float32)

default_tile = enc._tile_for(T, (C, C // 2, C))
tiles = [int(t) for t in args.tiles.split(",") if t] or [default_tile]
left1, right1 = enc._pad_amounts(T, 3, 1, causal)


def timeit(name, fn, *a):
    outs = fn(*a)  # compile
    f = outs[0] if isinstance(outs, (tuple, list)) else outs
    _ = float(jnp.sum(f[0] if isinstance(f, (tuple, list)) else f).block_until_ready()) if False else None
    for rep in range(args.reps):
        t0 = time.time()
        for _ in range(args.iters):
            outs = fn(*a)
            first = outs[0] if isinstance(outs, (tuple, list)) else outs
        s = float(jnp.sum(first[:, :8]))
        dt = (time.time() - t0) / args.iters * 1000
        print(f"  {name} rep{rep}: {dt:.2f} ms", flush=True)


DEF = jax.lax.Precision.DEFAULT
HI = jax.lax.Precision.HIGHEST

for tile in tiles:
    x_store = jax.jit(pe.to_store, static_argnames="tile")(x, tile)
    x_store.block_until_ready()
    print(f"tile={tile}", flush=True)

    def ka(xs, prec):
        h1, hs, s1, ss = pe.fused_res_front(
            xs, w1, b1, ws, bs, scale, shift,
            left=left1, right=right1, T=T, tile=tile, gn=True, precision=prec,
        )
        return h1, hs

    def kb(xs, prec):
        h2, s2 = pe.fused_sconv(
            xs, w2, b2, None, None, k=1, left=0, right=0, T=T, tile=tile,
            pre_elu=True, gn=True, precision=prec,
        )
        return h2

    timeit("K_A res_front DEF", lambda xs: ka(xs, DEF), x_store)
    timeit("K_A res_front HI ", lambda xs: ka(xs, HI), x_store)
    # K_B reads a half-width store
    h1s = jax.jit(pe.to_store, static_argnames="tile")(x[..., : C // 2], tile)
    h1s.block_until_ready()

    def kb2(xs, prec):
        h2, s2 = pe.fused_sconv(
            xs, w2, b2, None, None, k=1, left=0, right=0, T=T, tile=tile,
            pre_elu=True, gn=True, precision=prec,
        )
        return h2

    timeit("K_B k1 DEF      ", lambda xs: kb2(xs, DEF), h1s)

# XLA equivalents of the K_A slice (elu + pad + conv1 + GN moments,
# + shortcut conv + GN moments) and the k1 slice.
@jax.jit
def xla_ka(x):
    e = jax.nn.elu(x)
    ep = jnp.pad(e, ((0, 0), (left1, right1), (0, 0)), mode="reflect")
    h1 = jax.lax.conv_general_dilated(
        ep, w1, (1,), padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    ) + b1
    hs = jax.lax.conv_general_dilated(
        x, ws, (1,), padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    ) + bs
    s1 = pe.masked_channel_sums(h1)
    ss = pe.masked_channel_sums(hs)
    return h1, hs, s1, ss


@jax.jit
def xla_kb(h1):
    e = jax.nn.elu(h1)
    h2 = jax.lax.conv_general_dilated(
        e, w2, (1,), padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH,
    ) + b2
    return h2, pe.masked_channel_sums(h2)


timeit("XLA ka slice     ", lambda xx: xla_ka(xx)[:2], x)
h1_plain = x[..., : C // 2]
timeit("XLA kb slice     ", lambda hh: xla_kb(hh)[0], h1_plain)
print("done", flush=True)
