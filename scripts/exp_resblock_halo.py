#!/usr/bin/env python
"""Encodec res-block as ONE Pallas kernel over pl.Element halo time tiles.

Round-2d's fused res-block was rejected at 32.7 vs 31.1 ms XLA with
14.7 ms attributed to MANUAL halo-tile materialization; pl.Element
overlapping input blocks stream the halo with automatic double-buffering
(the mechanism that flipped the frontend-kernel rejection into the
accepted +23% CLAP win). This kernel computes the whole

    elu(x) -> conv3 (C -> C/2) -> elu -> conv1 (C/2 -> C)
    + shortcut conv1 (C -> C)   -> post-stage elu

chain in VMEM per [t_tile, C] output tile; the XLA path round-trips 4-5
full [B, T, C] activations through HBM per block. The 2-row causal
reflect pad is prepended once in XLA (elu commutes with reflection, so
padding raw x before the in-kernel elu is exact). 24k only: the 48k
variant inserts a GLOBAL GroupNorm after every conv, which breaks time
tiling.

Usage:
  python scripts/exp_resblock_halo.py --check     # CPU interpret parity
  python scripts/exp_resblock_halo.py [--iters 12]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import functools
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_TILE = 4000
HALO = 8  # sublane-divisible; only the first 2 halo rows are consumed


def make_fused_res_block(c: int, t_len: int, t_tile: int, interpret: bool,
                         post_elu: bool = True):
    """Returns fn(x_bf16 [B, T, C], p) -> [B, T, C] = elu(res_block(x))."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    t_pad = -(-t_len // t_tile) * t_tile

    def _elu_f32(r):
        return jnp.where(r > 0, r, jnp.exp(jnp.minimum(r, 0.0)) - 1.0)

    def kernel(x_ref, w3_ref, b3_ref, w1_ref, b1_ref, ws_ref, bs_ref, out_ref):
        # Mosaic rejects lane-axis concatenation of sublane-shifted views
        # (probed: even at 128 lanes), so conv3 runs as 3 shifted dots summed
        # — the same pattern as the accepted frontend kernel's chunk-sum.
        rows = x_ref[0]  # [t_tile + HALO, C] raw x (2-row reflect prefix)
        e = _elu_f32(rows.astype(jnp.float32))
        h = None
        for m in range(3):
            em = e[m : m + t_tile]
            term = jnp.dot(
                em.astype(jnp.bfloat16) if not interpret else em,
                w3_ref[m * c : (m + 1) * c],
                preferred_element_type=jnp.float32,
            )
            h = term if h is None else h + term
        h = h + b3_ref[:]
        h = _elu_f32(h)
        y = jnp.dot(
            h.astype(jnp.bfloat16) if not interpret else h,
            w1_ref[:],
            preferred_element_type=jnp.float32,
        ) + b1_ref[:]
        s = jnp.dot(
            rows[2 : 2 + t_tile],
            ws_ref[:],
            preferred_element_type=jnp.float32,
        ) + bs_ref[:]
        z = s + y
        if post_elu:
            z = _elu_f32(z)
        out_ref[0] = z.astype(out_ref.dtype)

    from jax.experimental.pallas import tpu as pltpu

    def fused(x, p):
        b, t, cc = x.shape
        assert t == t_len and cc == c
        dt = x.dtype
        # 2-row causal reflect prefix + zero tail to t_pad + HALO rows.
        xp = jnp.concatenate([x[:, 2:0:-1], x], axis=1)
        xp = jnp.pad(xp, ((0, 0), (0, t_pad + HALO - xp.shape[1]), (0, 0)))
        w3 = p["conv1"]["w"].reshape(3 * c, c // 2).astype(dt)
        w1 = p["conv2"]["w"].reshape(c // 2, c).astype(dt)
        ws = p["shortcut"]["w"].reshape(c, c).astype(dt)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_pad // t_tile),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(t_tile + HALO), pl.Element(c)),
                    lambda bi, ti: (bi, ti * t_tile, 0),
                ),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((1, t_tile, c), lambda bi, ti: (bi, ti, 0)),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, c), dt),
            interpret=interpret,
        )(
            xp, w3, p["conv1"]["b"].astype(jnp.float32), w1,
            p["conv2"]["b"].astype(jnp.float32), ws,
            p["shortcut"]["b"].astype(jnp.float32),
        )
        return out[:, :t_len]

    return fused


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--t-tile", type=int, default=0, help="0 = sweep")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as E

    print(f"backend: {jax.default_backend()}", flush=True)
    B = 4 if args.check else 32
    params = E.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)

    # Stage shapes after conv_in and each downsample (24k, 240k samples).
    stage_shapes = [(32, 240000), (64, 120000), (128, 30000)]

    for si, (c, t_len) in enumerate(stage_shapes[:2]):
        p = params["stages"][si]["res"]
        if args.check:
            t_len = 2 * T_TILE + 1234  # small but multi-tile with remainder
        x32 = jax.random.normal(jax.random.PRNGKey(si + 1), (B, t_len, c), jnp.float32) * 0.6

        def xla_block(x, _p=p):
            return jax.nn.elu(E._res_block(_p, x, causal=True))

        if args.check:
            fused = make_fused_res_block(c, t_len, T_TILE, interpret=True)
            ref = np.asarray(jax.jit(xla_block)(x32), np.float64)
            out = np.asarray(jax.jit(lambda x: fused(x, p))(x32), np.float64)
            d = np.max(np.abs(out - ref))
            rel = d / max(1e-9, np.max(np.abs(ref)))
            print(f"stage{si+1} C={c} T={t_len}: interpret max|diff|={d:.3e} (rel {rel:.1e})",
                  flush=True)
            continue

        # TPU: mixed-precision stage dtype is bf16 (shipped 24k default).
        x = x32.astype(jnp.bfloat16)
        pp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

        def timed(fn, *xs):
            # float(acc) fetch, NOT block_until_ready: the latter does not
            # force execution through the axon tunnel (measured 100x-fast
            # lies in the t_tile sweep; bench.py's documented rule).
            acc = jnp.zeros((), jnp.float32)
            g = jax.jit(lambda a, *z: a + jnp.sum(fn(*z).astype(jnp.float32)))
            acc = g(acc, *xs)
            float(acc)
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = g(acc, *xs)
            float(acc)
            return (time.perf_counter() - t0) / args.iters * 1e3

        ms_x = timed(lambda xx: jax.nn.elu(E._res_block(pp, xx, causal=True)), x)
        print(f"stage{si+1} C={c} T={t_len}: XLA elu+res+elu {ms_x:7.2f} ms", flush=True)
        tiles = [args.t_tile] if args.t_tile else [2000, 4000, 8000]
        for tt in tiles:
            fused = make_fused_res_block(c, t_len, tt, interpret=False)
            try:
                ms_k = timed(lambda xx: fused(xx, pp), x)
            except Exception as e:
                print(f"  kernel t_tile={tt}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            # numeric sanity vs the XLA bf16 path
            a = np.asarray(jax.nn.elu(E._res_block(pp, x, causal=True)).astype(jnp.float32))
            bq = np.asarray(fused(x, pp).astype(jnp.float32))
            d = float(np.max(np.abs(a - bq)))
            print(f"  kernel t_tile={tt}: {ms_k:7.2f} ms ({ms_x/ms_k:4.2f}x)  "
                  f"max|diff-vs-xla-bf16|={d:.3e}", flush=True)


if __name__ == "__main__":
    main()
