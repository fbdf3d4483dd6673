#!/usr/bin/env python
"""Encodec stage-1 lane-packing experiment (TODO #8, VERDICT r2 #5).

Stage 1 (post conv_in, ratio-2 stage) is the biggest single Encodec hotspot:
31.1 ms standalone at [32, 240k, 32] bf16 on v5e. Its C=32 minor dim leaves
elementwise ops at ~25% lane occupancy and its convs are K<=32 matmuls on the
MXU. This experiment reformulates the whole stage in a lane-PACKED layout
[T/8, 8*32=256]: every conv becomes (one or two) dense [256, *] matmuls whose
block structure encodes the taps — conv3 via a row-shifted pair (A from the
previous packed row, B from the current), conv1/shortcut as block-diagonal,
and the k=4 s=2 downsample via a second shifted pair — with Encodec's causal
reflect padding reproduced by splicing reflected samples into the pad slots.
FLOP overhead of the zero blocks is ~5x but stage 1 is bandwidth-bound, not
MXU-bound, so the bet is on layout, not arithmetic.

Prior attempts on this hotspot (both REJECTED, numbers in TODO.md): fused
Pallas res-block with haloed tiles (32.7 vs 31.1 ms); block-Toeplitz conv_in
matmul (no faster). Accept bar here: >=1.2x stage-1 standalone.

Usage:
  python scripts/exp_stage1_lanepack.py --check   # CPU numerics only
  python scripts/exp_stage1_lanepack.py           # TPU timing (single process!)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = 8  # time steps per packed row
CI, CMID, CO = 32, 16, 64  # stage-1 channel sizes
U = P // 2  # outputs per packed row after the stride-2 downsample


def build_packed_weights(stage, dtype):
    """Pack stage-1 conv weights (WIO) into dense shifted-row matmul blocks."""
    w3 = np.asarray(stage["res"]["conv1"]["w"], np.float32)  # [3, 32, 16]
    b3 = np.asarray(stage["res"]["conv1"]["b"], np.float32)
    w1 = np.asarray(stage["res"]["conv2"]["w"], np.float32)[0]  # [16, 32]
    b1 = np.asarray(stage["res"]["conv2"]["b"], np.float32)
    wsc = np.asarray(stage["res"]["shortcut"]["w"], np.float32)[0]  # [32, 32]
    bsc = np.asarray(stage["res"]["shortcut"]["b"], np.float32)
    wd = np.asarray(stage["down"]["w"], np.float32)  # [4, 32, 64]
    bd = np.asarray(stage["down"]["b"], np.float32)

    A = np.zeros((P * CI, P * CMID), np.float32)  # conv3, from packed row r-1
    B = np.zeros((P * CI, P * CMID), np.float32)  # conv3, from packed row r
    for s in range(P):
        for j in range(3):
            sp = s - 2 + j  # input slot (negative -> previous row)
            dst = (A, sp + P) if sp < 0 else (B, sp)
            m, row = dst
            m[row * CI : (row + 1) * CI, s * CMID : (s + 1) * CMID] = w3[j]
    W1 = np.zeros((P * CMID, P * CI), np.float32)  # conv1, block-diagonal
    SC = np.zeros((P * CI, P * CI), np.float32)  # shortcut, block-diagonal
    for s in range(P):
        W1[s * CMID : (s + 1) * CMID, s * CI : (s + 1) * CI] = w1
        SC[s * CI : (s + 1) * CI, s * CI : (s + 1) * CI] = wsc
    C = np.zeros((P * CI, U * CO), np.float32)  # down k=4 s=2, from row r-1
    D = np.zeros((P * CI, U * CO), np.float32)  # down, from row r
    for u in range(U):
        for j in range(4):
            sp = 2 * u - 2 + j
            dst = (C, sp + P) if sp < 0 else (D, sp)
            m, row = dst
            m[row * CI : (row + 1) * CI, u * CO : (u + 1) * CO] = wd[j]
    cast = lambda a: a.astype(dtype)
    return dict(
        A=cast(A), B=cast(B), b3=cast(np.tile(b3, P)),
        W1=cast(W1), b1=cast(np.tile(b1, P)),
        SC=cast(SC), bsc=cast(np.tile(bsc, P)),
        C=cast(C), D=cast(D), bd=cast(np.tile(bd, U)),
    )


def packed_stage1(pw, x):
    """Lane-packed stage 1. x: [B, T, 32] (T % 8 == 0) -> [B, T//2, 64].

    Matches _res_block + elu + down _sconv with causal reflect padding.
    """
    import jax
    import jax.numpy as jnp

    b, t, _ = x.shape
    f32 = jnp.float32

    def mm(h, w):
        return jnp.matmul(h, w, preferred_element_type=f32).astype(x.dtype)

    # Left pad = one full packed row: 6 zeros + reflect-2 ([x2, x1]).
    left = jnp.concatenate(
        [jnp.zeros((b, 6, CI), x.dtype), x[:, 2:0:-1, :]], axis=1
    )
    xp = jnp.concatenate([left, x], axis=1).reshape(b, t // P + 1, P * CI)
    h = jax.nn.elu(xp)
    # conv3: rows 1..R of the padded stream are the real outputs y[0..T).
    h3 = mm(h[:, :-1], pw["A"]) + mm(h[:, 1:], pw["B"]) + pw["b3"]
    h1 = mm(jax.nn.elu(h3), pw["W1"]) + pw["b1"]
    sc = mm(xp[:, 1:], pw["SC"]) + pw["bsc"]
    y = jax.nn.elu(h1 + sc)  # [B, T//8, 256] == y[0..T) packed
    # Downsample left reflect-2: previous-row stream with a spliced first row
    # ([0]*6 slots, y[2], y[1]).
    yrow0 = y[:, 0].reshape(b, P, CI)
    first = jnp.concatenate(
        [jnp.zeros((b, 6, CI), x.dtype), yrow0[:, 2:0:-1]], axis=1
    ).reshape(b, 1, P * CI)
    ym1 = jnp.concatenate([first, y[:, :-1]], axis=1)
    yd = mm(ym1, pw["C"]) + mm(y, pw["D"]) + pw["bd"]
    return yd.reshape(b, t // 2, CO)


def baseline_stage1(stage, x):
    import jax

    from frechet_audio_distance_exported_tpu.models import encodec as enc

    h = enc._res_block(stage["res"], x, causal=True)
    h = jax.nn.elu(h)
    return enc._sconv(stage["down"], h, kernel=4, stride=2, causal=True)


def check_numerics():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as enc

    params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)
    stage = params["stages"][0]
    pw = {k: jnp.asarray(v) for k, v in build_packed_weights(stage, np.float32).items()}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, CI), jnp.float32)
    ref = np.asarray(baseline_stage1(stage, x))
    got = np.asarray(packed_stage1(pw, x))
    d = float(np.max(np.abs(got - ref)))
    print(f"numerics: max abs diff {d:.3e} (shapes {got.shape} vs {ref.shape})")
    assert got.shape == ref.shape and d < 1e-4, d
    print("numerics OK")


def time_tpu(n_iters=20, batch=32, seconds=10.0):
    signal.alarm(900)  # wedge guard (never timeout-kill a TPU run externally)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as enc

    print(f"backend: {jax.default_backend()}")
    params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)
    stage = params["stages"][0]
    dt = jnp.bfloat16
    stage_bf16 = jax.tree.map(lambda a: a.astype(dt), stage)
    pw = {k: jnp.asarray(v) for k, v in build_packed_weights(stage, np.float32).items()}
    pw = {k: v.astype(dt) for k, v in pw.items()}
    t = int(24000 * seconds)
    x = (jax.random.normal(jax.random.PRNGKey(1), (batch, t, CI), jnp.float32) * 0.5).astype(dt)

    @jax.jit
    def step_base(acc, x):
        return acc + jnp.sum(baseline_stage1(stage_bf16, x).astype(jnp.float32))

    @jax.jit
    def step_packed(acc, x):
        return acc + jnp.sum(packed_stage1(pw, x).astype(jnp.float32))

    results = {}
    for name, fn in [("xla_baseline", step_base), ("lane_packed", step_packed)]:
        acc = jnp.zeros((), jnp.float32)
        acc = fn(acc, x)
        float(acc)  # compile + warm
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            acc = fn(acc, x)
        v = float(acc)
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/step (acc {v:.3e})")
    speedup = results["xla_baseline"] / results["lane_packed"]
    verdict = "ACCEPT" if speedup >= 1.2 else "REJECT"
    print(f"speedup: {speedup:.2f}x -> {verdict} (bar 1.2x)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--check", action="store_true", help="CPU numerics only")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.check:
        check_numerics()
        return
    time_tpu(args.iters)


if __name__ == "__main__":
    main()
