#!/usr/bin/env python
"""Encodec stage-1 lane-packing experiment (TODO #8, VERDICT r2 #5).

Stage 1 (post conv_in, ratio-2 stage) is the biggest single Encodec hotspot:
31.1 ms standalone at [32, 240k, 32] bf16 on v5e. Its C=32 minor dim leaves
elementwise ops at ~25% lane occupancy and its convs are K<=32 matmuls on the
MXU. This experiment reformulates the whole stage in a lane-PACKED layout
[T/p, p*32]: every conv becomes (one or two) dense [p*32, *] matmuls whose
block structure encodes the taps — conv3 via a row-shifted pair (A from the
previous packed row, B from the current), conv1/shortcut as block-diagonal,
and the k=4 s=2 downsample via a second shifted pair — with Encodec's causal
reflect padding reproduced by splicing reflected samples into the pad slots.
FLOP overhead of the zero blocks is ~5x (p=8) but stage 1 is bandwidth-bound,
not MXU-bound, so the bet is on layout, not arithmetic.

Variants: p=8 / p=16 packing; 'concat' folds conv1 + shortcut into a single
[p*(16+32), p*32] matmul on concat(elu(h3), x).

Prior attempts on this hotspot (both REJECTED, numbers in TODO.md): fused
Pallas res-block with haloed tiles (32.7 vs 31.1 ms); block-Toeplitz conv_in
matmul (no faster). Accept bar here: >=1.2x stage-1 standalone.

Round-3 measurements (v5e, [32, 240k, 32] bf16, 20-iter chain dispatch):
xla_baseline 33.43-33.46 ms; packed p=8 28.23-28.27 ms (1.18x); p=16
29.16 ms; p=8+concat 28.01 ms. VERDICT: standalone win, composition LOSS —
integrated into the full model the packed stages regress (full step 57.3 ->
70.3 ms stage1-packed / 78.2 both-packed; 93.1 -> 68.4 audio-min/s): the
shifted packed streams must materialize as matmul operands and the entry
reshape/concat breaks XLA's conv_in->stage fusion, costs that the
standalone harness (pre-materialized input) never paid. Integration was
built, measured, REVERTED. Full narrative in TODO.md.

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

CI, CMID, CO = 32, 16, 64  # stage-1 channel sizes


def build_packed_weights(stage, dtype, p=8, concat=False):
    """Pack stage-1 conv weights (WIO) into dense shifted-row matmul blocks."""
    u = p // 2
    w3 = np.asarray(stage["res"]["conv1"]["w"], np.float32)  # [3, 32, 16]
    b3 = np.asarray(stage["res"]["conv1"]["b"], np.float32)
    w1 = np.asarray(stage["res"]["conv2"]["w"], np.float32)[0]  # [16, 32]
    b1 = np.asarray(stage["res"]["conv2"]["b"], np.float32)
    wsc = np.asarray(stage["res"]["shortcut"]["w"], np.float32)[0]  # [32, 32]
    bsc = np.asarray(stage["res"]["shortcut"]["b"], np.float32)
    wd = np.asarray(stage["down"]["w"], np.float32)  # [4, 32, 64]
    bd = np.asarray(stage["down"]["b"], np.float32)

    A = np.zeros((p * CI, p * CMID), np.float32)  # conv3, from packed row r-1
    B = np.zeros((p * CI, p * CMID), np.float32)  # conv3, from packed row r
    for s in range(p):
        for j in range(3):
            sp = s - 2 + j  # input slot (negative -> previous row)
            m, row = (A, sp + p) if sp < 0 else (B, sp)
            m[row * CI : (row + 1) * CI, s * CMID : (s + 1) * CMID] = w3[j]
    W1 = np.zeros((p * CMID, p * CI), np.float32)  # conv1, block-diagonal
    SC = np.zeros((p * CI, p * CI), np.float32)  # shortcut, block-diagonal
    for s in range(p):
        W1[s * CMID : (s + 1) * CMID, s * CI : (s + 1) * CI] = w1
        SC[s * CI : (s + 1) * CI, s * CI : (s + 1) * CI] = wsc
    C = np.zeros((p * CI, u * CO), np.float32)  # down k=4 s=2, from row r-1
    D = np.zeros((p * CI, u * CO), np.float32)  # down, from row r
    for uu in range(u):
        for j in range(4):
            sp = 2 * uu - 2 + j
            m, row = (C, sp + p) if sp < 0 else (D, sp)
            m[row * CI : (row + 1) * CI, uu * CO : (uu + 1) * CO] = wd[j]
    cast = lambda a: a.astype(dtype)
    out = dict(
        A=cast(A), B=cast(B), b3=cast(np.tile(b3, p)),
        W1=cast(W1), b1=cast(np.tile(b1, p)),
        SC=cast(SC), bsc=cast(np.tile(bsc, p)),
        C=cast(C), D=cast(D), bd=cast(np.tile(bd, u)),
        p=p, concat=concat,
    )
    if concat:
        out["W1SC"] = cast(np.concatenate([W1, SC], axis=0))
        out["b1sc"] = cast(np.tile(b1, p) + np.tile(bsc, p))
    return out


def packed_stage1(pw, x):
    """Lane-packed stage 1. x: [B, T, 32] (T % p == 0) -> [B, T//2, 64].

    Matches _res_block + elu + down _sconv with causal reflect padding.
    """
    import jax
    import jax.numpy as jnp

    p = pw["p"]
    b, t, _ = x.shape
    f32 = jnp.float32

    def mm(h, w):
        return jnp.matmul(h, w, preferred_element_type=f32).astype(x.dtype)

    # Left pad = one full packed row: p-2 zeros + reflect-2 ([x2, x1]).
    left = jnp.concatenate(
        [jnp.zeros((b, p - 2, CI), x.dtype), x[:, 2:0:-1, :]], axis=1
    )
    xp = jnp.concatenate([left, x], axis=1).reshape(b, t // p + 1, p * CI)
    h = jax.nn.elu(xp)
    # conv3: rows 1..R of the padded stream are the real outputs y[0..T).
    h3 = mm(h[:, :-1], pw["A"]) + mm(h[:, 1:], pw["B"]) + pw["b3"]
    if pw["concat"]:
        hx = jnp.concatenate([jax.nn.elu(h3), xp[:, 1:]], axis=-1)
        y = jax.nn.elu(mm(hx, pw["W1SC"]) + pw["b1sc"])
    else:
        h1 = mm(jax.nn.elu(h3), pw["W1"]) + pw["b1"]
        sc = mm(xp[:, 1:], pw["SC"]) + pw["bsc"]
        y = jax.nn.elu(h1 + sc)  # [B, T//p, p*CI] == y[0..T) packed
    # Downsample left reflect-2: previous-row stream with a spliced first row
    # ([0]*(p-2) slots, y[2], y[1]).
    yrow0 = y[:, 0].reshape(b, p, CI)
    first = jnp.concatenate(
        [jnp.zeros((b, p - 2, CI), x.dtype), yrow0[:, 2:0:-1]], axis=1
    ).reshape(b, 1, p * CI)
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
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, CI), jnp.float32)
    ref = np.asarray(baseline_stage1(stage, x))
    for p, concat in [(8, False), (16, False), (8, True), (16, True)]:
        pw = {
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in build_packed_weights(stage, np.float32, p, concat).items()
        }
        got = np.asarray(packed_stage1(pw, x))
        d = float(np.max(np.abs(got - ref)))
        print(f"p={p} concat={concat}: max abs diff {d:.3e}")
        assert got.shape == ref.shape and d < 1e-4, d
    print("numerics OK")


def time_tpu(n_iters=20, batch=32, seconds=10.0):
    signal.alarm(2400)  # wedge guard (never timeout-kill a TPU run externally)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import encodec as enc

    print(f"backend: {jax.default_backend()}", flush=True)
    params = enc.init_encodec_params(jax.random.PRNGKey(0), causal=True, channels=1)
    stage = params["stages"][0]
    dt = jnp.bfloat16
    stage_bf16 = jax.tree.map(lambda a: a.astype(dt), stage)
    t = int(24000 * seconds)
    x = (jax.random.normal(jax.random.PRNGKey(1), (batch, t, CI), jnp.float32) * 0.5).astype(dt)

    @jax.jit
    def step_base(acc, x):
        return acc + jnp.sum(baseline_stage1(stage_bf16, x).astype(jnp.float32))

    variants = [("xla_baseline", step_base)]
    for p, concat in [(8, False), (16, False), (8, True), (16, True)]:
        pw = {
            k: (jnp.asarray(v).astype(dt) if isinstance(v, np.ndarray) else v)
            for k, v in build_packed_weights(stage, np.float32, p, concat).items()
        }

        @jax.jit
        def step_packed(acc, x, pw=pw):
            return acc + jnp.sum(packed_stage1(pw, x).astype(jnp.float32))

        variants.append((f"packed_p{p}{'_concat' if concat else ''}", step_packed))

    results = {}
    for name, fn in variants:
        print(f"[{name}] compiling...", flush=True)
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        acc = fn(acc, x)
        float(acc)  # compile + warm
        print(f"[{name}] compiled+warm in {time.perf_counter() - t0:.1f}s", flush=True)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            acc = fn(acc, x)
        v = float(acc)
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        results[name] = ms
        print(f"{name}: {ms:.2f} ms/step (acc {v:.3e})", flush=True)
    best = min((v, k) for k, v in results.items() if k != "xla_baseline")
    speedup = results["xla_baseline"] / best[0]
    verdict = "ACCEPT" if speedup >= 1.2 else "REJECT"
    print(f"best: {best[1]} speedup {speedup:.2f}x -> {verdict} (bar 1.2x)")


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
