#!/usr/bin/env python
"""TPU compile-smoke for every Pallas kernel family (<2 min, tiny shapes).

The Mosaic lowering of several kernels is prover-fragile (e.g. Element halo
starts must be provably sublane-divisible, TODO.md round-3 record). CPU
interpret tests cannot see prover regressions, so every hardware session runs
this first: compile and execute each kernel once on the real chip, compare
against the interpret-mode reference, print PASS/FAIL per kernel, exit
non-zero on any failure.

Covers: fused_pann_logmel (all 4 SR geometries), fused_vggish_logmel,
window_attention_fused, swin_block_fused — the production wiring entry
points. (The fused SEANet encoder was rejected on hardware and torn out,
round-5 record.)

Runtime: ~1 min with a warm persistent compile cache; a cold cache pays
the remote Mosaic compile per geometry (observed up to ~16 min for the
first, seconds after).
"""

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

signal.alarm(1500)

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, fn_hw, fn_ref, rel_bar, to_linear=None):
    """Compile+run fn_hw on the chip, compare to the interpret-mode reference.

    The metric is max|hw - ref| / max|ref| (linear rel-to-max), optionally
    after mapping log outputs back to linear power via `to_linear`: the
    smoke exists to catch PROVER/indexing regressions (which corrupt loud
    bins by O(1)), so the metric must not amplify near-cancelled quiet bins
    the way dB-space absolute deltas do. Bars are set ~10x above the
     2026-08 session calibration (see main())."""
    t0 = time.time()
    try:
        hw = np.asarray(fn_hw(), np.float64)
    except Exception as e:  # compile or execute failure — the signal this exists for
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
        FAILURES.append(name)
        return
    dt = time.time() - t0
    try:
        ref = np.asarray(fn_ref(), np.float64)
    except Exception as e:  # keep smoking the remaining kernels
        print(f"FAIL {name}: interpret reference raised "
              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        FAILURES.append(name)
        return
    if hw.shape != ref.shape or not np.isfinite(hw).all():
        print(f"FAIL {name}: shape {hw.shape} vs {ref.shape} or non-finite", flush=True)
        FAILURES.append(name)
        return
    if to_linear is not None:
        hw, ref = to_linear(hw), to_linear(ref)
    rel = float(np.abs(hw - ref).max() / max(np.abs(ref).max(), 1e-30))
    ok = rel <= rel_bar
    print(
        f"{'PASS' if ok else 'FAIL'} {name}: compile+run {dt:.1f}s  "
        f"rel-to-max |hw-interpret| {rel:.3e} (bar {rel_bar:.1e})",
        flush=True,
    )
    if not ok:
        FAILURES.append(name)


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)
    if jax.default_backend() != "tpu":
        print("not a TPU backend — smoke is only meaningful on hardware", flush=True)
        sys.exit(2)

    from frechet_audio_distance_exported_tpu.models import clap as M
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops.pallas_frontend import (
        fused_pann_logmel,
        fused_vggish_logmel,
    )
    from frechet_audio_distance_exported_tpu.ops.pallas_window_attn import (
        swin_block_fused,
        window_attention_fused,
    )

    # --- log-mel frontends (Element halo specs) ---------------------------
    # Shipped precision (None -> DEFAULT). Calibrated 2026-08 on v5e:
    # DEFAULT tracks interpret f32 at 5.6e-8 (16k) to 3.6e-4 (48k) linear
    # rel-to-max; HIGHEST's multi-pass summation order diverges more
    # (2-4e-3) on near-cancelled bins, so the smoke runs what production
    # runs. dB-space absolute bars were tried first and rejected: quiet-bin
    # log amplification makes them fail on healthy kernels.
    for sr, num_frames in [(8000, 140), (16000, 128), (32000, 128), (48000, 1001)]:
        cfg = fe.PANN_CONFIGS[sr]
        length = num_frames * cfg["hop_size"] + cfg["window_size"]
        wave = jax.random.normal(jax.random.PRNGKey(sr), (2, length), jnp.float32) * 0.1
        n_valid = jnp.asarray([num_frames, max(1, num_frames - 9)], jnp.int32)
        check(
            f"fused_pann_logmel[{sr}]",
            lambda: fused_pann_logmel(wave, n_valid, sr, num_frames),
            lambda: fused_pann_logmel(wave, n_valid, sr, num_frames, interpret=True),
            5e-3,
            to_linear=lambda x: 10 ** (x / 10),  # dB -> power
        )

    nf = 96
    length = nf * fe.VGGISH_HOP + fe.VGGISH_FFT
    wave = jax.random.normal(jax.random.PRNGKey(7), (2, length), jnp.float32) * 0.1
    check(
        "fused_vggish_logmel",
        lambda: fused_vggish_logmel(wave, nf),
        lambda: fused_vggish_logmel(wave, nf, interpret=True),
        5e-3,
        to_linear=np.exp,  # log(mel+0.01) -> mel+0.01
    )

    # --- Swin window attention / whole-block (CLAP) -----------------------
    H, N, C, WS, RES = 4, 64, 96, 8, 64
    NW = (RES // WS) ** 2
    ks = jax.random.split(jax.random.PRNGKey(0), 16)
    bw = 2 * NW
    x = jax.random.normal(ks[0], (bw, N, C), jnp.float32) * 0.5
    wqkv = jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[2], (3 * C,), jnp.float32) * 0.01
    wproj = jax.random.normal(ks[3], (C, C), jnp.float32) * 0.05
    bproj = jax.random.normal(ks[4], (C,), jnp.float32) * 0.01
    g1 = 1.0 + 0.1 * jax.random.normal(ks[5], (C,), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[6], (C,), jnp.float32)
    g2 = 1.0 + 0.1 * jax.random.normal(ks[7], (C,), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[8], (C,), jnp.float32)
    wfc1 = jax.random.normal(ks[9], (C, 4 * C), jnp.float32) * 0.05
    bfc1 = jax.random.normal(ks[10], (4 * C,), jnp.float32) * 0.01
    wfc2 = jax.random.normal(ks[11], (4 * C, C), jnp.float32) * 0.05
    bfc2 = jax.random.normal(ks[12], (C,), jnp.float32) * 0.01
    rel_bias = jax.random.normal(ks[13], ((2 * WS - 1) ** 2, H), jnp.float32) * 0.1
    bias = M._gathered_rel_bias(rel_bias, WS, H)
    mask = jnp.asarray(M._shift_attn_mask(RES, WS, WS // 2), jnp.float32)

    # Calibrated 2026-08 on v5e: attention-only 8.7e-5 rel, whole-block
    # 8.7e-4 rel (the kernel dots run Mosaic DEFAULT — single bf16 MXU pass
    # on these f32 inputs; production feeds bf16 anyway, accepted at FAD
    # level, TODO r3 record). Bars ~10x/6x above measured.
    check(
        "window_attention_fused",
        lambda: window_attention_fused(
            x, wqkv, bqkv, wproj, bproj, bias, mask, g1, b1,
            heads=H, num_windows=NW, group=2,
        ),
        lambda: window_attention_fused(
            x, wqkv, bqkv, wproj, bproj, bias, mask, g1, b1,
            heads=H, num_windows=NW, group=2, interpret=True,
        ),
        1e-3,
    )
    check(
        "swin_block_fused",
        lambda: swin_block_fused(
            x, wqkv, bqkv, wproj, bproj, bias, mask, g1, b1, g2, b2,
            wfc1, bfc1, wfc2, bfc2, heads=H, num_windows=NW, group=4,
        ),
        lambda: swin_block_fused(
            x, wqkv, bqkv, wproj, bproj, bias, mask, g1, b1, g2, b2,
            wfc1, bfc1, wfc2, bfc2, heads=H, num_windows=NW, group=4,
            interpret=True,
        ),
        5e-3,
    )

    if FAILURES:
        print(f"SMOKE FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("SMOKE PASSED: all Pallas kernels compiled and ran on hardware", flush=True)


if __name__ == "__main__":
    main()
