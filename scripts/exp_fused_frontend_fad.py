#!/usr/bin/env python
"""Acceptance probe for the fused Pallas log-mel frontend: FAD-level delta
of the shipped TPU path (bf16 model + Pallas DEFAULT-precision frontend) vs
the reference numerics (f32 model + XLA HIGH frontend), on synthetic
waveform "dirs" with an O(1) true FAD.

The kernel's DEFAULT matmuls move near-cancellation quiet mel bins by up to
~0.6 dB (vs 1.8e-3 dB for XLA HIGH against f64 truth) — the same scale as
the bf16 input cast the shipped pipeline applies to the log-mel anyway
(bf16 spacing at |x| in [64, 128) is 0.5). This probe decides whether that
perturbation survives to the FAD score; the accept bar is the same one the
whole-block Swin kernel passed (well under the 1e-3 parity budget).

Usage: python scripts/exp_fused_frontend_fad.py [--n 128]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_dir(rng, n, length, sr, base_freqs, noise):
    """n waveform rows: random 3-tone mixtures + noise, distinct stats."""
    t = np.arange(length, dtype=np.float64) / sr
    out = np.empty((n, length), np.float32)
    for i in range(n):
        f = rng.uniform(0.8, 1.25, 3) * base_freqs
        a = rng.uniform(0.1, 0.3, 3)
        ph = rng.uniform(0, 2 * np.pi, 3)
        x = sum(ai * np.sin(2 * np.pi * fi * t + pi) for fi, ai, pi in zip(f, a, ph))
        x += rng.standard_normal(length) * noise
        out[i] = np.clip(x, -1.0, 1.0).astype(np.float32)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128, help="files per dir")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import clap as MC
    from frechet_audio_distance_exported_tpu.models import pann as MP
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops import stats
    from frechet_audio_distance_exported_tpu.ops.pallas_frontend import fused_pann_logmel
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(11)

    def fad_from(embed_fn, waves_bg, waves_ev):
        e_bg, e_ev = embed_fn(waves_bg), embed_fn(waves_ev)
        mu1, s1 = e_bg.mean(0), np.cov(e_bg, rowvar=False)
        mu2, s2 = e_ev.mean(0), np.cov(e_ev, rowvar=False)
        return stats.frechet_distance_np(mu1, s1, mu2, s2)

    # ---- CLAP (48 kHz) ----------------------------------------------------
    n_fft = fe.PANN_CONFIGS[48000]["window_size"]
    sr = fe.CLAP_SAMPLE_RATE
    bg = synth_dir(rng, args.n, fe.CLAP_MAX_SAMPLES, sr, np.array([440.0, 950, 2300]), 0.05)
    ev = synth_dir(rng, args.n, fe.CLAP_MAX_SAMPLES, sr, np.array([660.0, 1400, 3100]), 0.12)

    def clap_prep(w):
        q = (w * 32767.0).astype(np.int16).astype(np.float32) / 32767.0
        return np.stack([fe.reflect_pad_host(r, n_fft) for r in q])

    bg_p, ev_p = clap_prep(bg), clap_prep(ev)
    params32 = MC.init_clap_params(jax.random.PRNGKey(0))
    params16 = cast_model_params("clap", params32, jnp.bfloat16)

    def clap_embed(params, frontend, attn, dtype):
        def run(waves):
            outs = []
            for i in range(0, len(waves), 32):
                w = jnp.asarray(waves[i : i + 32])
                nv = jnp.full((w.shape[0],), fe.CLAP_TIME_FRAMES, jnp.int32)
                if frontend == "pallas":
                    mel = fused_pann_logmel(w, nv, sr, fe.CLAP_TIME_FRAMES)
                else:
                    mel = fe.pann_logmel_batch(w, sr, fe.CLAP_TIME_FRAMES, nv)
                e = MC.clap_forward(params, mel.astype(dtype), attn=attn)
                outs.append(np.asarray(e.astype(jnp.float32), np.float64))
            return np.concatenate(outs)

        return run

    ref = fad_from(clap_embed(params32, "xla", "xla", jnp.float32), bg_p, ev_p)
    print(f"clap f32 + xla-front + xla-attn      : {ref:.8f}", flush=True)
    for label, fr, at in (
        ("clap bf16 + xla-front + fused_block ", "xla", "fused_block"),
        ("clap bf16 + pallas-front + fused_blk", "pallas", "fused_block"),
    ):
        v = fad_from(clap_embed(params16, fr, at, jnp.bfloat16), bg_p, ev_p)
        print(f"{label}: {v:.8f}  |delta|={abs(v - ref):.3e}", flush=True)

    # ---- VGGish (16 kHz) --------------------------------------------------
    from frechet_audio_distance_exported_tpu.models import vggish as MV
    from frechet_audio_distance_exported_tpu.ops.pallas_frontend import (
        fused_vggish_logmel,
    )

    sr = 16000
    num_patches = 10
    vf = num_patches * fe.VGGISH_PATCH_FRAMES
    length = vf * fe.VGGISH_HOP + fe.VGGISH_FFT
    bg = synth_dir(rng, args.n, length, sr, np.array([300.0, 800, 1900]), 0.05)
    ev = synth_dir(rng, args.n, length, sr, np.array([500.0, 1100, 2600]), 0.12)
    params32 = MV.init_vggish_params(jax.random.PRNGKey(2))
    params16 = cast_model_params("vggish", params32, jnp.bfloat16)

    def vggish_embed(params, frontend, dtype):
        def run(waves):
            outs = []
            for i in range(0, len(waves), 32):
                w = jnp.asarray(waves[i : i + 32])
                if frontend == "pallas":
                    mel = fused_vggish_logmel(w, vf)
                else:
                    mel = fe.vggish_logmel_batch(w, vf)
                patches = mel.reshape(-1, 96, 64)
                e = MV.vggish_forward(params, patches.astype(dtype))
                outs.append(np.asarray(e.astype(jnp.float32), np.float64))
            return np.concatenate(outs)

        return run

    ref = fad_from(vggish_embed(params32, "xla", jnp.float32), bg, ev)
    print(f"vggish f32 + xla-front               : {ref:.8f}", flush=True)
    for label, fr in (
        ("vggish bf16 + xla-front              ", "xla"),
        ("vggish bf16 + pallas-front           ", "pallas"),
    ):
        v = fad_from(vggish_embed(params16, fr, jnp.bfloat16), bg, ev)
        print(f"{label}: {v:.8f}  |delta|={abs(v - ref):.3e}", flush=True)

    # ---- PANN (16 kHz) ----------------------------------------------------
    sr = 16000
    cfg = fe.PANN_CONFIGS[sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    length = 10 * sr
    frames = fe.pann_num_frames(length, hop)
    t_grid = fe.pann_valid_time(frames)
    bg = synth_dir(rng, args.n, length, sr, np.array([300.0, 800, 1900]), 0.05)
    ev = synth_dir(rng, args.n, length, sr, np.array([500.0, 1100, 2600]), 0.12)
    bg_p = np.stack([fe.reflect_pad_host(r, n_fft) for r in bg])
    ev_p = np.stack([fe.reflect_pad_host(r, n_fft) for r in ev])
    params32 = MP.init_pann_params(jax.random.PRNGKey(1))
    params16 = cast_model_params("pann", params32, jnp.bfloat16)

    def pann_embed(params, frontend, dtype):
        def run(waves):
            outs = []
            for i in range(0, len(waves), 32):
                w = jnp.asarray(waves[i : i + 32])
                nv = jnp.full((w.shape[0],), frames, jnp.int32)
                if frontend == "pallas":
                    mel = fused_pann_logmel(w, nv, sr, t_grid)
                else:
                    mel = fe.pann_logmel_batch(w, sr, t_grid, nv)
                e = MP.pann_forward(params, mel.astype(dtype))
                outs.append(np.asarray(e.astype(jnp.float32), np.float64))
            return np.concatenate(outs)

        return run

    ref = fad_from(pann_embed(params32, "xla", jnp.float32), bg_p, ev_p)
    print(f"pann f32 + xla-front                 : {ref:.8f}", flush=True)
    for label, fr in (
        ("pann bf16 + xla-front                ", "xla"),
        ("pann bf16 + pallas-front             ", "pallas"),
    ):
        v = fad_from(pann_embed(params16, fr, jnp.bfloat16), bg_p, ev_p)
        print(f"{label}: {v:.8f}  |delta|={abs(v - ref):.3e}", flush=True)


if __name__ == "__main__":
    main()
