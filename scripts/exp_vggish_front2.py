#!/usr/bin/env python
"""VGGish frontend framing experiments: chunked-sum vs single-matmul DFT.

The shipped strided path (dsp.stft_spectrum_strided) computes the windowed
DFT as ceil(W/hop)=3 matmuls over shifted [B, T, hop] views and SUMS the
outputs. XLA cannot fuse across matmuls, so the three [B, T, 2F] f32
outputs (505 MB each at B=256) are materialized and then pairwise-added —
~1.5 GB of extra traffic the matmul-DFT math doesn't need.

Variants (full-step: frontend -> VGG stack -> FCs, scalar forcing):
  stock   : shipped chunked path (3 matmuls + adds)
  gather  : frames via [T, W] static gather, ONE [W, 2F] cat matmul
  catlane : frames via lane-concat of the 3 shifted [B, T, hop] views
            -> [B, T, 3*hop], ONE [3*hop, 2F] zero-padded cat matmul

gather/catlane change the K-accumulation order (one K=400/480 matmul vs
sum of three K=160 ones), so results differ at f32 rounding level — the
deltas are printed; golden regeneration is required if shipped.

Usage: python scripts/exp_vggish_front2.py [--files 256] [--iters 16] [--cpu]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from frechet_audio_distance_exported_tpu.config import matmul_precision, model_dtype
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.vggish import (
        CONV_CFG, init_vggish_params,
    )
    from frechet_audio_distance_exported_tpu.ops import dsp
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, files={args.files}", flush=True)
    params = init_vggish_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("vggish", params, dt)

    s = 160000
    patches_per = fe.vggish_num_patches(s)
    num_frames = patches_per * fe.VGGISH_PATCH_FRAMES
    hop, win = fe.VGGISH_HOP, fe.VGGISH_WINDOW
    wave = jax.random.normal(jax.random.PRNGKey(1), (args.files, s), jnp.float32) * 0.1

    cos_m, sin_m = dsp.windowed_dft_matrices(win, fe.VGGISH_FFT)
    cat_w = jnp.asarray(np.concatenate([cos_m, sin_m], axis=1))  # [400, 514]
    nchunk = -(-win // hop)
    padded = nchunk * hop
    cat_pad = np.zeros((padded, cat_w.shape[1]), np.float32)
    cat_pad[:win] = np.concatenate([cos_m, sin_m], axis=1)
    cat_pad = jnp.asarray(cat_pad)  # [480, 514]
    nbin = cos_m.shape[1]
    mel_mat = jnp.asarray(
        dsp.htk_mel_matrix(
            fe.VGGISH_MEL_BINS, fe.VGGISH_FFT // 2 + 1, fe.VGGISH_SAMPLE_RATE,
            fe.VGGISH_MEL_MIN_HZ, fe.VGGISH_MEL_MAX_HZ,
        )
    )

    def mel_log(both):
        power = both[..., :nbin] ** 2 + both[..., nbin:] ** 2
        mel = jnp.matmul(jnp.sqrt(power), mel_mat, preferred_element_type=jnp.float32,
                         precision=matmul_precision())
        return jnp.log(mel + fe.VGGISH_LOG_OFFSET)

    def patches_of(wave, mode):
        b = wave.shape[0]
        if mode == "stock":
            lm = fe.vggish_logmel_batch(wave, num_frames)
        elif mode == "gather":
            idx = np.arange(num_frames)[:, None] * hop + np.arange(win)[None, :]
            frames = wave[:, idx]
            both = jnp.matmul(frames, cat_w, preferred_element_type=jnp.float32,
                              precision=matmul_precision())
            lm = mel_log(both)
        else:  # catlane
            need = (num_frames + nchunk - 1) * hop
            x = wave[:, :need].reshape(b, num_frames + nchunk - 1, hop)
            frames = jnp.concatenate(
                [x[:, m : m + num_frames] for m in range(nchunk)], axis=-1
            )  # [B, T, 480]
            both = jnp.matmul(frames, cat_pad, preferred_element_type=jnp.float32,
                              precision=matmul_precision())
            lm = mel_log(both)
        return lm.reshape(b * patches_per, 96, 64)

    def step(wave, mode):
        h = patches_of(wave, mode).astype(dt)[..., None]
        conv_i = 0
        for v in CONV_CFG:
            if v == "M":
                h = common.max_pool2d(h, (2, 2), (2, 2))
            else:
                p = params["features"][conv_i]
                h = jax.nn.relu(common.conv2d(h, p["w"], p["b"]))
                conv_i += 1
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(common.linear(h, **params["embeddings"][0]))
        h = jax.nn.relu(common.linear(h, **params["embeddings"][1]))
        return common.linear(h, **params["embeddings"][2])

    if args.cpu:
        a = patches_of(wave[:2], "stock")
        for mode in ("gather", "catlane"):
            d = float(jnp.max(jnp.abs(patches_of(wave[:2], mode) - a)))
            print(f"{mode}: log-mel max abs vs stock {d:.2e}", flush=True)
        return

    # frontend-only then full-step
    for tag, builder in [("front", patches_of), ("step", step)]:
        ref = None
        for mode in ("stock", "gather", "catlane"):
            fn = jax.jit(
                lambda acc, w, mode=mode, b=builder: acc
                + jnp.sum(b(w, mode).astype(jnp.float32))
            )
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            acc = fn(acc, wave)
            v = float(acc)
            compile_s = time.perf_counter() - t0
            if ref is None:
                ref = v
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = fn(acc, wave)
            float(acc)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            amin = args.files * 10.0 / 60.0
            print(
                f"{tag} {mode:8} {ms:8.2f} ms  {amin / (ms / 1e3):7.1f} audio-min/s  "
                f"(sum rel-dev {abs(v - ref) / (abs(ref) + 1e-30):.2e}, "
                f"compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
