#!/usr/bin/env python
"""VGGish front-40% experiments (round-3 profile: frontend 9.44 ms +
conv1-incl-pool1 7.67 ms of a 42.3 ms step at B=256 files).

Variants measured on the FULL fused step (frontend -> conv stack -> FCs),
scalar forcing, chain dispatch:

  stock     : shipped path (reduce_window pools, two DFT matmuls)
  rpool     : 2x2/2 max pools as reshape-max (XLA can output-fuse a
              reshape+reduce into the conv, unlike reduce_window whose
              producer never fuses -> the 2.0 GB conv1 output materializes)
  dftcat    : cos|sin DFT matrices concatenated into ONE [400, 514] matmul
              (halves the [245k, 400] frame reads and bf16x3 LHS passes)
  rpool+cat : both

Usage: python scripts/exp_vggish_front.py [--files 256] [--iters 16] [--cpu]
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
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--files", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
    wave = jax.random.normal(jax.random.PRNGKey(1), (args.files, s), jnp.float32) * 0.1

    import numpy as np

    cos_c, sin_c = dsp.chunked_dft_matrices(
        fe.VGGISH_WINDOW, fe.VGGISH_FFT, fe.VGGISH_HOP
    )
    cat_c = jnp.asarray(np.concatenate([cos_c, sin_c], axis=2))  # [m, hop, 2F]
    nbin = cos_c.shape[2]
    num_chunks = cos_c.shape[0]
    mel_mat = jnp.asarray(
        dsp.htk_mel_matrix(
            fe.VGGISH_MEL_BINS, fe.VGGISH_FFT // 2 + 1, fe.VGGISH_SAMPLE_RATE,
            fe.VGGISH_MEL_MIN_HZ, fe.VGGISH_MEL_MAX_HZ,
        )
    )

    def patches_dftcat(wave):
        wave = fe.dequant_i16(wave)
        need = (num_frames + num_chunks - 1) * fe.VGGISH_HOP
        if wave.shape[-1] < need:
            wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[-1])))
        x = wave[:, :need].reshape(wave.shape[0], num_frames + num_chunks - 1, fe.VGGISH_HOP)
        both = None
        for m in range(num_chunks):
            xm = x[:, m : m + num_frames]
            t = jnp.matmul(xm, cat_c[m], preferred_element_type=jnp.float32,
                           precision=matmul_precision())
            both = t if both is None else both + t
        power = both[..., :nbin] ** 2 + both[..., nbin:] ** 2
        mel = jnp.matmul(
            jnp.sqrt(power), mel_mat, preferred_element_type=jnp.float32,
            precision=matmul_precision(),
        )
        log_mel = jnp.log(mel + fe.VGGISH_LOG_OFFSET)
        return log_mel.reshape(wave.shape[0], patches_per, 96, 64)

    def max_pool_reshape(h):
        b, hh, ww, c = h.shape
        h = h.reshape(b, hh // 2, 2, ww // 2, 2, c)
        return h.max(axis=(2, 4))

    def step(wave, use_rpool: bool, use_cat: bool):
        pats = patches_dftcat(wave) if use_cat else fe.vggish_patches_batch(wave, patches_per)
        h = pats.reshape(-1, 96, 64).astype(dt)[..., None]
        conv_i = 0
        for v in CONV_CFG:
            if v == "M":
                h = max_pool_reshape(h) if use_rpool else common.max_pool2d(h, (2, 2), (2, 2))
            else:
                p = params["features"][conv_i]
                h = jax.nn.relu(common.conv2d(h, p["w"], p["b"]))
                conv_i += 1
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(common.linear(h, **params["embeddings"][0]))
        h = jax.nn.relu(common.linear(h, **params["embeddings"][1]))
        return common.linear(h, **params["embeddings"][2])

    ref = None
    for name, rp, ct in [("stock", False, False), ("rpool", True, False),
                         ("dftcat", False, True), ("rpool+cat", True, True)]:
        fn = jax.jit(
            lambda acc, w, rp=rp, ct=ct: acc
            + jnp.sum(step(w, rp, ct).astype(jnp.float32))
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
        rel = abs(v - ref) / (abs(ref) + 1e-30)
        print(
            f"{name:10} {ms:8.2f} ms  {amin / (ms / 1e3):7.1f} audio-min/s  "
            f"(sum rel-dev {rel:.2e}, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
