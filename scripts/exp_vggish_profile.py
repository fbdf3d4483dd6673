#!/usr/bin/env python
"""Per-stage profile of the VGGish step at the shipped configuration
(B=256 x 10 s files -> 2560 [96, 64] patches, platform-default bf16).

Times prefix-slices of the fused step — the patch frontend, each conv of
the VGG stack (pools attributed to the preceding conv), and the three FC
layers — with scalar forcing and chain dispatch. VGGish has never been
per-stage profiled (rounds 1-2 tuned batch/wire/dispatch only); it is the
driver's headline metric.

Usage: python scripts/exp_vggish_profile.py [--files 256] [--iters 16] [--cpu]
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

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.models import common
    from frechet_audio_distance_exported_tpu.models.vggish import (
        CONV_CFG, init_vggish_params,
    )
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    print(f"backend: {jax.default_backend()}, files={args.files}", flush=True)
    params = init_vggish_params(jax.random.PRNGKey(0))
    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params("vggish", params, dt)

    s = 160000  # 10 s @ 16 kHz
    patches_per = fe.vggish_num_patches(s)
    wave = jax.random.normal(jax.random.PRNGKey(1), (args.files, s), jnp.float32) * 0.1

    # conv-stack prefix plan: each entry = (#convs to run, #cfg entries)
    stage_names = []
    cfg_prefix = []
    n = 0
    for i, v in enumerate(CONV_CFG):
        if v != "M":
            n += 1
            # include a following pool in this conv's slice
            j = i + 1
            while j < len(CONV_CFG) and CONV_CFG[j] == "M":
                j += 1
            stage_names.append(f"+conv{n} ({v}ch)")
            cfg_prefix.append(CONV_CFG[: j])

    def prefix(wave, n_stage: int, n_fc: int):
        pats = fe.vggish_patches_batch(wave, patches_per)
        h = pats.reshape(-1, 96, 64).astype(dt)[..., None]
        if n_stage < 0:
            return pats
        conv_i = 0
        for v in (cfg_prefix[n_stage - 1] if n_stage else ()):
            if v == "M":
                h = common.max_pool2d(h, (2, 2), (2, 2))
            else:
                p = params["features"][conv_i]
                h = jax.nn.relu(common.conv2d(h, p["w"], p["b"]))
                conv_i += 1
        if n_fc:
            h = h.reshape(h.shape[0], -1)
            for k in range(n_fc):
                p = params["embeddings"][k]
                out = common.linear(h, **p)
                h = jax.nn.relu(out) if k < 2 else out
        return h

    configs = [("frontend (patches)", -1, 0), ("cast (noop)", 0, 0)]
    configs += [(nm, i + 1, 0) for i, nm in enumerate(stage_names)]
    configs += [("+fc1 (12288->4096)", len(stage_names), 1),
                ("+fc2 (4096->4096)", len(stage_names), 2),
                ("+fc3 (4096->128)", len(stage_names), 3)]
    prev = 0.0
    for name, ns, nfc in configs:
        fn = jax.jit(
            lambda acc, w, ns=ns, nfc=nfc: acc
            + jnp.sum(prefix(w, ns, nfc).astype(jnp.float32))
        )
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        acc = fn(acc, wave)
        float(acc)
        compile_s = time.perf_counter() - t0
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            acc = fn(acc, wave)
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:22} cumulative {ms:8.2f} ms  (delta {ms - prev:+8.2f} ms, "
              f"compile {compile_s:.0f}s)", flush=True)
        prev = ms
    amin = args.files * 10.0 / 60.0
    print(f"full step at files={args.files}: {prev:.1f} ms -> "
          f"{amin / (prev / 1e3):.1f} audio-min/s/chip", flush=True)


if __name__ == "__main__":
    main()
