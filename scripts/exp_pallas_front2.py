#!/usr/bin/env python
"""Second attempt at a fused Pallas log-mel frontend (PANN/CLAP config),
pipelined this time.

Round-2's kernel (scripts/pallas_logmel_rejected.py) lost with SERIAL
per-tile manual DMA, measured through the noisy tunnel-timed harness, when
the frontend was a small slice of the step. Since then: (a) the frontend
is 13-30% of the step with precise stats-step timing (exp_clap_frontend:
CLAP 4.14 ms of 13.8 at B=32; exp_pann_profile: 5.27 of 38.9 at B=128);
(b) the XLA chunk-sum materializes M [B, T, 2F] f32 matmul outputs it then
sums (~0.4 GB/chunk at CLAP B=32) because XLA cannot fuse across matmuls;
(c) pl.Element halo blocks let the hop-row operand stream with automatic
double-buffering (exp_element_halo.py). This kernel keeps the chunk-sum in
VMEM — same accumulation order as dsp.stft_spectrum_strided — and writes
only the [T_TILE, 64] log-mel tile to HBM.

Usage:
  python scripts/exp_pallas_front2.py --check          # CPU interpret parity
  python scripts/exp_pallas_front2.py [--iters 16]     # TPU parity + timing
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse

import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fused_logmel(target_sr: int, num_frames: int, t_tile: int, interpret: bool,
                      prec=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from frechet_audio_distance_exported_tpu.config import matmul_precision
    from frechet_audio_distance_exported_tpu.ops import dsp
    from frechet_audio_distance_exported_tpu.ops import frontends as fe

    cfg = fe.PANN_CONFIGS[target_sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    mels = cfg["mel_bins"]
    cat_c, nbin = dsp._chunked_dft_cat(n_fft, n_fft, hop)
    m_chunks = cat_c.shape[0]
    catc2d = jnp.asarray(cat_c.reshape(m_chunks * hop, 2 * nbin))
    melmat = jnp.asarray(
        dsp.slaney_mel_matrix(target_sr, n_fft, mels, cfg["fmin"], cfg["fmax"])
    )
    t_pad = -(-num_frames // t_tile) * t_tile
    halo = 8  # sublane-divisible halo; only the first m_chunks-1 rows are used
    if prec is None:
        prec = matmul_precision()  # interpret mode: match the XLA path exactly

    def kernel(x_ref, nv_ref, catc_ref, mel_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        rows = x_ref[0]  # [t_tile + halo, hop]
        acc = None
        for m in range(m_chunks):
            xm = rows[m : m + t_tile]
            term = jnp.dot(
                xm,
                catc_ref[m * hop : (m + 1) * hop],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            acc = term if acc is None else acc + term
        re = acc[:, :nbin]
        im = acc[:, nbin:]
        power = re * re + im * im
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)
        log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        frame_ids = t * t_tile + jax.lax.broadcasted_iota(
            jnp.int32, (t_tile, mels), 0
        )
        log_mel = jnp.where(frame_ids < nv_ref[b], log_mel, 0.0)
        out_ref[0] = log_mel

    def fused(wave: "jnp.ndarray", n_valid: "jnp.ndarray") -> "jnp.ndarray":
        bsz = wave.shape[0]
        need = (t_pad + halo + m_chunks - 1) * hop
        if wave.shape[-1] < need:
            wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[-1])))
        x = wave[:, :need].reshape(bsz, t_pad + halo + m_chunks - 1, hop)
        out = pl.pallas_call(
            kernel,
            grid=(bsz, t_pad // t_tile),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(t_tile + halo), pl.Element(hop)),
                    lambda b, t: (b, t * t_tile, 0),
                ),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, t_tile, mels), lambda b, t: (b, t, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, t_pad, mels), jnp.float32),
            interpret=interpret,
        )(x, n_valid, catc2d, melmat)
        return out[:, :num_frames]

    return fused


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--check", action="store_true", help="CPU interpret parity only")
    ap.add_argument("--t-tile", type=int, default=0, help="0 = sweep {128,256,512}")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.ops import frontends as fe

    print(f"backend: {jax.default_backend()}", flush=True)

    cases = [
        ("clap-48k", 48000, fe.CLAP_TIME_FRAMES, 32),
        ("pann-16k", 16000, 1032, 128),
    ]
    tiles = [args.t_tile] if args.t_tile else [128, 256, 512]
    for name, sr, t_frames, bsz in cases:
        cfg = fe.PANN_CONFIGS[sr]
        n_fft, hop = cfg["window_size"], cfg["hop_size"]
        if args.check:
            bsz = 2
        length = t_frames * hop + n_fft
        wave = (
            jax.random.normal(jax.random.PRNGKey(1), (bsz, length), jnp.float32) * 0.1
        )
        n_valid = jnp.full((bsz,), t_frames - 7, jnp.int32)  # exercise the mask

        ref_fn = jax.jit(lambda w, nv: fe.pann_logmel_batch(w, sr, t_frames, nv))
        ref = np.asarray(jax.block_until_ready(ref_fn(wave, n_valid)))

        # float64 NumPy truth on the first 2 rows: windowed rFFT -> power ->
        # Slaney mel -> dB, the definition both implementations approximate.
        from frechet_audio_distance_exported_tpu.ops import dsp as _dsp

        w2 = np.asarray(wave[:2], np.float64)
        win = _dsp.periodic_hann(n_fft)
        frames = np.stack(
            [w2[:, t * hop : t * hop + n_fft] for t in range(t_frames)], axis=1
        )
        spec = np.fft.rfft(frames * win, n_fft, axis=-1)
        p64 = spec.real**2 + spec.imag**2
        mel64 = p64 @ np.asarray(
            _dsp.slaney_mel_matrix(sr, n_fft, 64, cfg["fmin"], cfg["fmax"]), np.float64
        )
        db64 = 10.0 * np.log10(np.maximum(mel64, 1e-10))
        db64[:, int(n_valid[0]):] = 0.0
        err_xla = float(np.max(np.abs(ref[:2] - db64)))
        print(f"{name}: XLA-vs-f64 max|diff|={err_xla:.3e} dB", flush=True)

        precs = ([None] if args.check
                 else [jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST])
        for t_tile in tiles:
            for prec in precs:
                fused = make_fused_logmel(sr, t_frames, t_tile,
                                          interpret=args.check, prec=prec)
                fused_j = jax.jit(fused)
                out = np.asarray(jax.block_until_ready(fused_j(wave, n_valid)))
                d = float(np.max(np.abs(out - ref)))
                bitwise = bool((out == ref).all())
                err_k = float(np.max(np.abs(out[:2] - db64)))
                pn = "chk" if prec is None else str(prec).split(".")[-1][:7]
                print(f"{name} t_tile={t_tile:4} prec={pn:7}: vs-xla={d:.3e} "
                      f"bitwise={bitwise} vs-f64={err_k:.3e} dB", flush=True)
                if args.check:
                    continue
                # timing: chain acc -> force once (same policy as bench.py)
                g = jax.jit(lambda a, w, nv, _f=fused_j: a + jnp.sum(_f(w, nv)))
                acc = jnp.zeros((), jnp.float32)
                acc = g(acc, wave, n_valid)
                float(acc)
                acc = jnp.zeros((), jnp.float32)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    acc = g(acc, wave, n_valid)
                float(acc)
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                print(f"    pallas B={bsz}: {ms:8.2f} ms", flush=True)
        if not args.check:
            g = jax.jit(lambda a, w, nv: a + jnp.sum(ref_fn(w, nv)))
            acc = jnp.zeros((), jnp.float32)
            acc = g(acc, wave, n_valid)
            float(acc)
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = g(acc, wave, n_valid)
            float(acc)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"    XLA    B={bsz}: {ms:8.2f} ms", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
