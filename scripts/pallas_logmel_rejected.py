"""REJECTED EXPERIMENT (kept out of the package): fused log-mel frontend
as a Pallas TPU kernel.

One kernel instance produces a [T_TILE, 64] log-mel tile directly from the
raw waveform: manual-DMA of the overlapping hop-row window into VMEM, the
gather-free chunked-DFT matmul sum (see dsp.chunked_dft_matrices), power or
magnitude, the mel matmul, and the log — with no HBM round-trips for frames,
spectra, or mel.

Measured on v5e (round 2, full jitted step): the XLA strided path
(dsp.stft_*_strided) WINS — vggish 386.3 vs 357.9 audio-min/s, pann-16k
141.4 vs 127.7 — because the frontend is a small fraction of step time,
XLA already fuses window->DFT->mel->log without HBM round-trips at these
sizes, and the kernel's per-tile serial DMA wait adds latency the XLA
schedule overlaps. The kernel therefore shipped as dead weight behind an
env flag through round 2 and was removed from the package in round 3; it
lives here as the measured-rejection record and as the starting point for
a frontend+conv1 fusion if the frontend ever dominates a profile.

`python scripts/pallas_logmel_rejected.py --check` re-verifies interpret-
mode numerics vs the shipped XLA path on CPU; `scripts/bench_pallas.py`
re-runs the timing comparison on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frechet_audio_distance_exported_tpu.ops import dsp

T_TILE = 256  # frames per kernel instance


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _fused_kernel(
    x_hbm,  # [U, hop] hop-rows of one batch element, ANY/HBM
    cos_ref,  # [M, hop, F] VMEM
    sin_ref,  # [M, hop, F] VMEM
    mel_ref,  # [F, MELS] VMEM
    out_ref,  # [T_TILE, MELS] VMEM
    x_vmem,  # scratch [T_TILE + M - 1, hop]
    dma_sem,
    *,
    num_chunks: int,
    power: bool,
    log_offset: float,
    amin: float,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    # DMA row count padded to the 8-row sublane tile (Mosaic requirement).
    rows = _round8(T_TILE + num_chunks - 1)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * T_TILE, rows), :], x_vmem, dma_sem
    )
    copy.start()
    copy.wait()

    from frechet_audio_distance_exported_tpu.config import matmul_precision

    prec = matmul_precision()
    if prec == jax.lax.Precision.HIGH:
        # Mosaic only lowers DEFAULT/HIGHEST dot precisions.
        prec = jax.lax.Precision.HIGHEST
    re = jnp.zeros((T_TILE, cos_ref.shape[-1]), jnp.float32)
    im = jnp.zeros((T_TILE, cos_ref.shape[-1]), jnp.float32)
    for m in range(num_chunks):
        xm = x_vmem[m : m + T_TILE, :]
        re = re + jnp.dot(xm, cos_ref[m], preferred_element_type=jnp.float32, precision=prec)
        im = im + jnp.dot(xm, sin_ref[m], preferred_element_type=jnp.float32, precision=prec)
    spec = re * re + im * im
    if not power:
        spec = jnp.sqrt(spec)
    mel = jnp.dot(spec, mel_ref[:], preferred_element_type=jnp.float32, precision=prec)
    if power:
        out_ref[0] = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    else:
        out_ref[0] = jnp.log(mel + log_offset)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_frames", "window_length", "fft_length", "hop_length",
        "power", "log_offset", "amin", "interpret",
    ),
)
def fused_logmel(
    wave: jnp.ndarray,
    mel_matrix: jnp.ndarray,
    num_frames: int,
    window_length: int,
    fft_length: int,
    hop_length: int,
    power: bool = True,
    log_offset: float = 0.01,
    amin: float = 1e-10,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, S] waveform -> [B, num_frames, MELS] log-mel, fully fused on TPU.

    power=True: 10*log10(max(mel(|X|^2), amin))   (PANN/CLAP semantics)
    power=False: log(mel(|X|) + log_offset)        (VGGish semantics)
    """
    cos_c, sin_c = dsp.chunked_dft_matrices(window_length, fft_length, hop_length)
    num_chunks = cos_c.shape[0]
    mels = mel_matrix.shape[-1]
    num_tiles = -(-num_frames // T_TILE)
    # Last tile DMAs an 8-row-aligned window starting at (num_tiles-1)*T_TILE.
    rows_needed = ((num_tiles - 1) * T_TILE + _round8(T_TILE + num_chunks - 1)) * hop_length

    b = wave.shape[0]
    if wave.shape[-1] < rows_needed:
        wave = jnp.pad(wave, ((0, 0), (0, rows_needed - wave.shape[-1])))
    x = wave[:, :rows_needed].reshape(b, -1, hop_length)
    # Mosaic DMA lanes must be 128-aligned: pad hop rows (and the matching DFT
    # chunk rows with zeros, so padded lanes contribute nothing).
    lane = _round128(hop_length)
    if lane != hop_length:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, lane - hop_length)))
        cos_c = np.pad(cos_c, ((0, 0), (0, lane - hop_length), (0, 0)))
        sin_c = np.pad(sin_c, ((0, 0), (0, lane - hop_length), (0, 0)))

    kernel = functools.partial(
        _fused_kernel,
        num_chunks=num_chunks,
        power=power,
        log_offset=log_offset,
        amin=amin,
    )
    f = fft_length // 2 + 1
    out = pl.pallas_call(
        kernel,
        grid=(b, num_tiles),
        in_specs=[
            # ANY-space operands must be whole-array with a trivial index map;
            # the kernel DMAs its own overlapping [rows, hop] window per tile.
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((num_chunks, lane, f), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_chunks, lane, f), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, mels), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, mels), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles * T_TILE, mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_round8(T_TILE + num_chunks - 1), lane), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, jnp.asarray(cos_c), jnp.asarray(sin_c), jnp.asarray(mel_matrix, jnp.float32))
    return out[:, :num_frames]


def _check():
    """Interpret-mode parity vs the shipped XLA strided path (CPU)."""
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 60000)) * 0.3).astype(np.float32)
    num_frames = 1 + (60000 - 400) // 160
    mel = dsp.htk_mel_matrix(64, 257, 16000, 125.0, 7500.0)
    got = np.asarray(
        fused_logmel(jnp.asarray(wave), jnp.asarray(mel), num_frames, 400, 512,
                     160, power=False, interpret=True)
    )
    mag = np.asarray(dsp.stft_magnitude_strided(jnp.asarray(wave), num_frames, 400, 512, 160))
    ref = np.log(mag @ mel + 0.01)
    np.testing.assert_allclose(got, ref, atol=1e-5)

    wave = (rng.standard_normal((1, 48512)) * 0.3).astype(np.float32)
    nf = 1 + 48000 // 160
    mel = dsp.slaney_mel_matrix(16000, 512, 64, 50, 8000)
    got = np.asarray(
        fused_logmel(jnp.asarray(wave), jnp.asarray(mel), nf, 512, 512, 160,
                     power=True, interpret=True)
    )
    power = np.asarray(dsp.stft_power_strided(jnp.asarray(wave), nf, 512, 512, 160))
    ref = 10 * np.log10(np.maximum(power @ mel, 1e-10))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    print("pallas_logmel_rejected --check: interpret-mode parity OK")


if __name__ == "__main__":
    import jax as _jax

    if "--check" in sys.argv:
        _jax.config.update("jax_platforms", "cpu")
        _check()
    else:
        print(__doc__)
