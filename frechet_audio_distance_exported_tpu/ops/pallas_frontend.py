"""Fused Pallas log-mel frontend for the PANN/CLAP (librosa-parity) config.

The XLA lowering of the chunk-sum STFT (dsp.stft_spectrum_strided) cannot
fuse across matmuls, so it materializes M = ceil(n_fft/hop) full [B, T, 2F]
float32 matmul outputs in HBM and then sums them (~0.4 GB/step at CLAP
B=32) before the power/mel/log epilogue. This kernel keeps the whole
window -> DFT -> power -> Slaney-mel -> dB chain in VMEM per [T_TILE, 64]
output tile: each grid cell reads an overlapping (halo) block of hop-sized
waveform rows via ``pl.Element`` block specs — Pallas double-buffers the
streaming automatically — accumulates the M chunk matmuls in registers in
the SAME order as the XLA path, and writes only the log-mel tile to HBM.

Measured (scripts/exp_pallas_front2.py, v5e, t_tile=128):

| config            | XLA (HIGH) | kernel DEFAULT | kernel HIGHEST |
|-------------------|-----------|----------------|----------------|
| clap-48k  B=32    | 4.89 ms   | 2.95 ms (1.66x)| 5.99 ms        |
| pann-16k  B=128   | 5.45 ms   | 3.83 ms (1.42x)| 9.44 ms        |

Numerics vs a float64 NumPy truth (windowed rFFT -> power -> mel -> dB):
XLA-HIGH 1.8e-3 dB, kernel-HIGHEST 4.6e-4 dB (MORE exact than the shipped
XLA path — Mosaic has no HIGH, only DEFAULT/HIGHEST), kernel-DEFAULT up to
~0.6 dB in near-cancellation quiet bins (bf16 operand rounding). The
shipped pipeline immediately casts the log-mel to bfloat16 for the model,
whose spacing at |x| in [64, 128) dB is 0.5 dB — the DEFAULT error is the
same scale as the quantization the model input already carries; the
FAD-level acceptance gate lives in scripts/exp_fused_frontend_fad.py.

Host-facing API paths (waveform_to_logmel, goldens, verify_parity) always
use the XLA chunk-sum path; this kernel is only selected inside the fused
device step (ops/frontends._resolve_frontend).

Reference behavior being reproduced: librosa center-STFT power mel in dB
(reference: models/pann.py:107-136), with rows >= n_valid zeroed exactly
like the reference's pad of the log-mel onto the PANN time grid
(reference: fad.py:41-66).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp

# Sublane-divisible halo row count; covers ceil(n_fft/hop) - 1 extra rows
# (<= 3 for every shipped PANN/CLAP config).
_HALO = 8
# Best tile across both shipped geometries in the measured sweep
# ({128, 256, 512} x {DEFAULT, HIGHEST}).
_T_TILE = 128


@functools.lru_cache(maxsize=4)
def _vggish_consts():
    """(cat DFT matrix [m*hop, 2F], HTK mel matrix [F, mels], m, nbin)."""
    from .frontends import (
        VGGISH_FFT,
        VGGISH_HOP,
        VGGISH_MEL_BINS,
        VGGISH_MEL_MAX_HZ,
        VGGISH_MEL_MIN_HZ,
        VGGISH_SAMPLE_RATE,
        VGGISH_WINDOW,
    )

    cat_c, nbin = dsp._chunked_dft_cat(VGGISH_WINDOW, VGGISH_FFT, VGGISH_HOP)
    m_chunks = cat_c.shape[0]
    catc2d = cat_c.reshape(m_chunks * VGGISH_HOP, 2 * nbin)
    melmat = dsp.htk_mel_matrix(
        VGGISH_MEL_BINS, VGGISH_FFT // 2 + 1, VGGISH_SAMPLE_RATE,
        VGGISH_MEL_MIN_HZ, VGGISH_MEL_MAX_HZ,
    )
    return catc2d, melmat, m_chunks, nbin


@functools.partial(
    jax.jit, static_argnames=("num_frames", "t_tile", "interpret", "precision")
)
def fused_vggish_logmel(
    wave: jnp.ndarray,
    num_frames: int,
    t_tile: int = 0,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """float32 [B, S] @16 kHz -> [B, num_frames, 64] HTK log-mel.

    Semantics match frontends.vggish_logmel_batch's chunk-sum form: frame t
    spans wave[t*hop : t*hop + 400] (uncentered grid), magnitude spectrum
    (NOT power; reference models/vggish.py:125-141), HTK
    mel with zeroed DC column, log(mel + 0.01). No mask — VGGish callers
    mask whole patches via per-file patch counts. int16 dequantization stays
    with the caller. t_tile=0 picks 512 when its grid padding stays within
    10% of the 128-tile grid (B=512 x 960-frame sweep: 9.60 -> 8.83 ms, a
    ~16% per-row win that a 6.7% pad still clears; pann/clap geometries
    measured flat or worse at 512 and keep _T_TILE). Mid-size grids whose
    512-rounding would pad 30-80% (e.g. 576 frames -> 1024) keep 128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .frontends import VGGISH_HOP, VGGISH_LOG_OFFSET, VGGISH_MEL_BINS

    if not t_tile:
        pad512 = -(-num_frames // 512) * 512
        pad128 = -(-num_frames // _T_TILE) * _T_TILE
        t_tile = 512 if pad512 * 10 <= pad128 * 11 else _T_TILE

    catc2d_np, melmat_np, m_chunks, nbin = _vggish_consts()
    catc2d = jnp.asarray(catc2d_np)
    melmat = jnp.asarray(melmat_np)
    hop, mels = VGGISH_HOP, VGGISH_MEL_BINS
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    t_pad = -(-num_frames // t_tile) * t_tile

    def kernel(x_ref, catc_ref, mel_ref, out_ref):
        rows = x_ref[0]
        acc = None
        for m in range(m_chunks):
            xm = rows[m : m + t_tile]
            term = jnp.dot(
                xm,
                catc_ref[m * hop : (m + 1) * hop],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = term if acc is None else acc + term
        re = acc[:, :nbin]
        im = acc[:, nbin:]
        mag = jnp.sqrt(re * re + im * im)
        mel = jnp.dot(
            mag, mel_ref[:], preferred_element_type=jnp.float32, precision=precision
        )
        out_ref[0] = jnp.log(mel + VGGISH_LOG_OFFSET)

    bsz = wave.shape[0]
    need = (t_pad + _HALO + m_chunks - 1) * hop
    if wave.shape[-1] < need:
        wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[-1])))
    x = wave[:, :need].reshape(bsz, t_pad + _HALO + m_chunks - 1, hop)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, t_pad // t_tile),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(t_tile + _HALO), pl.Element(hop)),
                lambda b, t: (b, t * t_tile, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, mels), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, mels), jnp.float32),
        interpret=interpret,
    )(x, catc2d, melmat)
    return out[:, :num_frames]


@functools.lru_cache(maxsize=16)
def _front_consts(target_sample_rate: int):
    """(cat DFT matrix [m*hop, 2F], mel matrix [F, mels], m, nbin, cfg)."""
    from .frontends import PANN_CONFIGS

    cfg = PANN_CONFIGS[target_sample_rate]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    cat_c, nbin = dsp._chunked_dft_cat(n_fft, n_fft, hop)
    m_chunks = cat_c.shape[0]
    if m_chunks - 1 > _HALO:
        raise ValueError(f"halo {_HALO} < m_chunks-1 = {m_chunks - 1}")
    catc2d = cat_c.reshape(m_chunks * hop, 2 * nbin)
    melmat = dsp.slaney_mel_matrix(
        target_sample_rate, n_fft, cfg["mel_bins"], cfg["fmin"], cfg["fmax"]
    )
    return catc2d, melmat, m_chunks, nbin, (n_fft, hop, cfg["mel_bins"])


@functools.partial(
    jax.jit,
    static_argnames=("target_sample_rate", "num_frames", "t_tile", "interpret", "precision"),
)
def fused_pann_logmel(
    wave: jnp.ndarray,
    n_valid_frames: jnp.ndarray,
    target_sample_rate: int,
    num_frames: int,
    t_tile: int = _T_TILE,
    interpret: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Reflect-padded float32 [B, L] -> [B, num_frames, 64] log-mel (dB).

    Semantics match frontends.pann_logmel_batch (float32 input form): frame
    t spans wave[t*hop : t*hop + n_fft]; rows >= n_valid_frames[b] are 0.
    int16 dequantization stays with the caller.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    catc2d_np, melmat_np, m_chunks, nbin, (n_fft, hop, mels) = _front_consts(
        target_sample_rate
    )
    catc2d = jnp.asarray(catc2d_np)
    melmat = jnp.asarray(melmat_np)
    if precision is None:
        # Fast path: single bf16 MXU pass per dot. Mosaic supports only
        # DEFAULT/HIGHEST; the FAD-level acceptance of DEFAULT is recorded in
        # scripts/exp_fused_frontend_fad.py. Interpret mode (CPU tests) is
        # exact f32 regardless.
        precision = jax.lax.Precision.DEFAULT

    t_pad = -(-num_frames // t_tile) * t_tile

    def kernel(x_ref, nv_ref, catc_ref, mel_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        rows = x_ref[0]  # [t_tile + _HALO, hop]; rows beyond m_chunks-1 unused
        acc = None
        for m in range(m_chunks):
            xm = rows[m : m + t_tile]
            term = jnp.dot(
                xm,
                catc_ref[m * hop : (m + 1) * hop],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = term if acc is None else acc + term  # XLA chunk-sum order
        re = acc[:, :nbin]
        im = acc[:, nbin:]
        power = re * re + im * im
        mel = jnp.dot(
            power, mel_ref[:], preferred_element_type=jnp.float32, precision=precision
        )
        log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        frame_ids = t * t_tile + jax.lax.broadcasted_iota(jnp.int32, (t_tile, mels), 0)
        out_ref[0] = jnp.where(frame_ids < nv_ref[b], log_mel, 0.0)

    bsz = wave.shape[0]
    need = (t_pad + _HALO + m_chunks - 1) * hop
    if wave.shape[-1] < need:
        wave = jnp.pad(wave, ((0, 0), (0, need - wave.shape[-1])))
    x = wave[:, :need].reshape(bsz, t_pad + _HALO + m_chunks - 1, hop)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, t_pad // t_tile),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(t_tile + _HALO), pl.Element(hop)),
                lambda b, t: (b, t * t_tile, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, mels), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, mels), jnp.float32),
        interpret=interpret,
    )(x, n_valid_frames.astype(jnp.int32), catc2d, melmat)
    return out[:, :num_frames]
