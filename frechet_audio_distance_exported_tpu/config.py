"""Global numerics configuration.

The reference computes everything in float32 (torch CPU) or float64 (NumPy
frontends). On TPU the MXU natively multiplies in bfloat16; matmul/conv
precision is configurable via FAD_TPU_PRECISION:

- 'high' (default): bf16x3 composition. Measured on v5e: embeddings within
  3e-4 max relative of the full-f32 path (median 9e-6) — comfortably inside
  the FAD <= 1e-3 parity bar — at ~1.35x the throughput of 'highest'.
- 'highest': full f32 emulation (bf16x6), bitwise-closest to the reference.
- 'default'/'bfloat16': single-pass bf16 (max_rel ~5e-2; use with care).
"""

from __future__ import annotations

import os

import jax

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "bfloat16": jax.lax.Precision.DEFAULT,
}


def matmul_precision() -> jax.lax.Precision:
    name = os.environ.get("FAD_TPU_PRECISION", "high").strip().lower()
    try:
        return _PRECISIONS[name]
    except KeyError:
        # A typo must not surface as a bare KeyError from inside jit tracing.
        raise ValueError(
            f"FAD_TPU_PRECISION={name!r}: expected one of {sorted(_PRECISIONS)}"
        ) from None


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA/Mosaic compilations across processes (first TPU compile of
    each shape bucket costs tens of seconds; the fused CLAP attention kernels
    cost ~3 min through the tunnel's remote-compile hop). Called lazily from
    FrechetAudioDistance.__init__ (NOT at import time — a library must not
    mutate global jax.config as an import side effect).

    Opt-in: enabled when FAD_TPU_COMPILE_CACHE names a directory (or a path
    is passed). NOT default-on: measured on the axon-tunneled chip, the
    persistent cache wedges the backend while serializing the compiled
    executable (the driver bench watchdog fired at 600 s; the identical run
    with the cache disabled finished in ~3 min) — only the small host-side
    RNG jits ever reached the cache dir. Opt in explicitly on hosts where
    executable serialization is known to work."""
    path = path or os.environ.get("FAD_TPU_COMPILE_CACHE")
    if not path or path.strip() in ("", "0"):
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def exactness_forced() -> bool:
    """True when the user explicitly asked for the bitwise-closest numerics:
    FAD_TPU_PRECISION=highest, or an explicit FAD_TPU_MODEL_DTYPE=float32.

    Components with a fast-but-DEFAULT-precision device default consult this
    and fall back to their exact form: the fused Pallas frontends (bf16 MXU
    DFT/mel matmuls, up to ~0.6 dB on near-cancellation quiet bins) revert to
    the HIGH/HIGHEST XLA chunk-sum, VGGish's lane-concat single-matmul DFT
    reverts to the chunk-sum accumulation order, and the Encodec LSTM operand
    dtype stays float32 (lstm_op_dtype below)."""
    import jax.numpy as jnp

    if os.environ.get("FAD_TPU_PRECISION", "").strip().lower() == "highest":
        return True
    return model_dtype_is_forced() and model_dtype() == jnp.float32


def exact_sqrtm() -> bool:
    """FAD_TPU_EXACT_SQRTM=1 selects the reference's scipy sqrtm algorithm
    bit-for-bit over the exact-but-faster Gram/eigh epilogues."""
    return os.environ.get("FAD_TPU_EXACT_SQRTM", "") not in ("", "0")


def model_dtype_is_forced() -> bool:
    """True when FAD_TPU_MODEL_DTYPE is set explicitly (used by the
    encodec-48k rule: the platform default keeps it f32, an explicit env
    value opts into mixed bf16 — pipeline.py)."""
    return bool(os.environ.get("FAD_TPU_MODEL_DTYPE"))


def model_dtype():
    """Model compute dtype. FAD_TPU_MODEL_DTYPE=float32|bfloat16 forces it;
    unset, the default is platform-aware: bfloat16 on TPU (the MXU's native
    dtype — ~2x matmul throughput and half the activation/weight HBM
    traffic), float32 elsewhere (CPU tests and the reference-parity harness).

    The bfloat16 default is backed by the round-2 v5e study (PARITY.md): FAD
    deltas vs the float32 path are 1.1e-7 (vggish), 4.4e-7 (pann-16k),
    3.9e-5 (clap) on identical dirs — orders below the 1e-3 parity bar.
    Encodec runs MIXED precision in this mode (conv stages bf16, LSTM +
    output projection float32, pipeline.cast_model_params): full bf16
    compounds error over the LSTM's ~750 sequential steps and destroys the
    score. Statistics always stay float32. Frontends keep float32
    intermediates on the XLA path, but the TPU default ('auto' in
    ops/frontends._resolve_frontend) is the fused Pallas kernel whose
    DFT/mel matmuls run at Mosaic DEFAULT precision (bf16 operand passes) —
    FAD_TPU_FUSED_FRONTEND=0, FAD_TPU_PRECISION=highest, or an explicit
    float32 force here all revert it to the exact XLA chunk-sum."""
    import jax.numpy as jnp

    name = os.environ.get("FAD_TPU_MODEL_DTYPE", "").strip().lower()
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", "fp32"):
        return jnp.float32
    if name:
        # A typo must not silently fall through to the platform default (and
        # would also defeat pipeline.py's encodec-48k explicit-opt-in check).
        raise ValueError(
            f"FAD_TPU_MODEL_DTYPE={name!r}: expected 'float32' or 'bfloat16'"
        )
    import jax

    return jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32


def lstm_op_dtype():
    """Operand dtype for Encodec's in-scan recurrent matmuls (the carry,
    gates, and accumulation always stay float32 — models/encodec._slstm).

    FAD_TPU_LSTM_MATMUL=float32|bfloat16 forces it. Unset, the default is
    bfloat16 on TPU (1 MXU pass instead of HIGH's 3: scan 1.48x/1.82x on the
    24k/48k shapes, output error 9.1e-5 relative, 48k FAD delta 3.9e-5 —
    scripts/exp_lstm_bf16.py, exp_lstm48_fad.py) and float32 elsewhere.
    An explicit FAD_TPU_MODEL_DTYPE=float32 means "exact float32 everywhere"
    and keeps the LSTM matmuls float32 too."""
    import jax.numpy as jnp

    name = os.environ.get("FAD_TPU_LSTM_MATMUL", "").strip().lower()
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float32", "f32", "fp32"):
        return jnp.float32
    if name:
        raise ValueError(
            f"FAD_TPU_LSTM_MATMUL={name!r}: expected 'float32' or 'bfloat16'"
        )
    if exactness_forced():
        # "Full-f32, bitwise-closest to the reference" must cover the LSTM's
        # recurrent matmuls too, not just the matmul_precision()-honoring ops.
        return jnp.float32
    import jax

    return jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else jnp.float32
