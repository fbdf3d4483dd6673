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
    return _PRECISIONS[os.environ.get("FAD_TPU_PRECISION", "high").lower()]


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (first TPU compile of each
    shape bucket costs tens of seconds; the cache amortizes it). Called
    lazily from FrechetAudioDistance.__init__ (NOT at import time — a
    library must not mutate global jax.config as an import side effect);
    enabled when FAD_TPU_COMPILE_CACHE names a directory or a path is given."""
    path = path or os.environ.get("FAD_TPU_COMPILE_CACHE")
    if not path:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def exact_sqrtm() -> bool:
    """FAD_TPU_EXACT_SQRTM=1 selects the reference's scipy sqrtm algorithm
    bit-for-bit over the exact-but-faster Gram/eigh epilogues."""
    return os.environ.get("FAD_TPU_EXACT_SQRTM", "") not in ("", "0")


def model_dtype():
    """Model compute dtype: float32 (default, parity) or bfloat16
    (FAD_TPU_MODEL_DTYPE=bfloat16 — native MXU dtype, ~2x matmul throughput
    and half the weight HBM traffic; expect FAD differences at the 1e-2
    level). Frontends and statistics always stay float32."""
    import jax.numpy as jnp

    name = os.environ.get("FAD_TPU_MODEL_DTYPE", "float32").lower()
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    return jnp.float32
