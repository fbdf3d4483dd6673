"""Fused Pallas log-mel frontend vs the XLA chunk-sum path it replaces
(interpret mode on CPU; measured 1.4-1.7x on v5e, ops/pallas_frontend.py).

In interpret mode both paths run exact f32 matmuls with the identical
chunk-major accumulation order, so parity is bitwise — any nonzero diff is
a real indexing/halo/mask bug, not precision noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frechet_audio_distance_exported_tpu.ops import frontends as fe
from frechet_audio_distance_exported_tpu.ops.pallas_frontend import fused_pann_logmel


def _wave(bsz, length, seed=0):
    return (
        jax.random.normal(jax.random.PRNGKey(seed), (bsz, length), jnp.float32) * 0.1
    )


@pytest.mark.parametrize(
    "sr,num_frames",
    [
        (8000, 140),    # m_chunks=4, hop 80
        (16000, 260),   # m_chunks=4, hop 160; non-multiple of t_tile
        (32000, 128),   # m_chunks=4, hop 320; exact one tile
        (48000, 1001),  # CLAP geometry: m_chunks=3, hop 480
    ],
)
def test_matches_xla_bitwise(sr, num_frames):
    cfg = fe.PANN_CONFIGS[sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    length = num_frames * hop + n_fft
    wave = _wave(2, length, seed=sr)
    n_valid = jnp.asarray([num_frames, max(1, num_frames - 9)], jnp.int32)

    ref = fe.pann_logmel_batch(wave, sr, num_frames, n_valid)
    out = fused_pann_logmel(wave, n_valid, sr, num_frames, interpret=True)
    assert out.shape == ref.shape
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_call_under_shard_map_matches_unsharded():
    """The pipeline shard_maps the frontend+model core under a mesh so the
    Pallas kernels run per-shard (pipeline._core). Lock the pallas_call +
    shard_map combination itself: run the fused frontend (interpret mode)
    inside shard_map over the 8-device CPU mesh and require bitwise equality
    with the unsharded call. Catches GSPMD/vma regressions like the
    check_vma ShapeDtypeStruct error class without TPU hardware."""
    from jax.sharding import PartitionSpec as P

    from frechet_audio_distance_exported_tpu.parallel.embed import shard_map
    from frechet_audio_distance_exported_tpu.parallel.mesh import DATA_AXIS, data_mesh

    sr, num_frames = 16000, 96
    cfg = fe.PANN_CONFIGS[sr]
    length = num_frames * cfg["hop_size"] + cfg["window_size"]
    wave = _wave(8, length, seed=3)
    n_valid = jnp.asarray([num_frames] * 7 + [num_frames - 5], jnp.int32)

    ref = fused_pann_logmel(wave, n_valid, sr, num_frames, interpret=True)
    mesh = data_mesh(jax.devices("cpu")[:8])
    sharded = shard_map(
        lambda w, n: fused_pann_logmel(w, n, sr, num_frames, interpret=True),
        mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        # pallas_call-bearing body: the jax 0.9 vma lint must be opted out,
        # same as pipeline._mesh_wrap does — that opt-out IS what this test
        # locks in combination with shard_map.
        check_vma=False,
    )
    out = jax.jit(sharded)(wave, n_valid)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_mask_zeroes_invalid_rows():
    sr, num_frames = 16000, 200
    cfg = fe.PANN_CONFIGS[sr]
    length = num_frames * cfg["hop_size"] + cfg["window_size"]
    wave = _wave(3, length, seed=1)
    n_valid = jnp.asarray([200, 64, 0], jnp.int32)
    out = np.asarray(fused_pann_logmel(wave, n_valid, sr, num_frames, interpret=True))
    assert np.all(out[1, 64:] == 0.0)
    assert np.all(out[2] == 0.0)
    assert np.any(out[1, :64] != 0.0)


def test_short_wave_is_zero_extended():
    # Callers bucket-pad, but the kernel itself must tolerate a wave shorter
    # than the halo needs (trailing frames read zeros, like jnp.pad in the
    # XLA path).
    sr, num_frames = 16000, 96
    cfg = fe.PANN_CONFIGS[sr]
    exact = num_frames * cfg["hop_size"]  # no tail for the last windows
    wave = _wave(1, exact, seed=2)
    n_valid = jnp.asarray([num_frames], jnp.int32)
    ref = fe.pann_logmel_batch(wave, sr, num_frames, n_valid)
    out = fused_pann_logmel(wave, n_valid, sr, num_frames, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


# 96: one 128-tile exact; 296: non-multiple; 480: auto-picks the 512 tile
# (the shipped TPU default for >=4-patch grids, ops/pallas_frontend.py).
@pytest.mark.parametrize("num_frames", [96, 296, 480])
def test_vggish_matches_xla_chunk_sum(num_frames):
    from frechet_audio_distance_exported_tpu.ops import dsp
    from frechet_audio_distance_exported_tpu.ops.pallas_frontend import (
        fused_vggish_logmel,
    )

    length = num_frames * fe.VGGISH_HOP + fe.VGGISH_FFT
    wave = _wave(2, length, seed=3)
    # The kernel keeps the chunk-sum accumulation order; the shipped XLA
    # vggish path opts into the single-matmul form (different K order), so
    # the bitwise reference here is the chunk-sum assembly.
    mag = dsp.stft_magnitude_strided(
        wave, num_frames, fe.VGGISH_WINDOW, fe.VGGISH_FFT, fe.VGGISH_HOP,
        single_matmul=False,
    )
    mel_mat = jnp.asarray(
        dsp.htk_mel_matrix(
            fe.VGGISH_MEL_BINS, fe.VGGISH_FFT // 2 + 1, fe.VGGISH_SAMPLE_RATE,
            fe.VGGISH_MEL_MIN_HZ, fe.VGGISH_MEL_MAX_HZ,
        )
    )
    ref = np.asarray(jnp.log(mag @ mel_mat + fe.VGGISH_LOG_OFFSET))
    out = np.asarray(fused_vggish_logmel(wave, num_frames, interpret=True))
    assert out.shape == ref.shape
    # 1-2 ulp: XLA fuses the reference's mel matmul + log differently from
    # the interpret-mode kernel; the PANN case is bitwise because its
    # reference path is the identical dot sequence.
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # And the shipped single-matmul path agrees to float-assoc noise.
    shipped = np.asarray(fe.vggish_logmel_batch(wave, num_frames))
    np.testing.assert_allclose(out, shipped, atol=2e-5)


def test_resolve_frontend_modes():
    assert fe._resolve_frontend("xla") == "xla"
    assert fe._resolve_frontend("pallas") == "pallas"
    # CPU backend: auto resolves to the XLA path (Mosaic unavailable).
    assert fe._resolve_frontend("auto") == "xla"
    with pytest.raises(ValueError):
        fe._resolve_frontend("fast")


def test_env_off_switch(monkeypatch):
    monkeypatch.setenv("FAD_TPU_FUSED_FRONTEND", "0")
    assert fe._resolve_frontend("auto") == "xla"


def test_env_typo_rejected(monkeypatch):
    monkeypatch.setenv("FAD_TPU_FUSED_FRONTEND", "fused-please")
    with pytest.raises(ValueError, match="FAD_TPU_FUSED_FRONTEND"):
        fe._resolve_frontend("auto")


def test_explicit_on_beats_exactness_force(monkeypatch):
    """An explicit opt-in wins over the exactness force; only the UNSET
    default reverts to 'xla' under it (code-review r4 finding)."""
    import jax as _jax

    monkeypatch.setenv("FAD_TPU_PRECISION", "highest")
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("FAD_TPU_FUSED_FRONTEND", raising=False)
    assert fe._resolve_frontend("auto") == "xla"
    monkeypatch.setenv("FAD_TPU_FUSED_FRONTEND", "1")
    assert fe._resolve_frontend("auto") == "pallas"
