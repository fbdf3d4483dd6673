"""Fused Pallas log-mel kernel vs the XLA strided formulation (interpret mode
on CPU; the real-hardware path is exercised by bench.py on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.ops import dsp
from frechet_audio_distance_exported_tpu.ops.pallas_logmel import fused_logmel


def test_vggish_mode_matches_strided():
    wave = (np.random.default_rng(0).standard_normal((2, 60000)) * 0.3).astype(np.float32)
    num_frames = 1 + (60000 - 400) // 160
    mel = dsp.htk_mel_matrix(64, 257, 16000, 125.0, 7500.0)
    got = np.asarray(
        fused_logmel(jnp.asarray(wave), jnp.asarray(mel), num_frames, 400, 512, 160,
                     power=False, interpret=True)
    )
    mag = np.asarray(dsp.stft_magnitude_strided(jnp.asarray(wave), num_frames, 400, 512, 160))
    ref = np.log(mag @ mel + 0.01)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pann_mode_matches_strided():
    wave = (np.random.default_rng(1).standard_normal((1, 48512)) * 0.3).astype(np.float32)
    nf = 1 + 48000 // 160
    mel = dsp.slaney_mel_matrix(16000, 512, 64, 50, 8000)
    got = np.asarray(
        fused_logmel(jnp.asarray(wave), jnp.asarray(mel), nf, 512, 512, 160,
                     power=True, interpret=True)
    )
    power = np.asarray(dsp.stft_power_strided(jnp.asarray(wave), nf, 512, 512, 160))
    ref = 10 * np.log10(np.maximum(power @ mel, 1e-10))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_frontend_flag_routes_through_pallas(monkeypatch):
    """FAD_TPU_PALLAS_FRONTEND=1 routes the public frontends through the
    fused kernel with identical results."""
    from frechet_audio_distance_exported_tpu.ops import frontends as fe

    audio = (np.random.default_rng(3).standard_normal(32000) * 0.3).astype(np.float32)
    fe.vggish_logmel_batch.clear_cache()
    fe.vggish_patches_batch.clear_cache()
    fe.pann_logmel_batch.clear_cache()
    monkeypatch.setenv("FAD_TPU_PALLAS_FRONTEND", "1")
    p1 = fe.waveform_to_examples(audio, 16000, return_tensor=False)
    m1 = fe.waveform_to_logmel(audio, 16000, 16000, return_tensor=False)
    fe.vggish_logmel_batch.clear_cache()
    fe.vggish_patches_batch.clear_cache()
    fe.pann_logmel_batch.clear_cache()
    monkeypatch.setenv("FAD_TPU_PALLAS_FRONTEND", "0")
    p2 = fe.waveform_to_examples(audio, 16000, return_tensor=False)
    m2 = fe.waveform_to_logmel(audio, 16000, 16000, return_tensor=False)
    np.testing.assert_allclose(p1, p2, atol=1e-5)
    np.testing.assert_allclose(m1, m2, atol=1e-4)


def test_strided_stft_matches_gather_framing():
    """The gather-free STFT equals the direct framed formulation."""
    wave = (np.random.default_rng(2).standard_normal((3, 20000)) * 0.5).astype(np.float32)
    num_frames = 1 + (20000 - 400) // 160
    frames = dsp.frame_signal(jnp.asarray(wave), num_frames, 400, 160)
    ref = np.asarray(dsp.stft_power(frames, 400, 512))
    got = np.asarray(dsp.stft_power_strided(jnp.asarray(wave), num_frames, 400, 512, 160))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
