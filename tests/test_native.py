"""Native (C++/OpenMP) host runtime tests: build, exactness vs the NumPy
fallbacks, and integration through the public loader."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import native
from frechet_audio_distance_exported_tpu.ops import resample as rs


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (g++ missing?)")
    return True


def test_native_builds(lib_ok):
    assert native.available()


def test_native_resample_matches_numpy(lib_ok, monkeypatch):
    x = (np.random.default_rng(0).standard_normal(44100) * 0.3).astype(np.float32)
    fast = rs.resample(x, 44100, 16000)
    # Force the NumPy path and compare.
    monkeypatch.setenv("FAD_TPU_DISABLE_NATIVE", "1")
    slow = rs.resample(x, 44100, 16000)
    monkeypatch.delenv("FAD_TPU_DISABLE_NATIVE")
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, rtol=1e-6, atol=1e-9)


def test_native_resample_upsample(lib_ok, monkeypatch):
    x = (np.random.default_rng(1).standard_normal(16000) * 0.3).astype(np.float64)
    fast = rs.resample(x, 16000, 48000)
    monkeypatch.setenv("FAD_TPU_DISABLE_NATIVE", "1")
    slow = rs.resample(x, 16000, 48000)
    np.testing.assert_allclose(fast, slow, rtol=1e-9, atol=1e-12)


def test_native_pcm16(lib_ok):
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
    out = native.pcm_to_f32(pcm, 2, mixdown=False)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-7)
    mono = native.pcm_to_f32(pcm, 2, mixdown=True)
    np.testing.assert_allclose(
        mono, (pcm.astype(np.float32) / 32768.0).mean(axis=1), atol=1e-6
    )


def test_native_pcm32(lib_ok):
    rng = np.random.default_rng(3)
    pcm = rng.integers(-(2 ** 31), 2 ** 31 - 1, size=500, dtype=np.int32)
    out = native.pcm_to_f32(pcm, 1, mixdown=False)
    np.testing.assert_allclose(out, pcm.astype(np.float64) / 2 ** 31, atol=1e-6)


def test_wav_read_uses_native_and_matches(lib_ok, tmp_path, sine_audio):
    from frechet_audio_distance_exported_tpu.utils import audio_io

    audio = sine_audio(0.5, 440.0)
    path = str(tmp_path / "x.wav")
    audio_io.write_wav(path, audio, 16000, subtype="pcm16")
    data, sr = audio_io.read_wav(path)
    np.testing.assert_allclose(data, audio, atol=1.0 / 32768 + 1e-6)
