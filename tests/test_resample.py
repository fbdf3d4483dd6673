"""Tests for the Kaiser-sinc polyphase resampler (resampy-parity algorithm)."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.ops.resample import (
    resample,
    resample_jax,
    sinc_window,
)


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(48000, 16000), (44100, 16000), (16000, 48000), (48000, 24000), (22050, 16000)],
)
def test_device_resampler_matches_host(sr_in, sr_out):
    """The polyphase-conv device path equals the host algorithm (f32 floor)."""
    x = (np.random.default_rng(0).standard_normal(sr_in) * 0.3).astype(np.float32)
    host = resample(x, sr_in, sr_out)
    dev = np.asarray(resample_jax(x, sr_in, sr_out))
    assert host.shape == dev.shape
    np.testing.assert_allclose(dev, host, atol=2e-6)


def test_device_resampler_batched():
    x = (np.random.default_rng(1).standard_normal((3, 48000)) * 0.3).astype(np.float32)
    dev = np.asarray(resample_jax(x, 48000, 16000))
    assert dev.shape == (3, 16000)
    for b in range(3):
        np.testing.assert_allclose(dev[b], resample(x[b], 48000, 16000), atol=2e-6)


def test_identity_when_rates_match():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    assert resample(x, 16000, 16000) is x


def test_output_length_is_floor_of_ratio():
    x = np.zeros(88200, dtype=np.float32)
    assert resample(x, 44100, 16000).shape[0] == 32000
    x = np.zeros(12345, dtype=np.float32)
    assert resample(x, 44100, 16000).shape[0] == int(12345 * 16000 / 44100)


@pytest.mark.parametrize("sr_in,sr_out", [(44100, 16000), (22050, 16000), (16000, 48000), (48000, 24000)])
def test_sine_frequency_preserved(sr_in, sr_out):
    freq = 440.0
    t = np.arange(int(sr_in * 1.0)) / sr_in
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    # Dominant FFT bin should be at the sine frequency.
    spec = np.abs(np.fft.rfft(y[len(y) // 8 : -len(y) // 8 or None]))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 2 * (len(y) // 8))
    assert abs(peak_hz - freq) < 3.0


def test_sine_interior_matches_ideal():
    """Interior samples of a band-limited signal are reconstructed accurately."""
    sr_in, sr_out, freq = 48000, 16000, 997.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * freq * t)
    y = resample(x, sr_in, sr_out)
    t_out = np.arange(len(y)) / sr_out
    ideal = np.sin(2 * np.pi * freq * t_out)
    interior = slice(200, len(y) - 200)
    err = np.max(np.abs(y[interior] - ideal[interior]))
    assert err < 5e-3, err


def test_stereo_axis0():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4410, 2)).astype(np.float32)
    y = resample(x, 44100, 22050)
    assert y.shape == (2205, 2)
    y0 = resample(x[:, 0], 44100, 22050)
    np.testing.assert_allclose(y[:, 0], y0, rtol=1e-6, atol=1e-7)


def test_filter_table_shape_and_peak():
    win, num_table = sinc_window(64, 9, 14.769656459379492, 0.9475937167399596)
    assert win.shape[0] == 64 * 512 + 1
    assert num_table == 512
    # Peak at tap 0 equals the rolloff; decays beneath the taper.
    assert abs(win[0] - 0.9475937167399596) < 1e-12
    assert np.all(np.abs(win[-100:]) < 1e-4)


def test_dtype_preserved():
    x = np.random.default_rng(2).standard_normal(4410).astype(np.float32)
    assert resample(x, 44100, 16000).dtype == np.float32
    assert resample(x.astype(np.float64), 44100, 16000).dtype == np.float64


def test_invalid_rates_raise():
    x = np.zeros(100, dtype=np.float32)
    with pytest.raises(ValueError):
        resample(x, 0, 16000)
    with pytest.raises(ValueError):
        resample(x, 16000, -1)
