"""Tests for the self-contained WAV codec and reference-semantics loader."""

import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io


def test_pcm16_roundtrip(tmp_path, sine_audio):
    audio = sine_audio(0.5, 440.0)
    path = str(tmp_path / "a.wav")
    audio_io.write_wav(path, audio, 16000, subtype="pcm16")
    data, sr = audio_io.read_wav(path)
    assert sr == 16000
    assert data.dtype == np.float32
    assert data.shape == audio.shape
    np.testing.assert_allclose(data, audio, atol=1.0 / 32768 + 1e-6)


def test_float32_roundtrip_exact(tmp_path, sine_audio):
    audio = sine_audio(0.25, 880.0)
    path = str(tmp_path / "f.wav")
    audio_io.write_wav(path, audio, 16000, subtype="float32")
    data, sr = audio_io.read_wav(path)
    np.testing.assert_array_equal(data, audio)


def test_stereo_shape(tmp_path, sine_audio):
    left = sine_audio(0.2, 440.0)
    right = sine_audio(0.2, 880.0)
    stereo = np.stack([left, right], axis=1)
    path = str(tmp_path / "s.wav")
    audio_io.write_wav(path, stereo, 16000, subtype="float32")
    data, sr = audio_io.read_wav(path)
    assert data.shape == stereo.shape
    np.testing.assert_array_equal(data, stereo)


def test_int16_read_mode(tmp_path, sine_audio):
    audio = sine_audio(0.1, 440.0)
    path = str(tmp_path / "i.wav")
    audio_io.write_wav(path, audio, 16000, subtype="pcm16")
    data, sr = audio_io.read_wav(path, dtype="int16")
    assert data.dtype == np.int16
    assert np.max(np.abs(data)) > 8000  # half fullscale sine


def test_load_audio_mono_mix_and_resample(tmp_path, sine_audio):
    left = sine_audio(0.5, 440.0, 44100)
    stereo = np.stack([left, left], axis=1)
    path = str(tmp_path / "st.wav")
    audio_io.write_wav(path, stereo, 44100, subtype="float32")
    out = audio_io.load_audio(path, 16000, channels=1)
    assert out.ndim == 1
    assert out.shape[0] == int(len(left) * 16000 / 44100)


def test_load_audio_int16_normalization_quirk(tmp_path, sine_audio):
    """dtype='int16' divides the raw ints by 32768 (reference fad.py:147-151)."""
    audio = sine_audio(0.1, 440.0)
    path = str(tmp_path / "q.wav")
    audio_io.write_wav(path, audio, 16000, subtype="pcm16")
    out = audio_io.load_audio(path, 16000, channels=1, dtype="int16")
    assert np.max(np.abs(out)) <= 1.0
    np.testing.assert_allclose(out, audio, atol=1.0 / 32768 + 1e-6)


def test_hidden_files_filtered(tmp_path, sine_audio):
    audio = sine_audio(0.1, 440.0)
    audio_io.write_wav(str(tmp_path / "x.wav"), audio, 16000)
    audio_io.write_wav(str(tmp_path / ".hidden.wav"), audio, 16000)
    files = audio_io.list_audio_files(str(tmp_path))
    assert files == ["x.wav"]


def test_load_audio_files_threadpool(tmp_path, sine_audio):
    for i in range(5):
        audio_io.write_wav(str(tmp_path / f"{i}.wav"), sine_audio(0.2, 440.0 + i), 16000)
    out = audio_io.load_audio_files(str(tmp_path), 16000, 1, num_workers=3)
    assert len(out) == 5
    assert all(a.shape == out[0].shape for a in out)


def test_pcm24_decode(tmp_path):
    # Hand-build a 24-bit PCM file: fullscale positive and negative samples.
    import struct

    samples = [(1 << 23) - 1, -(1 << 23), 0]
    payload = b"".join(struct.pack("<i", s << 8)[1:4] for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    path = str(tmp_path / "p24.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)
    data, sr = audio_io.read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(data, [1.0, -1.0, 0.0], atol=2e-7)
