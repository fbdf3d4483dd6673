"""FLAC codec tests: encoder/decoder round trips (lossless by construction),
decoder feature coverage (subframe types, stereo decorrelation, bit depths,
Rice escapes), and integration with load_audio/score (the reference accepts
FLAC via libsndfile, reference: fad.py:145)."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io
from frechet_audio_distance_exported_tpu.utils import flac


def _sine(dur, freq, sr, amp=0.5):
    t = np.linspace(0, dur, int(sr * dur), dtype=np.float64)
    return np.sin(2 * np.pi * freq * t) * amp


class TestRoundTrip:
    def test_mono_sine_lossless(self, tmp_path):
        sr = 16000
        x = _sine(1.3, 440.0, sr)
        pcm = np.round(x * 32768.0).clip(-32768, 32767).astype(np.int64)
        path = str(tmp_path / "a.flac")
        flac.write_flac(path, x, sr)
        got, got_sr = flac.read_flac(path, dtype="float32")
        assert got_sr == sr
        np.testing.assert_array_equal(np.round(got * 32768.0).astype(np.int64), pcm)

    def test_stereo_lossless(self, tmp_path):
        sr = 44100
        x = np.stack([_sine(0.7, 440.0, sr), _sine(0.7, 523.0, sr)], axis=1)
        path = str(tmp_path / "s.flac")
        flac.write_flac(path, x, sr)
        got, got_sr = flac.read_flac(path, dtype="float32")
        assert got_sr == sr and got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)

    def test_noise_lossless_int(self, tmp_path):
        """White noise defeats the predictors -> exercises high Rice k /
        escape paths; int round trip must still be exact."""
        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32768, size=10_000, dtype=np.int64)
        path = str(tmp_path / "n.flac")
        flac.write_flac(path, pcm.astype(np.int16), 8000)
        got, _ = flac.read_flac(path, dtype="int16")
        np.testing.assert_array_equal(got.astype(np.int64), pcm)

    def test_constant_and_multiblock(self, tmp_path):
        """> 4096 samples spans multiple frames; constant tail takes the
        CONSTANT subframe path."""
        sr = 8000
        x = np.concatenate([_sine(1.0, 200.0, sr), np.zeros(5000)])
        path = str(tmp_path / "c.flac")
        flac.write_flac(path, x, sr)
        got, _ = flac.read_flac(path, dtype="float32")
        assert got.shape[0] == x.shape[0]
        np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)

    def test_24bit(self, tmp_path):
        sr = 48000
        x = _sine(0.2, 1000.0, sr)
        path = str(tmp_path / "b24.flac")
        flac.write_flac(path, x, sr, bits=24)
        got, _ = flac.read_flac(path, dtype="float32")
        np.testing.assert_allclose(got, x, atol=1.0 / (1 << 23))


class TestDecoderFeatures:
    def test_frame_number_utf8_multibyte(self, tmp_path):
        """>128 frames forces multi-byte UTF-8 frame numbers."""
        sr = 8000
        frames = 4096 * 130 + 17
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(frames) * 0.01).astype(np.float64)
        path = str(tmp_path / "long.flac")
        flac.write_flac(path, x, sr)
        got, _ = flac.read_flac(path, dtype="float32")
        assert got.shape[0] == frames

    def test_rejects_non_flac(self, tmp_path):
        path = str(tmp_path / "x.flac")
        with open(path, "wb") as f:
            f.write(b"RIFFxxxxWAVE")
        with pytest.raises(ValueError, match="Not a FLAC file"):
            flac.read_flac(path)


class TestIntegration:
    def test_load_audio_flac(self, tmp_path):
        sr = 16000
        x = _sine(1.0, 440.0, sr)
        path = str(tmp_path / "in.flac")
        flac.write_flac(path, x, sr)
        out = audio_io.load_audio(path, sr, 1)
        assert out.shape[0] == x.shape[0]
        np.testing.assert_allclose(out, x, atol=1.0 / 32768.0)

    def test_load_audio_flac_resampled(self, tmp_path):
        x = _sine(1.0, 440.0, 44100)
        path = str(tmp_path / "rs.flac")
        flac.write_flac(path, x, 44100)
        out = audio_io.load_audio(path, 16000, 1)
        assert abs(out.shape[0] - 16000) <= 1

    def test_unknown_format_error_names_codecs(self, tmp_path):
        path = str(tmp_path / "x.ogg")
        with open(path, "wb") as f:
            f.write(b"OggS" + b"\x00" * 64)
        with pytest.raises(ValueError, match="WAV, FLAC"):
            audio_io.sf_read(path)

    def test_score_on_flac_dirs(self, tmp_path):
        from frechet_audio_distance_exported_tpu import FrechetAudioDistance

        sr = 16000
        bg, ev = tmp_path / "bg", tmp_path / "ev"
        bg.mkdir(), ev.mkdir()
        for i in range(3):
            flac.write_flac(str(bg / f"{i}.flac"), _sine(1.5, 440.0 + 5 * i, sr), sr)
            flac.write_flac(str(ev / f"{i}.flac"), _sine(1.5, 880.0 + 5 * i, sr), sr)
        fad = FrechetAudioDistance(model_name="vggish", weights="random")
        score = fad.score(str(bg), str(ev))
        assert score != -1 and np.isfinite(score) and score > 0

    def test_flac_score_equals_wav_score(self, tmp_path):
        """16-bit FLAC is lossless: scoring the same PCM from .flac and .wav
        dirs must give identical results."""
        from frechet_audio_distance_exported_tpu import FrechetAudioDistance

        sr = 16000
        rng = np.random.default_rng(2)
        clips = [
            np.round(_sine(1.2, 440.0 + 60 * i, sr) * 32767.0) / 32768.0 for i in range(3)
        ]
        wav_bg, flac_bg = tmp_path / "wb", tmp_path / "fb"
        wav_bg.mkdir(), flac_bg.mkdir()
        for i, c in enumerate(clips):
            audio_io.write_wav(str(wav_bg / f"{i}.wav"), c, sr)
            flac.write_flac(str(flac_bg / f"{i}.flac"), c, sr)
        fad = FrechetAudioDistance(model_name="vggish", weights="random")
        # Explicit file order (os.listdir order is filesystem-dependent).
        wavs = [audio_io.load_audio(str(wav_bg / f"{i}.wav"), sr, 1) for i in range(3)]
        flacs = [audio_io.load_audio(str(flac_bg / f"{i}.flac"), sr, 1) for i in range(3)]
        a = fad.get_embeddings(wavs, sr)
        b = fad.get_embeddings(flacs, sr)
        np.testing.assert_array_equal(a, b)
