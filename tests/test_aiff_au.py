"""AIFF/AIFC and AU (Sun) codec tests: round trips for every supported
subtype, G.711 companding laws, and integration with load_audio (the
reference accepts these containers via libsndfile, reference: fad.py:145)."""

import struct

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io
from frechet_audio_distance_exported_tpu.utils import g711
from frechet_audio_distance_exported_tpu.utils.aiff import read_aiff, write_aiff
from frechet_audio_distance_exported_tpu.utils.au import read_au, write_au


def _sine(dur, freq, sr, amp=0.5):
    t = np.linspace(0, dur, int(sr * dur), dtype=np.float64)
    return np.sin(2 * np.pi * freq * t) * amp


class TestG711:
    def test_ulaw_roundtrip_all_codes(self):
        """Every mu-law byte decodes and re-encodes to itself (the decode
        values are exact quantizer reconstruction levels)."""
        codes = np.arange(256, dtype=np.uint8)
        pcm = g711.ulaw_decode(codes)
        assert pcm.dtype == np.int16
        assert pcm.max() == 32124 and pcm.min() == -32124
        back = g711.ulaw_encode(pcm)
        # 0x7F is mu-law's "-0": it decodes to 0, which re-encodes to the
        # canonical +0 code 0xFF. Every other code round-trips exactly.
        keep = codes != 0x7F
        np.testing.assert_array_equal(back[keep], codes[keep])
        assert back[0x7F] == 0xFF

    def test_alaw_roundtrip_all_codes(self):
        codes = np.arange(256, dtype=np.uint8)
        pcm = g711.alaw_decode(codes)
        assert pcm.dtype == np.int16
        assert pcm.max() == 32256 and pcm.min() == -32256
        back = g711.alaw_encode(pcm)
        np.testing.assert_array_equal(back, codes)

    def test_ulaw_quantization_error_bound(self):
        rng = np.random.default_rng(0)
        pcm = rng.integers(-32768, 32768, size=20_000).astype(np.int16)
        rec = g711.ulaw_decode(g711.ulaw_encode(pcm)).astype(np.int32)
        # mu-law step size is ~1/16 of the magnitude (segment-log spacing).
        err = np.abs(rec - pcm.astype(np.int32))
        bound = np.maximum(np.abs(pcm.astype(np.int32)) / 14.0, 40.0)
        assert np.all(err <= bound)

    def test_alaw_quantization_error_bound(self):
        rng = np.random.default_rng(1)
        pcm = rng.integers(-32768, 32768, size=20_000).astype(np.int16)
        rec = g711.alaw_decode(g711.alaw_encode(pcm)).astype(np.int32)
        err = np.abs(rec - pcm.astype(np.int32))
        bound = np.maximum(np.abs(pcm.astype(np.int32)) / 14.0, 40.0)
        assert np.all(err <= bound)


class TestAIFF:
    @pytest.mark.parametrize("subtype,atol", [
        ("pcm16", 1.0 / 32768.0),
        ("sowt", 1.0 / 32768.0),
        ("float32", 1e-7),
        ("ulaw", 0.02),
    ])
    def test_mono_roundtrip(self, tmp_path, subtype, atol):
        sr = 16000
        x = _sine(0.5, 440.0, sr).astype(np.float32)
        path = str(tmp_path / f"a_{subtype}.aiff")
        write_aiff(path, x, sr, subtype=subtype)
        got, got_sr = read_aiff(path, dtype="float32")
        assert got_sr == sr and got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=atol)

    def test_stereo_roundtrip(self, tmp_path):
        sr = 44100
        x = np.stack([_sine(0.3, 440.0, sr), _sine(0.3, 523.0, sr)], axis=1)
        path = str(tmp_path / "s.aiff")
        write_aiff(path, x, sr, subtype="pcm16")
        got, got_sr = read_aiff(path, dtype="float32")
        assert got_sr == sr and got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)

    def test_extended80_sample_rates(self, tmp_path):
        """The COMM sample rate field is an 80-bit extended float; every
        common rate must round-trip exactly."""
        for sr in (8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000, 96000):
            path = str(tmp_path / f"r{sr}.aiff")
            write_aiff(path, np.zeros(64, np.float32), sr)
            _, got_sr = read_aiff(path)
            assert got_sr == sr

    def test_int16_dtype_read(self, tmp_path):
        sr = 8000
        pcm = np.array([0, 1000, -1000, 32767, -32768], np.int16)
        path = str(tmp_path / "i.aiff")
        write_aiff(path, pcm.astype(np.float64) / 32768.0, sr)
        got, _ = read_aiff(path, dtype="int16")
        np.testing.assert_array_equal(got, pcm)

    def test_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.aiff")
        with open(path, "wb") as f:
            f.write(b"FORMxxxxJUNK" + b"\x00" * 32)
        with pytest.raises(ValueError):
            read_aiff(path)

    def test_rejects_unknown_compression(self, tmp_path):
        sr = 8000
        path = str(tmp_path / "c.aiff")
        write_aiff(path, np.zeros(64, np.float32), sr, subtype="ulaw")
        with open(path, "rb") as f:
            raw = bytearray(f.read())
        idx = raw.find(b"ulaw")
        raw[idx : idx + 4] = b"ima4"  # an unsupported ADPCM type
        with open(path, "wb") as f:
            f.write(raw)
        with pytest.raises(ValueError, match="compression"):
            read_aiff(path)


class TestAU:
    @pytest.mark.parametrize("subtype,atol", [
        ("pcm16", 1.0 / 32768.0),
        ("float32", 1e-7),
        ("ulaw", 0.02),
        ("alaw", 0.02),
    ])
    def test_mono_roundtrip(self, tmp_path, subtype, atol):
        sr = 8000
        x = _sine(0.5, 440.0, sr).astype(np.float32)
        path = str(tmp_path / f"a_{subtype}.au")
        write_au(path, x, sr, subtype=subtype)
        got, got_sr = read_au(path, dtype="float32")
        assert got_sr == sr and got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=atol)

    def test_stereo_roundtrip(self, tmp_path):
        sr = 16000
        x = np.stack([_sine(0.3, 440.0, sr), _sine(0.3, 523.0, sr)], axis=1)
        path = str(tmp_path / "s.au")
        write_au(path, x, sr)
        got, got_sr = read_au(path, dtype="float32")
        assert got_sr == sr and got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)

    def test_unknown_data_size_sentinel(self, tmp_path):
        """size = 0xFFFFFFFF means 'read to EOF' (streamed AU files)."""
        sr = 8000
        x = _sine(0.25, 300.0, sr).astype(np.float32)
        path = str(tmp_path / "u.au")
        write_au(path, x, sr, subtype="pcm16")
        with open(path, "rb") as f:
            raw = bytearray(f.read())
        struct.pack_into(">I", raw, 8, 0xFFFFFFFF)
        with open(path, "wb") as f:
            f.write(raw)
        got, _ = read_au(path, dtype="float32")
        assert got.shape == x.shape
        np.testing.assert_allclose(got, x, atol=1.0 / 32768.0)

    def test_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.au")
        with open(path, "wb") as f:
            f.write(b"nope" + b"\x00" * 32)
        with pytest.raises(ValueError):
            read_au(path)

    def test_rejects_unknown_encoding(self, tmp_path):
        path = str(tmp_path / "enc.au")
        with open(path, "wb") as f:
            f.write(b".snd" + struct.pack(">5I", 24, 4, 23, 8000, 1) + b"\x00" * 4)
        with pytest.raises(ValueError, match="encoding"):
            read_au(path)


class TestIntegration:
    def test_load_audio_sniffs_aiff_and_au(self, tmp_path):
        """sf_read magic-byte dispatch: the same sine through WAV, AIFF and
        AU decodes to the same waveform via the public load_audio."""
        sr = 16000
        x = _sine(0.5, 440.0, sr).astype(np.float32)
        paths = {
            "wav": str(tmp_path / "x.wav"),
            "aiff": str(tmp_path / "x.aiff"),
            "au": str(tmp_path / "x.au"),
        }
        audio_io.write_wav(paths["wav"], x, sr)
        write_aiff(paths["aiff"], x, sr)
        write_au(paths["au"], x, sr)
        ref = audio_io.load_audio(paths["wav"], sr, 1)
        for kind in ("aiff", "au"):
            got = audio_io.load_audio(paths[kind], sr, 1)
            np.testing.assert_array_equal(got, ref)

    def test_error_message_names_builtin_codecs(self, tmp_path):
        path = str(tmp_path / "x.xyz")
        with open(path, "wb") as f:
            f.write(b"\x01\x02\x03\x04junk")
        with pytest.raises(ValueError, match="AIFF"):
            audio_io.sf_read(path)

    def test_score_on_mixed_format_dirs(self, tmp_path):
        """End-to-end: a directory mixing WAV/FLAC/AIFF/AU scores identically
        to the same audio as all-WAV."""
        from frechet_audio_distance_exported_tpu import FrechetAudioDistance
        from frechet_audio_distance_exported_tpu.utils.flac import write_flac

        sr = 16000
        rng = np.random.default_rng(7)
        clips = [
            (_sine(1.2, f, sr) + 0.01 * rng.standard_normal(int(sr * 1.2))).astype(np.float32)
            for f in (440.0, 550.0, 660.0, 770.0)
        ]
        # Quantize to the PCM16 grid so every codec is bit-exact.
        clips = [np.round(c * 32767.0) / 32768.0 for c in clips]

        mixed_bg = tmp_path / "mixed_bg"
        wav_bg = tmp_path / "wav_bg"
        ev = tmp_path / "ev"
        for d in (mixed_bg, wav_bg, ev):
            d.mkdir()
        writers = [
            lambda p, x: audio_io.write_wav(p + ".wav", x, sr),
            lambda p, x: write_flac(p + ".flac", x, sr),
            lambda p, x: write_aiff(p + ".aiff", x, sr),
            lambda p, x: write_au(p + ".au", x, sr),
        ]
        for i, c in enumerate(clips):
            writers[i % 4](str(mixed_bg / f"c{i}"), c)
            audio_io.write_wav(str(wav_bg / f"c{i}.wav"), c, sr)
            audio_io.write_wav(str(ev / f"e{i}.wav"), c[::-1].copy(), sr)

        fad = FrechetAudioDistance(model_name="vggish", weights="random")
        s_mixed = fad.score(str(mixed_bg), str(ev))
        s_wav = fad.score(str(wav_bg), str(ev))
        assert s_mixed != -1
        np.testing.assert_allclose(s_mixed, s_wav, rtol=0, atol=0)
