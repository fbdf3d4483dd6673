"""RF64/BW64, Sony Wave64, and Apple CAF container tests.

The reference reads these through soundfile/libsndfile (reference:
fad.py:145); here they are pure-Python codecs (utils/wav64.py, utils/caf.py)
validated by round-trip against their own minimal writers plus hand-built
edge-case structures.
"""

import struct

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io, caf, g711, wav64


def _sine(sr, seconds, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _pcm16_grid(x):
    return np.round(np.asarray(x, np.float64) * 32768.0).clip(-32768, 32767) / 32768.0


class TestRf64:
    def test_roundtrip_mono(self, tmp_path):
        sr, x = 16000, _pcm16_grid(_sine(16000, 0.5))
        path = str(tmp_path / "tone.rf64")
        wav64.write_rf64(path, x, sr)
        y, got_sr = wav64.read_rf64(path)
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=0)  # PCM16 exact

    def test_roundtrip_stereo_and_dispatch(self, tmp_path):
        sr = 22050
        x = np.stack([_pcm16_grid(_sine(sr, 0.3)), _pcm16_grid(_sine(sr, 0.3, 660.0))], 1)
        path = str(tmp_path / "stereo.rf64")
        wav64.write_rf64(path, x, sr)
        y, got_sr = audio_io.sf_read(path)  # magic sniff: RF64
        assert got_sr == sr and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=0)

    def test_bw64_magic_accepted(self, tmp_path):
        sr, x = 8000, _pcm16_grid(_sine(8000, 0.2))
        path = str(tmp_path / "tone.bw64")
        wav64.write_rf64(path, x, sr)
        with open(path, "r+b") as f:
            f.write(b"BW64")  # ADM BW64 shares the RF64 layout
        y, got_sr = audio_io.sf_read(path)
        assert got_sr == sr and len(y) == len(x)

    def test_data_before_ds64_rejected(self, tmp_path):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        raw = b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        raw += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        raw += b"data" + struct.pack("<I", 0xFFFFFFFF) + b"\x00\x00"
        path = str(tmp_path / "bad.rf64")
        with open(path, "wb") as f:
            f.write(raw)
        with pytest.raises(ValueError, match="ds64"):
            wav64.read_rf64(path)


class TestW64:
    def test_roundtrip_mono(self, tmp_path):
        sr, x = 16000, _pcm16_grid(_sine(16000, 0.5))
        path = str(tmp_path / "tone.w64")
        wav64.write_w64(path, x, sr)
        y, got_sr = wav64.read_w64(path)
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=0)

    def test_dispatch_and_stereo(self, tmp_path):
        sr = 44100
        x = np.stack([_pcm16_grid(_sine(sr, 0.2)), _pcm16_grid(_sine(sr, 0.2, 550.0))], 1)
        path = str(tmp_path / "stereo.w64")
        wav64.write_w64(path, x, sr)
        y, got_sr = audio_io.sf_read(path)  # GUID fourcc sniff: riff
        assert got_sr == sr and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=0)

    def test_odd_length_payload_alignment(self, tmp_path):
        # 3 samples -> 6-byte data body; the next chunk must 8-align.
        sr = 8000
        x = _pcm16_grid(np.array([0.1, -0.2, 0.3], np.float32))
        path = str(tmp_path / "odd.w64")
        wav64.write_w64(path, x, sr)
        y, got_sr = wav64.read_w64(path)
        assert got_sr == sr and len(y) == 3
        np.testing.assert_allclose(y, x, atol=0)

    def test_garbage_rejected(self, tmp_path):
        path = str(tmp_path / "junk.w64")
        with open(path, "wb") as f:
            f.write(wav64.W64_RIFF_GUID[:8] + b"\x00" * 64)
        with pytest.raises(ValueError):
            wav64.read_w64(path)


class TestCaf:
    def test_roundtrip_be_pcm16(self, tmp_path):
        sr, x = 16000, _pcm16_grid(_sine(16000, 0.5))
        path = str(tmp_path / "tone.caf")
        caf.write_caf(path, x, sr)
        y, got_sr = audio_io.sf_read(path)  # magic sniff: caff
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=0)

    def test_float32_le_payload(self, tmp_path):
        sr, x = 22050, _sine(22050, 0.25)
        desc = struct.pack(">d4sIIIII", float(sr), b"lpcm", 0b11, 4, 1, 1, 32)
        payload = struct.pack(">I", 0) + x.astype("<f4").tobytes()
        raw = caf.CAF_MAGIC + struct.pack(">HH", 1, 0)
        raw += b"desc" + struct.pack(">q", len(desc)) + desc
        raw += b"data" + struct.pack(">q", len(payload)) + payload
        path = str(tmp_path / "f32.caf")
        with open(path, "wb") as f:
            f.write(raw)
        y, got_sr = caf.read_caf(path)
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=0)

    def test_unbounded_data_chunk(self, tmp_path):
        # The CAF spec allows the final data chunk to declare size -1.
        sr, x = 8000, _pcm16_grid(_sine(8000, 0.1))
        desc = struct.pack(">d4sIIIII", float(sr), b"lpcm", 0, 2, 1, 1, 16)
        raw = caf.CAF_MAGIC + struct.pack(">HH", 1, 0)
        raw += b"desc" + struct.pack(">q", len(desc)) + desc
        raw += b"data" + struct.pack(">q", -1) + struct.pack(">I", 0)
        raw += (np.asarray(x) * 32768.0).round().astype(">i2").tobytes()
        path = str(tmp_path / "eof.caf")
        with open(path, "wb") as f:
            f.write(raw)
        y, got_sr = caf.read_caf(path)
        assert got_sr == sr and len(y) == len(x)
        np.testing.assert_allclose(y, x, atol=0)

    def test_ulaw_payload(self, tmp_path):
        sr = 8000
        pcm = (_sine(sr, 0.1) * 32767).astype(np.int16)
        mu = g711.ulaw_encode(pcm)
        desc = struct.pack(">d4sIIIII", float(sr), b"ulaw", 0, 1, 1, 1, 8)
        payload = struct.pack(">I", 0) + mu.tobytes()
        raw = caf.CAF_MAGIC + struct.pack(">HH", 1, 0)
        raw += b"desc" + struct.pack(">q", len(desc)) + desc
        raw += b"data" + struct.pack(">q", len(payload)) + payload
        path = str(tmp_path / "mu.caf")
        with open(path, "wb") as f:
            f.write(raw)
        y, got_sr = caf.read_caf(path)
        assert got_sr == sr and len(y) == len(pcm)
        ref = g711.ulaw_decode(mu).astype(np.float32) / 32768.0
        np.testing.assert_allclose(y, ref, atol=0)

    def test_negative_chunk_size_rejected(self, tmp_path):
        # A negative non--1 chunk size must raise, not stall the chunk walk.
        raw = caf.CAF_MAGIC + struct.pack(">HH", 1, 0)
        raw += b"free" + struct.pack(">q", -12) + b"\x00" * 16
        path = str(tmp_path / "neg.caf")
        with open(path, "wb") as f:
            f.write(raw)
        with pytest.raises(ValueError, match="chunk size"):
            caf.read_caf(path)

    def test_unknown_codec_rejected(self, tmp_path):
        desc = struct.pack(">d4sIIIII", 44100.0, b"aac ", 0, 0, 0, 2, 0)
        raw = caf.CAF_MAGIC + struct.pack(">HH", 1, 0)
        raw += b"desc" + struct.pack(">q", len(desc)) + desc
        raw += b"data" + struct.pack(">q", 4) + struct.pack(">I", 0)
        path = str(tmp_path / "aac.caf")
        with open(path, "wb") as f:
            f.write(raw)
        with pytest.raises(ValueError, match="aac"):
            caf.read_caf(path)
