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


def _build_lpc_flac(x_pcm, sr, coefs, shift, precision=12):
    """Hand-assemble a single-frame FLAC whose subframe uses the LPC
    predictor (our encoder only emits FIXED, so this covers the LPC path)."""
    order = len(coefs)
    n = len(x_pcm)
    # Residuals per spec: res[i] = x[i] - (sum(c_j * x[i-1-j]) >> shift).
    res = []
    for i in range(order, n):
        acc = sum(int(coefs[j]) * int(x_pcm[i - 1 - j]) for j in range(order))
        res.append(int(x_pcm[i]) - (acc >> shift))

    si = flac._BitWriter()
    si.write(n, 16), si.write(n, 16), si.write(0, 48)
    si.write(sr, 20), si.write(0, 3), si.write(15, 5), si.write(n, 36), si.write(0, 128)
    body = si.getvalue()
    out = [flac.FLAC_MAGIC, bytes([0x80]) + len(body).to_bytes(3, "big") + body]

    hw = flac._BitWriter()
    hw.write(0x3FFE, 14), hw.write(0, 2)
    hw.write(7, 4), hw.write(0, 4), hw.write(0, 4), hw.write(4, 3), hw.write(0, 1)
    hw.write(0, 8)  # frame 0
    hw.write(n - 1, 16)
    header = hw.getvalue()
    header += bytes([flac._crc8(header)])

    fw = flac._BitWriter()
    fw.write(0, 1), fw.write(32 + order - 1, 6), fw.write(0, 1)
    for i in range(order):
        fw.write(int(x_pcm[i]), 16)
    fw.write(precision - 1, 4)
    fw.write(shift, 5)
    for c in coefs:
        fw.write(int(c), precision)
    fw.write(0, 2)  # RICE method
    fw.write(0, 4)  # partition order 0
    k = flac._rice_k(np.asarray(res))
    fw.write(k, 4)
    for v in res:
        z = (abs(v) << 1) - (1 if v < 0 else 0)
        fw.write_unary(z >> k)
        if k:
            fw.write(z, k)
    payload = fw.getvalue()
    frame = header + payload
    frame += int(flac._crc16(frame)).to_bytes(2, "big")
    out.append(frame)
    return b"".join(out)


class TestDecoderFeatures:
    def test_lpc_subframe(self, tmp_path):
        rng = np.random.default_rng(9)
        # A smooth signal so order-2 LPC residuals stay small.
        t = np.arange(600)
        x = np.round(3000 * np.sin(t * 0.05) + rng.integers(-3, 4, 600)).astype(np.int64)
        coefs, shift = [3, -2], 1  # predicts (3*x1 - 2*x2) >> 1
        blob = _build_lpc_flac(x, 16000, coefs, shift)
        path = str(tmp_path / "lpc.flac")
        with open(path, "wb") as f:
            f.write(blob)
        got, sr = flac.read_flac(path, dtype="int16")
        assert sr == 16000
        np.testing.assert_array_equal(got.astype(np.int64), x)

    def test_lpc_python_fallback_matches_native(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(10)
        t = np.arange(5000)
        x = np.round(8000 * np.sin(t * 0.01) + rng.integers(-5, 6, 5000)).astype(np.int64)
        blob = _build_lpc_flac(x, 8000, [2, -1], 0)
        path = str(tmp_path / "lpc2.flac")
        with open(path, "wb") as f:
            f.write(blob)
        a, _ = flac.read_flac(path, dtype="int16")

        from frechet_audio_distance_exported_tpu import native

        monkeypatch.setattr(native, "flac_rice_residuals", lambda *args: None)
        monkeypatch.setattr(native, "flac_reconstruct", lambda *a, **k: False)
        b, _ = flac.read_flac(path, dtype="int16")
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a.astype(np.int64), x)
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

    @pytest.mark.parametrize(
        "v", [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 2046, 2047, 2048, 0xFFFF, 0x10000,
              (1 << 21) - 1, 1 << 21, (1 << 36) - 1],
    )
    def test_utf8_coded_roundtrip_minimal(self, v):
        """Writer's UTF-8 coded numbers decode back AND are minimal (frame
        2047 must be 2 bytes: DF BF, not an overlong 3-byte form)."""
        enc = flac._utf8_coded(v)
        br = flac._BitReader(enc, 0)
        assert flac._read_utf8_coded(br) == v
        # Minimality: an n-byte sequence is justified only if v needs it.
        if len(enc) > 1:
            n = len(enc)
            assert v >= (1 << (5 * (n - 1) + 1)) if n > 2 else v >= 0x80

    def test_rejects_non_flac(self, tmp_path):
        path = str(tmp_path / "x.flac")
        with open(path, "wb") as f:
            f.write(b"RIFFxxxxWAVE")
        with pytest.raises(ValueError, match="Not a FLAC file"):
            flac.read_flac(path)

    def test_garbage_after_magic_raises_not_hangs(self, tmp_path):
        """Random bytes behind a valid magic must raise (ValueError/EOFError),
        never loop or crash — decoder robustness on corrupt files."""
        rng = np.random.default_rng(0)
        for trial in range(20):
            blob = flac.FLAC_MAGIC + bytes(rng.integers(0, 256, 512, dtype=np.uint8))
            path = str(tmp_path / f"g{trial}.flac")
            with open(path, "wb") as f:
                f.write(blob)
            with pytest.raises((ValueError, EOFError, IndexError, KeyError)):
                flac.read_flac(path)

    def test_truncated_valid_file_raises_or_returns_prefix(self, tmp_path):
        """Truncating a valid file mid-frame must not hang; partial decode or
        a clean error are both acceptable."""
        sr = 8000
        x = _sine(2.0, 300.0, sr)
        full = str(tmp_path / "full.flac")
        flac.write_flac(full, x, sr)
        blob = open(full, "rb").read()
        cut = str(tmp_path / "cut.flac")
        with open(cut, "wb") as f:
            f.write(blob[: len(blob) * 2 // 3])
        try:
            got, _ = flac.read_flac(cut)
            assert got.shape[0] <= x.shape[0]
        except (ValueError, EOFError):
            pass


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
        path = str(tmp_path / "x.bin")
        with open(path, "wb") as f:
            f.write(b"ZZZZ" + b"\x00" * 64)  # Ogg/MP3 now dispatch to real codecs
        with pytest.raises(ValueError, match="Unsupported audio format.*FLAC"):
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


class TestID3TaggedFlac:
    def test_id3v2_tagged_flac_decodes_as_flac(self, tmp_path):
        """ID3v2 tags are not MP3-specific — tagging tools prepend them to
        FLAC files, and libsndfile (the reference's decoder) skips the tag.
        sf_read must dispatch on what FOLLOWS the tag, not hand the file to
        the MP3 decoder (code-review r5)."""
        sr = 16000
        x = _sine(0.8, 523.0, sr)
        plain = str(tmp_path / "plain.flac")
        flac.write_flac(plain, x, sr)
        ref, sr_ref = audio_io.sf_read(plain)

        # Minimal ID3v2.3 tag: 10-byte header + 40-byte body (zero padding
        # is valid tag content), synchsafe size.
        body = bytes(40)
        size = len(body)
        header = b"ID3" + bytes([3, 0, 0]) + bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        tagged = str(tmp_path / "tagged.flac")
        with open(plain, "rb") as f:
            payload = f.read()
        with open(tagged, "wb") as f:
            f.write(header + body + payload)

        got, sr_got = audio_io.sf_read(tagged)
        assert sr_got == sr_ref
        np.testing.assert_array_equal(got, ref)

    def test_id3v2_footer_flag_accounted(self, tmp_path):
        sr = 16000
        x = _sine(0.5, 700.0, sr)
        plain = str(tmp_path / "p.flac")
        flac.write_flac(plain, x, sr)
        ref, _ = audio_io.sf_read(plain)
        body = bytes(16)
        # Footer-present flag (0x10): tag occupies 10 + size + 10 bytes.
        header = b"ID3" + bytes([4, 0, 0x10, 0, 0, 0, len(body)])
        with open(plain, "rb") as f:
            payload = f.read()
        tagged = str(tmp_path / "t.flac")
        with open(tagged, "wb") as f:
            f.write(header + body + bytes(10) + payload)
        got, _ = audio_io.sf_read(tagged)
        np.testing.assert_array_equal(got, ref)
