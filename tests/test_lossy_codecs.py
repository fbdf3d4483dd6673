"""Ogg Vorbis / MP3 / Ogg Opus codec tests (system-library backed).

The reference reads these formats through soundfile/libsndfile
(reference: fad.py:145). Each class skips cleanly when the matching
system library is absent, mirroring the reference's skip-if-no-model
fixture pattern (reference: tests/test_encodec.py:274-279).
"""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io
from frechet_audio_distance_exported_tpu.utils import mp3 as mp3mod
from frechet_audio_distance_exported_tpu.utils import opusogg
from frechet_audio_distance_exported_tpu.utils import vorbis as vorbismod


def _sine(sr, seconds, freq=440.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _snr_db(reference, decoded):
    m = min(len(reference), len(decoded))
    err = decoded[:m] - reference[:m]
    return 10.0 * np.log10(np.mean(reference[:m] ** 2) / max(np.mean(err**2), 1e-20))


needs_vorbis = pytest.mark.skipif(
    not (vorbismod.have_vorbis() and vorbismod.have_vorbis_encoder()),
    reason="system libvorbis/libvorbisenc not available",
)
needs_mp3 = pytest.mark.skipif(
    not (mp3mod.have_mp3() and mp3mod.have_mp3_encoder()),
    reason="system libmpg123/libmp3lame not available",
)
needs_opus = pytest.mark.skipif(
    not opusogg.have_opus_encoder(), reason="system libopus/libogg not available"
)


@needs_vorbis
class TestVorbis:
    def test_roundtrip_mono_exact_length_and_snr(self, tmp_path):
        sr, x = 22050, _sine(22050, 1.0)
        path = str(tmp_path / "tone.ogg")
        vorbismod.write_ogg_vorbis(path, x, sr, quality=0.8)
        y, got_sr = vorbismod.read_ogg_vorbis(path)
        assert got_sr == sr
        assert y.shape == x.shape  # Vorbis granulepos is sample-exact
        assert _snr_db(x, y) > 30.0

    def test_roundtrip_stereo(self, tmp_path):
        sr = 16000
        left, right = _sine(sr, 0.5, 440.0), _sine(sr, 0.5, 660.0)
        x = np.stack([left, right], axis=1)
        path = str(tmp_path / "stereo.ogg")
        vorbismod.write_ogg_vorbis(path, x, sr, quality=0.8)
        y, got_sr = vorbismod.read_ogg_vorbis(path)
        assert got_sr == sr and y.shape == x.shape
        assert _snr_db(left, y[:, 0]) > 25.0
        assert _snr_db(right, y[:, 1]) > 25.0

    def test_sf_read_dispatch_and_int16(self, tmp_path):
        sr, x = 8000, _sine(8000, 0.25)
        path = str(tmp_path / "tone.ogg")
        vorbismod.write_ogg_vorbis(path, x, sr)
        y, got_sr = audio_io.sf_read(path)
        assert got_sr == sr and y.dtype == np.float32
        y16, _ = audio_io.sf_read(path, dtype="int16")
        assert y16.dtype == np.int16
        assert _snr_db(x, y16.astype(np.float32) / 32768.0) > 15.0

    def test_load_audio_resamples(self, tmp_path):
        sr, x = 22050, _sine(22050, 0.5)
        path = str(tmp_path / "tone.ogg")
        vorbismod.write_ogg_vorbis(path, x, sr)
        out = audio_io.load_audio(path, sample_rate=16000, channels=1)
        assert abs(len(out) - 8000) <= 2

    def test_garbage_rejected(self, tmp_path):
        path = str(tmp_path / "junk.ogg")
        with open(path, "wb") as f:
            f.write(b"OggS" + b"\x00" * 100)
        with pytest.raises(ValueError):
            audio_io.sf_read(path)

    def test_pygame_sample_file_if_present(self):
        path = (
            "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
        )
        import os

        if not os.path.exists(path):
            pytest.skip("pygame sample file not present")
        y, sr = audio_io.sf_read(path)
        assert sr > 0 and len(y) > 0 and np.isfinite(y).all()


@needs_mp3
class TestMp3:
    def test_roundtrip_gapless_mono(self, tmp_path):
        sr, x = 22050, _sine(22050, 1.0)
        path = str(tmp_path / "tone.mp3")
        mp3mod.write_mp3(path, x, sr)
        y, got_sr = mp3mod.read_mp3(path)
        assert got_sr == sr
        # The LAME info tag makes mpg123 trim delay+padding exactly.
        assert y.shape == x.shape
        assert _snr_db(x, y) > 18.0

    def test_roundtrip_stereo(self, tmp_path):
        sr = 44100
        x = np.stack([_sine(sr, 0.5, 440.0), _sine(sr, 0.5, 660.0)], axis=1)
        path = str(tmp_path / "stereo.mp3")
        mp3mod.write_mp3(path, x, sr)
        y, got_sr = mp3mod.read_mp3(path)
        assert got_sr == sr and y.shape == x.shape
        assert _snr_db(x[:, 0], y[:, 0]) > 15.0

    def test_sf_read_dispatch_by_sync_and_id3(self, tmp_path):
        sr, x = 22050, _sine(22050, 0.25)
        bare = str(tmp_path / "tone.mp3")
        mp3mod.write_mp3(bare, x, sr)
        y, got_sr = audio_io.sf_read(bare)  # frame-sync sniff (0xFFEx)
        assert got_sr == sr and len(y) == len(x)
        tagged = str(tmp_path / "tagged.mp3")
        with open(bare, "rb") as f:
            payload = f.read()
        id3 = b"ID3\x04\x00\x00\x00\x00\x00\x00"  # empty ID3v2.4 header
        with open(tagged, "wb") as f:
            f.write(id3 + payload)
        y2, got_sr2 = audio_io.sf_read(tagged)  # ID3 sniff
        assert got_sr2 == sr and len(y2) == len(x)

    def test_mid_stream_format_change_rejected(self, tmp_path):
        # "Frankenstein" concatenated streams with different rates must
        # raise, not silently decode misinterleaved audio at the wrong rate.
        a, b = str(tmp_path / "a.mp3"), str(tmp_path / "b.mp3")
        mp3mod.write_mp3(a, _sine(22050, 0.3), 22050)
        mp3mod.write_mp3(
            b, np.stack([_sine(44100, 0.3), _sine(44100, 0.3, 660.0)], 1), 44100
        )
        frank = str(tmp_path / "frank.mp3")
        with open(frank, "wb") as f:
            with open(a, "rb") as fa, open(b, "rb") as fb:
                f.write(fa.read() + fb.read())
        with pytest.raises(ValueError, match="format mid-file"):
            mp3mod.read_mp3(frank)

    def test_load_audio_mono_mix(self, tmp_path):
        sr = 22050
        x = np.stack([_sine(sr, 0.5, 440.0), _sine(sr, 0.5, 440.0)], axis=1)
        path = str(tmp_path / "stereo.mp3")
        mp3mod.write_mp3(path, x, sr)
        out = audio_io.load_audio(path, sample_rate=sr, channels=1)
        assert out.ndim == 1 and _snr_db(x[:, 0], out) > 15.0


def _mux_ogg(path, packets, granules=None):
    """Author a real Ogg file from raw packets via libogg (tests only)."""
    import ctypes

    from frechet_audio_distance_exported_tpu.utils.vorbis import (
        OggPacket,
        OggPage,
        _ogg,
    )

    ogg = _ogg()
    stream = ctypes.create_string_buffer(4096)
    ogg.ogg_stream_init(stream, 0xF1AC)
    out = bytearray()
    page = OggPage()
    try:
        for i, payload in enumerate(packets):
            buf = (ctypes.c_ubyte * max(len(payload), 1)).from_buffer_copy(
                payload or b"\x00"
            )
            op = OggPacket(
                packet=ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte)),
                bytes=len(payload),
                b_o_s=1 if i == 0 else 0,
                e_o_s=1 if i == len(packets) - 1 else 0,
                granulepos=0 if granules is None else granules[i],
                packetno=i,
            )
            ogg.ogg_stream_packetin(stream, ctypes.byref(op))
            fn = ogg.ogg_stream_flush if i == 0 else ogg.ogg_stream_pageout
            while fn(stream, ctypes.byref(page)):
                out += ctypes.string_at(page.header, page.header_len)
                out += ctypes.string_at(page.body, page.body_len)
        while ogg.ogg_stream_flush(stream, ctypes.byref(page)):
            out += ctypes.string_at(page.header, page.header_len)
            out += ctypes.string_at(page.body, page.body_len)
    finally:
        ogg.ogg_stream_clear(stream)
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.mark.skipif(
    not vorbismod.have_vorbis_encoder(), reason="libogg not available for muxing"
)
class TestOggFlac:
    def _make_ogg_flac(self, tmp_path, x, sr):
        import struct as _struct

        from frechet_audio_distance_exported_tpu.utils import flac as flacmod

        native = str(tmp_path / "native.flac")
        flacmod.write_flac(native, x, sr)
        with open(native, "rb") as f:
            raw = f.read()
        # Walk metadata blocks to find where frames start (write_flac puts
        # STREAMINFO first).
        pos = 4
        while True:
            last, size = raw[pos] >> 7, int.from_bytes(raw[pos + 1 : pos + 4], "big")
            pos += 4 + size
            if last:
                break
        first = b"\x7fFLAC\x01\x00" + _struct.pack(">H", 0) + raw[: 4 + 4 + 34]
        frames = raw[pos:]
        # Arbitrary packet splits exercise cross-packet frame reassembly.
        audio_packets = [frames[i : i + 777] for i in range(0, len(frames), 777)]
        path = str(tmp_path / "stream.oga")
        _mux_ogg(path, [first] + audio_packets)
        return path

    def test_ogg_flac_roundtrip_lossless(self, tmp_path):
        sr = 16000
        x = np.round(_sine(sr, 0.7) * 32767.0) / 32768.0
        path = self._make_ogg_flac(tmp_path, x, sr)
        y, got_sr = audio_io.sf_read(path)  # OggS + 0x7fFLAC sniff
        assert got_sr == sr and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=0)  # FLAC is lossless

    def test_ogg_flac_stereo(self, tmp_path):
        sr = 22050
        x = np.stack(
            [
                np.round(_sine(sr, 0.4) * 32767.0) / 32768.0,
                np.round(_sine(sr, 0.4, 660.0) * 32767.0) / 32768.0,
            ],
            axis=1,
        )
        path = self._make_ogg_flac(tmp_path, x, sr)
        y, got_sr = audio_io.sf_read(path)
        assert got_sr == sr and y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=0)


@needs_vorbis
@needs_mp3
class TestScoreOnLossyDirs:
    def test_score_mixed_lossy_dir(self, tmp_path):
        """score() over a directory mixing .ogg and .mp3 files end to end
        (reference behavior: any soundfile-readable dir works, fad.py:145)."""
        from frechet_audio_distance_exported_tpu import FrechetAudioDistance

        sr = 16000
        bg, ev = tmp_path / "bg", tmp_path / "ev"
        bg.mkdir(), ev.mkdir()
        for i in range(2):
            audio_io.write_wav(str(bg / f"{i}.wav"), _sine(sr, 1.5, 440.0 + 5 * i), sr)
        vorbismod.write_ogg_vorbis(str(ev / "a.ogg"), _sine(sr, 1.5, 880.0), sr)
        mp3mod.write_mp3(str(ev / "b.mp3"), _sine(sr, 1.5, 885.0), sr)
        fad = FrechetAudioDistance(model_name="vggish", weights="random")
        score = fad.score(str(bg), str(ev))
        assert score != -1 and np.isfinite(score) and score > 0


@needs_opus
class TestOpus:
    def test_roundtrip_mono_exact_length(self, tmp_path):
        sr, x = 48000, _sine(48000, 1.0)
        path = str(tmp_path / "tone.opus")
        opusogg.write_ogg_opus(path, x, sr)
        y, got_sr = opusogg.read_ogg_opus(path)
        assert got_sr == 48000
        assert y.shape == x.shape  # pre-skip + final-granule trimming
        assert _snr_db(x, y) > 15.0

    def test_roundtrip_stereo_16k_input(self, tmp_path):
        sr = 16000
        x = np.stack([_sine(sr, 0.5, 440.0), _sine(sr, 0.5, 330.0)], axis=1)
        path = str(tmp_path / "stereo.opus")
        opusogg.write_ogg_opus(path, x, sr)
        y, got_sr = opusogg.read_ogg_opus(path)
        assert got_sr == 48000  # Opus always decodes at 48 kHz
        assert y.shape == (len(x) * 3, 2)  # 16 kHz input → 3x samples at 48 kHz
        ref = np.repeat(x[:, 0], 3)  # crude hold-upsample for correlation only
        c = np.corrcoef(ref[2000:20000], y[2000:20000, 0])[0, 1]
        assert c > 0.9

    def test_sf_read_dispatch(self, tmp_path):
        sr, x = 48000, _sine(48000, 0.25)
        path = str(tmp_path / "tone.opus")
        opusogg.write_ogg_opus(path, x, sr)
        y, got_sr = audio_io.sf_read(path)
        assert got_sr == 48000 and y.shape == x.shape

    def test_ogg_demux_packet_reassembly(self, tmp_path):
        # A >64 KiB packet must span pages (255-lacing continuation rule);
        # exercise the demuxer against libogg's muxer via the Vorbis path.
        sr, x = 48000, _sine(48000, 2.0)
        path = str(tmp_path / "long.opus")
        opusogg.write_ogg_opus(path, x, sr)
        with open(path, "rb") as f:
            raw = f.read()
        packets, final_granule = opusogg.ogg_packets(raw)
        assert packets[0][:8] == b"OpusHead"
        assert packets[1][:8] == b"OpusTags"
        assert len(packets) > 50  # 20 ms frames over 2 s
        assert final_granule > len(x)  # includes pre-skip

    def test_corrupt_packet_conceals_without_timeline_shift(self, tmp_path):
        # A corrupt audio packet must be concealed (PLC), not dropped —
        # dropping would shift the timeline and break the granule trim.
        sr, x = 48000, _sine(48000, 1.0)
        path = str(tmp_path / "tone.opus")
        opusogg.write_ogg_opus(path, x, sr)
        with open(path, "rb") as f:
            raw = f.read()
        packets, final_granule = opusogg.ogg_packets(raw)
        mid = 2 + (len(packets) - 2) // 2
        packets[mid] = b""  # undecodable packet
        granules = [0] * len(packets)
        granules[-1] = final_granule
        broken = str(tmp_path / "broken.opus")
        _mux_ogg(broken, packets, granules)
        y, got_sr = opusogg.read_ogg_opus(broken)
        assert got_sr == 48000
        assert y.shape == x.shape  # length preserved through concealment

    def test_multistream_family_rejected(self, tmp_path):
        head = b"OpusHead" + bytes([1, 6]) + b"\x00\x00" + b"\x80\xbb\x00\x00" + b"\x00\x00" + bytes([1])
        with pytest.raises(ValueError, match="family"):
            opusogg._parse_opus_head(head, "synthetic")
