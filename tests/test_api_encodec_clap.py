"""End-to-end API tests for the Encodec and CLAP families (random weights).

Mirrors the reference's model-dependent integration tier
(tests/test_encodec.py:274-309, tests/test_clap.py:189-240) but hermetic:
random-weight models stand in for the artifacts, which exercises the full
pipeline semantics (row counts, trimming, masking, error paths)."""

import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav


def _write_sine_dir(path, freqs, duration, sr):
    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(freqs):
        t = np.linspace(0, duration, int(sr * duration), dtype=np.float32)
        write_wav(os.path.join(path, f"{i}.wav"), (np.sin(2 * np.pi * f * t) * 0.5), sr)


class TestEncodec24k:
    @pytest.fixture(scope="class")
    def fad(self):
        return FrechetAudioDistance(model_name="encodec-24k", weights="random")

    def test_frame_count_is_samples_over_320(self, fad, sine_audio):
        out = fad._get_embedding_for_audio(sine_audio(1.0, 440.0, 24000))
        assert out.shape == (24000 // 320, 128)  # 75 frames

    def test_score_and_identical(self, fad, tmp_path_factory):
        bg = str(tmp_path_factory.mktemp("bg"))
        ev = str(tmp_path_factory.mktemp("ev"))
        _write_sine_dir(bg, [440, 450], 1.0, 24000)
        _write_sine_dir(ev, [880, 890], 1.0, 24000)
        s = fad.score(bg, ev)
        assert np.isfinite(s) and s > 0
        assert abs(fad.score(bg, bg)) < 1e-3

    def test_too_long_skipped_in_batch_raises_single(self, fad, sine_audio):
        long = sine_audio(10.5, 440.0, 24000)
        ok = sine_audio(1.0, 440.0, 24000)
        out = fad.get_embeddings([long, ok], 24000)
        assert out.shape == (75, 128)  # long file skipped silently
        with pytest.raises(ValueError, match="Audio too long"):
            fad._get_embedding_for_audio(long)

    def test_trim_uses_original_length(self, fad, sine_audio):
        """Frames are trimmed to the pre-pad length (reference fad.py:341-344)."""
        out = fad._get_embedding_for_audio(sine_audio(2.5, 440.0, 24000))
        assert out.shape == (int(24000 * 2.5) // 320, 128)

    def test_batching_invariance(self, fad, sine_audio):
        a, b = sine_audio(1.0, 440.0, 24000), sine_audio(2.0, 660.0, 24000)
        joint = fad.get_embeddings([a, b], 24000)
        solo = np.concatenate(
            [fad.get_embeddings([a], 24000), fad.get_embeddings([b], 24000)], axis=0
        )
        np.testing.assert_allclose(joint, solo, rtol=1e-4, atol=1e-5)


class TestEncodec48kStereo:
    def test_stereo_channels_and_frames(self, sine_audio):
        fad = FrechetAudioDistance(model_name="encodec-48k", weights="random", channels=1)
        out = fad._get_embedding_for_audio(sine_audio(1.0, 440.0, 48000))
        assert out.shape == (48000 // 320, 128)  # 150 frames


class TestCLAP:
    @pytest.fixture(scope="class")
    def fad(self):
        return FrechetAudioDistance(model_name="clap", weights="random")

    def test_one_l2_normalized_row_per_file(self, fad, sine_audio):
        out = fad.get_embeddings(
            [sine_audio(1.0, 440.0, 48000), sine_audio(2.0, 880.0, 48000)], 48000
        )
        assert out.shape == (2, 512)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    def test_score_and_identical(self, fad, tmp_path_factory):
        bg = str(tmp_path_factory.mktemp("bg"))
        ev = str(tmp_path_factory.mktemp("ev"))
        _write_sine_dir(bg, [440, 450, 460], 1.0, 48000)
        _write_sine_dir(ev, [880, 890, 900], 1.0, 48000)
        s = fad.score(bg, ev)
        assert np.isfinite(s) and s > 0
        assert abs(fad.score(bg, bg)) < 1e-3

    def test_deterministic(self, fad, sine_audio):
        a = sine_audio(1.0, 440.0, 48000)
        e1 = fad._get_embedding_for_audio(a)
        e2 = fad._get_embedding_for_audio(a)
        np.testing.assert_array_equal(e1, e2)

    def test_low_sr_pad_cap_matches_reference_full_pad(self, fad):
        """For sr < 48 kHz the reference pads to 480000 SOURCE samples (3x
        what the 1001-frame mel can read at 16 kHz); the pipeline caps the
        pad at the mel read window instead (review r5). Feeding the
        full-reference-pad waveform explicitly must embed identically to the
        raw clip — the finite-filter-support prefix argument, asserted."""
        rng = np.random.default_rng(4)
        clip = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)
        ref_padded = np.pad(clip, (0, 480000 - len(clip)))  # reference's pad
        out = fad.get_embeddings([clip, ref_padded], 16000)
        np.testing.assert_array_equal(out[0], out[1])

    def test_long_audio_embeds_by_mel_truncation(self, fad, sine_audio):
        """Audio past 10 s is supported via the reference's 1001-frame mel
        truncation (fad.py:69-91): only target samples < (1001+2)*480 can
        reach the model, so clips sharing that prefix must embed identically
        regardless of tail length — and land in ONE length bucket instead of
        compiling per duration (code-review r5)."""
        rng = np.random.default_rng(9)
        read_window = (1001 + 2) * 480  # 481,440 samples @ 48 kHz
        prefix = (rng.standard_normal(read_window) * 0.1).astype(np.float32)
        tail_a = (rng.standard_normal(48000 * 5) * 0.3).astype(np.float32)
        tail_b = (rng.standard_normal(48000 * 20) * 0.3).astype(np.float32)
        long_a = np.concatenate([prefix, tail_a])  # ~15 s
        long_b = np.concatenate([prefix, tail_b])  # ~30 s
        out = fad.get_embeddings([long_a, long_b, prefix], 48000)
        assert out.shape == (3, 512)
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[0], out[2])
