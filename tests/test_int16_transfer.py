"""int16 wire-transfer path: PCM16-exact audio ships as int16 (half the
host->device bytes) and must produce BIT-IDENTICAL embeddings to the float32
path for every family."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu import pipeline as pl


def _pcm16(dur, freq, sr):
    t = np.linspace(0, dur, int(sr * dur), dtype=np.float64)
    x = np.sin(2 * np.pi * freq * t) * 0.5
    return (np.round(x * 32768.0).clip(-32768, 32767) / 32768.0).astype(np.float32)


class TestExactnessDetector:
    def test_pcm16_detected(self):
        x = _pcm16(0.1, 440.0, 16000)
        q = pl.as_int16_exact(x)
        assert q is not None and q.dtype == np.int16
        np.testing.assert_array_equal(q.astype(np.float32) / 32768.0, x)

    def test_fullscale_negative_allowed(self):
        x = np.array([-1.0, 32767 / 32768.0], np.float32)
        q = pl.as_int16_exact(x)
        assert q is not None
        assert q[0] == -32768 and q[1] == 32767

    def test_offgrid_rejected(self):
        assert pl.as_int16_exact(np.array([0.1, 0.25], np.float32)) is None
        # +1.0 is NOT representable (would be +32768)
        assert pl.as_int16_exact(np.array([1.0], np.float32)) is None

    def test_resampled_rejected(self):
        from frechet_audio_distance_exported_tpu.ops.resample import resample

        x = resample(_pcm16(0.1, 440.0, 44100), 44100, 16000).astype(np.float32)
        assert pl.as_int16_exact(x) is None


@pytest.mark.parametrize(
    "model,sr",
    [("vggish", 16000), ("pann-16k", 16000), ("clap", 48000), ("encodec-24k", 24000)],
)
def test_i16_path_matches_f32_path(model, sr):
    """Same clips, once via the int16 wire and once with the detector
    disabled (f32 wire). The k/32768 grid (VGGish/PANN/Encodec) dequantizes
    bit-exactly (power-of-two divide). CLAP's k/32767 grid is exact to 1 ulp
    of the sample value (<6e-8): XLA's f32 division is not guaranteed
    IEEE-exact, and 1/32767 is not a power of two."""
    fad = FrechetAudioDistance(model_name=model, weights="random")
    clips = [_pcm16(1.5 if model != "clap" else 2.0, 440.0 + 60 * i, sr) for i in range(3)]

    emb_i16 = fad.get_embeddings(clips, sr)

    # Force the f32 wire by disabling the detector.
    orig = pl.as_int16_exact
    try:
        pl.as_int16_exact = lambda x, full_scale=32768.0: None
        emb_f32 = fad.get_embeddings(clips, sr)
    finally:
        pl.as_int16_exact = orig

    if model == "clap":
        np.testing.assert_allclose(emb_i16, emb_f32, atol=2e-6)
    else:
        np.testing.assert_array_equal(emb_i16, emb_f32)


def test_vggish_long_file_segment_split_matches_unsplit():
    """Files with more patches than patch_chunk are split at patch
    boundaries into separate programs; VGGish framing is uncentered, so the
    reassembled rows must match an unsplit run (same values up to the
    batch-shape ulp floor) with identical shape/order."""
    sr = 16000
    rng = np.random.default_rng(7)
    clip = (rng.standard_normal(sr * 10) * 0.1).astype(np.float32)  # 10 patches

    whole = FrechetAudioDistance(model_name="vggish", weights="random")
    split = FrechetAudioDistance(model_name="vggish", weights="random", patch_chunk=4)
    a = whole.get_embeddings([clip], sr)
    b = split.get_embeddings([clip], sr)  # segments of 4+4+2 patches
    assert a.shape == b.shape == (10, 128)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    # device_stats sink sees the same row count.
    st = split.pipeline.accumulate_stats([clip], sr)
    assert int(st.n) == 10


def test_mixed_chunk_falls_back_to_f32():
    """A chunk mixing PCM16-exact and off-grid files must equal the same
    batch forced onto the f32 wire (mixed rows are dequantized on host).
    Same batch shape -> same XLA program -> bit-identical."""
    sr = 16000
    fad = FrechetAudioDistance(model_name="vggish", weights="random")
    exact = _pcm16(1.5, 440.0, sr)
    offgrid = (exact + 1e-5).astype(np.float32)
    both = fad.get_embeddings([exact, offgrid], sr)
    orig = pl.as_int16_exact
    try:
        pl.as_int16_exact = lambda x, full_scale=32768.0: None
        forced = fad.get_embeddings([exact, offgrid], sr)
    finally:
        pl.as_int16_exact = orig
    np.testing.assert_array_equal(both, forced)
