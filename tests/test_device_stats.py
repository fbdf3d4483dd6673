"""Device-resident statistics path: accumulate_stats (embedding rows never
reach the host) must match the host embedding+np.cov pipeline, and the
device_stats score path must work end to end."""

import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.ops import stats as st
from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def vggish_fad():
    return FrechetAudioDistance(model_name="vggish", weights="random")


def _clips(sine_audio, sr=16000):
    return [sine_audio(2.0, 440.0, sr), sine_audio(3.1, 660.0, sr), sine_audio(1.0, 880.0, sr)]


def test_accumulate_stats_matches_host(vggish_fad, sine_audio):
    clips = _clips(sine_audio)
    state = vggish_fad.pipeline.accumulate_stats(clips, 16000)
    mu_dev, sigma_dev = st.finalize_stats(state)

    emb = vggish_fad.get_embeddings(clips, 16000)
    mu_np, sigma_np = st.calculate_embd_statistics_np(emb)
    assert float(state.n) == emb.shape[0]
    np.testing.assert_allclose(np.asarray(mu_dev), mu_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_dev), sigma_np, rtol=1e-3, atol=1e-5)


def test_accumulate_stats_encodec_masks(sine_audio):
    """Encodec delivers flattened [B*T] rows with frame masks; the masked
    count must equal the trimmed per-file frames."""
    fad = FrechetAudioDistance(model_name="encodec-24k", weights="random")
    clips = [sine_audio(1.0, 440.0, 24000), sine_audio(2.5, 660.0, 24000)]
    state = fad.pipeline.accumulate_stats(clips, 24000)
    expected_rows = 24000 // 320 + int(24000 * 2.5) // 320
    assert int(float(state.n)) == expected_rows

    emb = fad.get_embeddings(clips, 24000)
    mu_np, sigma_np = st.calculate_embd_statistics_np(emb)
    mu_dev, sigma_dev = st.finalize_stats(state)
    np.testing.assert_allclose(np.asarray(mu_dev), mu_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma_dev), sigma_np, rtol=1e-3, atol=1e-5)


def test_device_stats_score_end_to_end(vggish_fad, tmp_path, sine_audio):
    bg = tmp_path / "bg"
    ev = tmp_path / "ev"
    for d, base in ((bg, 440), (ev, 880)):
        os.makedirs(d)
        for i in range(3):
            write_wav(str(d / f"{i}.wav"), sine_audio(2.0, base + 5 * i), 16000)
    s_dev = vggish_fad.score(str(bg), str(ev), device_stats=True)
    s_host = vggish_fad.score(str(bg), str(ev))
    assert np.isfinite(s_dev) and s_dev > 0
    # float32 device epilogue vs float64 host: same order of magnitude and sign.
    assert s_dev == pytest.approx(s_host, rel=0.2, abs=1e-6)
    # identical dirs -> ~0
    assert abs(vggish_fad.score(str(bg), str(bg), device_stats=True)) < 1e-3


def test_fused_sink_matches_generic_callable_sink(vggish_fad, sine_audio):
    """The StatsSink fused path (mask build + update inside the chunk
    program, one dispatch per chunk — round 3) must equal the generic
    callable-sink path it replaced (host mask + separate update_stats)."""
    import jax.numpy as jnp

    clips = _clips(sine_audio)
    fused_state = vggish_fad.pipeline.accumulate_stats(clips, 16000)

    box = {"state": None}

    def generic_sink(rows, mask):
        if mask is None:
            mask = np.ones(rows.shape[:-1], np.float32)
        if box["state"] is None:
            box["state"] = st.init_update_stats(rows, jnp.asarray(mask))
        else:
            box["state"] = st.update_stats(box["state"], rows, jnp.asarray(mask))

    vggish_fad.pipeline.embed_files(clips, 16000, sink=generic_sink)

    for fused, generic in [
        (st.finalize_stats(fused_state), st.finalize_stats(box["state"]))
    ]:
        np.testing.assert_allclose(
            np.asarray(fused[0]), np.asarray(generic[0]), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(fused[1]), np.asarray(generic[1]), rtol=1e-4, atol=1e-7
        )
    assert float(fused_state.n) == float(box["state"].n)
