"""Data-parallel pipeline over the 8-device CPU mesh: embeddings must equal
the single-device result (sharding is an execution detail, not a numeric
one)."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.parallel import mesh as mesh_mod


@pytest.mark.parametrize(
    "model",
    ["vggish", "pann-8k", "pann-16k", "pann-32k", "clap", "encodec-24k", "encodec-48k"],
)
def test_mesh_embeddings_match_single_device(model, sine_audio):
    """All families under the mesh: vggish/pann take the GSPMD path (the
    8k/32k variants add the cross-SR resample before sharding), CLAP the
    shard_map-wrapped forward (pipeline.set_mesh), Encodec the masked
    frame-count path with fixed 10 s inputs — including the 48k variant
    (stereo + per-conv GroupNorm + non-causal padding), which shard_map had
    never executed before round 4."""
    sr = 16000
    # Short clips keep the CPU Swin/LSTM cost bounded; CLAP/Encodec pad to
    # their fixed shapes internally, so the mesh path is fully exercised.
    n = {"clap": 3, "encodec-24k": 3, "encodec-48k": 2}.get(model, 5)
    clips = [sine_audio(1.5, 440.0 + 30 * i, sr) for i in range(n)]

    fad = FrechetAudioDistance(model_name=model, weights="random")
    single = fad.get_embeddings(clips, sr)

    fad_mesh = FrechetAudioDistance(model_name=model, weights="random")
    fad_mesh.pipeline.set_mesh(mesh_mod.data_mesh())
    sharded = fad_mesh.get_embeddings(clips, sr)

    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


def test_mesh_vggish_long_file_segments(sine_audio):
    """A file longer than patch_chunk patches is split into segments
    (pipeline._embed_vggish); under a mesh each segment batch must still
    bucket to a mesh-divisible size and reassemble in order."""
    sr = 16000
    fad = FrechetAudioDistance(model_name="vggish", weights="random")
    fad.pipeline.patch_chunk = 4  # force segmentation: 12 patches -> 3 segments
    long_clip = sine_audio(12.0, 330.0, sr)  # ~12 patches
    clips = [long_clip, sine_audio(1.5, 500.0, sr)]
    single = fad.get_embeddings(clips, sr)

    fad_mesh = FrechetAudioDistance(model_name="vggish", weights="random")
    fad_mesh.pipeline.set_mesh(mesh_mod.data_mesh())
    fad_mesh.pipeline.patch_chunk = 8  # mesh-divisible but still segmenting
    sharded = fad_mesh.get_embeddings(clips, sr)

    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model", ["clap", "encodec-24k", "encodec-48k"])
def test_mesh_device_stats_match_host(model, sine_audio):
    """Sharded accumulate_stats (sink path) == host-gathered statistics for
    the families the round-2 mesh tests never exercised (CLAP's shard_map
    forward; Encodec's per-frame masks under sharding; 48k's stereo +
    GroupNorm variant)."""
    from frechet_audio_distance_exported_tpu.ops import stats as stats_ops

    sr = 16000
    clips = [sine_audio(1.2, 440.0 + 40 * i, sr) for i in range(2 if model == "encodec-48k" else 3)]

    fad = FrechetAudioDistance(model_name=model, weights="random")
    emb = fad.get_embeddings(clips, sr)
    mu_host, sigma_host = fad.calculate_embd_statistics(emb)

    fad_mesh = FrechetAudioDistance(model_name=model, weights="random")
    fad_mesh.pipeline.set_mesh(mesh_mod.data_mesh())
    state = fad_mesh.pipeline.accumulate_stats(clips, sr)
    mu_dev, sigma_dev = (np.asarray(a) for a in stats_ops.finalize_stats(state))

    np.testing.assert_allclose(mu_dev, mu_host, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sigma_dev, sigma_host, rtol=1e-3, atol=1e-6)


def test_mesh_device_stats_score(tmp_path, sine_audio):
    import os

    from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav

    bg, ev = tmp_path / "bg", tmp_path / "ev"
    os.makedirs(bg)
    os.makedirs(ev)
    for i in range(3):
        write_wav(str(bg / f"{i}.wav"), sine_audio(1.5, 440.0 + 5 * i), 16000)
        write_wav(str(ev / f"{i}.wav"), sine_audio(1.5, 880.0 + 5 * i), 16000)

    fad = FrechetAudioDistance(model_name="vggish", weights="random")
    host_score = fad.score(str(bg), str(ev))

    fad_mesh = FrechetAudioDistance(model_name="vggish", weights="random")
    fad_mesh.pipeline.set_mesh(mesh_mod.data_mesh())
    mesh_score = fad_mesh.score(str(bg), str(ev), device_stats=True)
    # Shift-stabilized f32 streaming vs host f64: must sit inside the <=1e-3
    # parity bar, not merely "close".
    assert mesh_score == pytest.approx(host_score, rel=1e-3, abs=1e-7)


def test_non_power_of_two_mesh(sine_audio):
    """Batch buckets must stay divisible by non-power-of-two mesh sizes
    (3 of the 8 virtual devices)."""
    import jax

    from frechet_audio_distance_exported_tpu.parallel.mesh import data_mesh

    fad = FrechetAudioDistance(model_name="pann-16k", weights="random")
    clips = [sine_audio(1.0, 440.0 + 10 * i) for i in range(5)]
    single = fad.get_embeddings(clips, 16000)

    fad3 = FrechetAudioDistance(model_name="pann-16k", weights="random")
    fad3.pipeline.set_mesh(data_mesh(jax.devices()[:3]))
    sharded = fad3.get_embeddings(clips, 16000)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)
