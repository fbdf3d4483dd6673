"""Data-parallel pipeline over the 8-device CPU mesh: embeddings must equal
the single-device result (sharding is an execution detail, not a numeric
one)."""

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.parallel import mesh as mesh_mod


@pytest.mark.parametrize("model", ["vggish", "pann-16k"])
def test_mesh_embeddings_match_single_device(model, sine_audio):
    sr = 16000
    clips = [sine_audio(1.5, 440.0 + 30 * i, sr) for i in range(5)]

    fad = FrechetAudioDistance(model_name=model, weights="random")
    single = fad.get_embeddings(clips, sr)

    fad_mesh = FrechetAudioDistance(model_name=model, weights="random")
    fad_mesh.pipeline.set_mesh(mesh_mod.data_mesh())
    sharded = fad_mesh.get_embeddings(clips, sr)

    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


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
    assert mesh_score == pytest.approx(host_score, rel=0.05, abs=1e-7)
