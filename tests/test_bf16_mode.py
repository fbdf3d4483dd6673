"""bfloat16 inference mode (FAD_TPU_MODEL_DTYPE=bfloat16): runs end to end,
stays close to the float32 path, and keeps statistics float32."""

import numpy as np
import pytest


def test_bf16_vggish_close_to_f32(monkeypatch, sine_audio):
    from frechet_audio_distance_exported_tpu import FrechetAudioDistance

    clips = [sine_audio(2.0, 440.0), sine_audio(2.0, 880.0)]

    fad32 = FrechetAudioDistance(model_name="vggish", weights="random")
    e32 = fad32.get_embeddings(clips, 16000)

    monkeypatch.setenv("FAD_TPU_MODEL_DTYPE", "bfloat16")
    fad16 = FrechetAudioDistance(model_name="vggish", weights="random")
    e16 = fad16.get_embeddings(clips, 16000)

    assert e16.dtype == np.float32  # upcast at the boundary
    assert e16.shape == e32.shape
    # bfloat16 has ~3 decimal digits; embeddings should agree loosely.
    denom = np.maximum(np.abs(e32), 1e-3)
    rel = np.abs(e16 - e32) / denom
    assert np.median(rel) < 0.1, np.median(rel)


def test_bf16_identical_dirs_zero(monkeypatch, tmp_path, sine_audio):
    import os

    from frechet_audio_distance_exported_tpu import FrechetAudioDistance
    from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav

    monkeypatch.setenv("FAD_TPU_MODEL_DTYPE", "bfloat16")
    d = tmp_path / "bg"
    os.makedirs(d)
    for i in range(3):
        write_wav(str(d / f"{i}.wav"), sine_audio(1.5, 440.0 + 5 * i), 16000)
    fad = FrechetAudioDistance(model_name="vggish", weights="random")
    assert abs(fad.score(str(d), str(d))) < 1e-3
