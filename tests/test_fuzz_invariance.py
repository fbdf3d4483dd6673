"""Seeded fuzz: the bucketed batched pipeline must produce identical
embeddings regardless of how files are grouped (the core exactness invariant
of DESIGN.md §2), across random durations and models."""

import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav


def _random_clips(rng, n, sr, min_s=0.97, max_s=3.4):
    clips = []
    for _ in range(n):
        dur = rng.uniform(min_s, max_s)
        t = np.arange(int(sr * dur)) / sr
        f = rng.uniform(100, 2000)
        clips.append((np.sin(2 * np.pi * f * t) * 0.4).astype(np.float32))
    return clips


@pytest.mark.parametrize("model,sr,tol", [("vggish", 16000, 1e-5), ("pann-16k", 16000, 1e-4)])
def test_fuzz_grouping_invariance(model, sr, tol):
    rng = np.random.default_rng(42)
    clips = _random_clips(rng, 7, sr)
    fad = FrechetAudioDistance(model_name=model, weights="random")
    joint = fad.get_embeddings(clips, sr)
    solo = np.concatenate([fad.get_embeddings([c], sr) for c in clips], axis=0)
    assert joint.shape == solo.shape
    np.testing.assert_allclose(joint, solo, rtol=tol * 10, atol=tol)


def test_encodec48k_stereo_score(tmp_path, sine_audio):
    """Stereo WAVs through score() with the reference's channels=1 load quirk."""
    fad = FrechetAudioDistance(model_name="encodec-48k", weights="random")
    bg, ev = tmp_path / "bg", tmp_path / "ev"
    os.makedirs(bg)
    os.makedirs(ev)
    for i in range(2):
        left = sine_audio(1.0, 440.0 + 5 * i, 48000)
        right = sine_audio(1.0, 445.0 + 5 * i, 48000)
        write_wav(str(bg / f"{i}.wav"), np.stack([left, right], 1), 48000)
        write_wav(str(ev / f"{i}.wav"), np.stack([right, left * 0.5], 1), 48000)
    s = fad.score(str(bg), str(ev))
    assert np.isfinite(s) and s > 0
    assert abs(fad.score(str(bg), str(bg))) < 1e-3
