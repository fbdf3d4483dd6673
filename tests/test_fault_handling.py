"""Failure-detection behavior (SURVEY §5.3): per-file skip in
get_embeddings, the -1 sentinel, and whole-dir failure on undecodable files
(the reference re-raises decode errors from the thread pool, fad.py:591, so
one corrupt file fails the scoring call into the -1 sentinel — preserved
here as behavioral spec)."""

import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu import FrechetAudioDistance
from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def fad():
    return FrechetAudioDistance(model_name="vggish", weights="random")


def test_corrupt_file_yields_sentinel(fad, tmp_path, sine_audio):
    bg, ev = tmp_path / "bg", tmp_path / "ev"
    os.makedirs(bg)
    os.makedirs(ev)
    for i in range(2):
        write_wav(str(bg / f"{i}.wav"), sine_audio(1.5, 440.0), 16000)
        write_wav(str(ev / f"{i}.wav"), sine_audio(1.5, 880.0), 16000)
    with open(bg / "corrupt.wav", "wb") as f:
        f.write(b"not a wav file at all")
    assert fad.score(str(bg), str(ev)) == -1
    assert fad.score(str(bg), str(ev), device_stats=True) == -1


def test_preprocessing_error_skips_file_not_batch(fad, sine_audio):
    """In-batch preprocessing failures skip only the file (fad.py:400-403)."""
    good = sine_audio(1.5, 440.0)
    bad = sine_audio(0.2, 440.0)  # < 1 patch -> per-file error, swallowed
    out = fad.get_embeddings([bad, good, bad], 16000)
    assert out.shape == (1, 128)


def test_all_failed_returns_empty(fad, sine_audio):
    # <0.96 s -> zero patches per file (not an error); zero total rows drives
    # score()'s empty-set -1 sentinel exactly like the reference's len()==0
    # check (fad.py:640-645).
    out = fad.get_embeddings([sine_audio(0.2, 440.0)], 16000)
    assert len(out) == 0
    assert out.shape[-1] == 128
