"""CLI smoke tests (python -m frechet_audio_distance_exported_tpu)."""

import json
import os

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.__main__ import main
from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav


@pytest.fixture
def dirs(tmp_path, sine_audio):
    bg, ev = tmp_path / "bg", tmp_path / "ev"
    os.makedirs(bg)
    os.makedirs(ev)
    for i in range(2):
        write_wav(str(bg / f"{i}.wav"), sine_audio(1.5, 440.0 + 5 * i), 16000)
        write_wav(str(ev / f"{i}.wav"), sine_audio(1.5, 880.0 + 5 * i), 16000)
    return str(bg), str(ev)


def test_cli_json_output(dirs, capsys):
    bg, ev = dirs
    rc = main([bg, ev, "--model", "vggish", "--weights", "random", "--json"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rc == 0
    assert rec["model"] == "vggish"
    assert np.isfinite(rec["fad"]) and rec["fad"] > 0


def test_cli_empty_dir_exit_code(tmp_path, dirs, capsys):
    _, ev = dirs
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    rc = main([empty, ev, "--model", "vggish", "--weights", "random"])
    assert rc == 1
