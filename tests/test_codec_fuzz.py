"""Container-decoder fuzz robustness: random bytes behind valid magics must
fail fast (ValueError/EOF-style) or decode, never hang or crash the process.

Motivated by a review finding where a negative CAF chunk size stalled the
chunk walk forever — in score() that would hang the whole run, since the
per-file error swallowing (reference: fad.py:400-403) can only catch
exceptions, not livelocks.
"""

import signal

import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.utils import audio_io

_MAGICS = [
    b"RIFF",
    b"RF64",
    b"BW64",
    b"riff\x2e\x91\xcf\x11\xa5\xd6\x28\xdb\x04\xc1\x00\x00",  # Wave64 GUID
    b"caff",
    b"fLaC",
    b"FORM",
    b".snd",
    b"OggS",
]


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


@pytest.mark.parametrize("magic", _MAGICS, ids=lambda m: m[:4].decode(errors="replace"))
@pytest.mark.parametrize("seed", range(8))
def test_random_bytes_never_hang(tmp_path, magic, seed):
    rng = np.random.default_rng(hash((bytes(magic), seed)) % 2**32)
    body = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    path = str(tmp_path / f"fuzz_{seed}.bin")
    with open(path, "wb") as f:
        f.write(magic + body)

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(20)  # generous; a hang would blow far past this
    try:
        audio_io.sf_read(path)
    except _Timeout:
        pytest.fail(f"decoder hung on fuzzed {magic[:4]!r} input (seed {seed})")
    except Exception:
        pass  # clean rejection (or partial decode raising) is the contract
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("seed", range(4))
def test_truncated_valid_files_never_hang(tmp_path, seed):
    """Truncating a real WAV/FLAC mid-file must not loop the frame parser."""
    from frechet_audio_distance_exported_tpu.utils import flac as flacmod

    sr = 8000
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    wav = str(tmp_path / "a.wav")
    fl = str(tmp_path / "a.flac")
    audio_io.write_wav(wav, x, sr)
    flacmod.write_flac(fl, x, sr)
    rng = np.random.default_rng(seed)
    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(20)
    try:
        for path in (wav, fl):
            with open(path, "rb") as f:
                raw = f.read()
            cut = int(rng.integers(8, len(raw) - 1))
            tpath = path + ".trunc"
            with open(tpath, "wb") as f:
                f.write(raw[:cut])
            try:
                audio_io.sf_read(tpath)
            except _Timeout:
                raise
            except Exception:
                pass
    except _Timeout:
        pytest.fail(f"decoder hung on truncated input (seed {seed})")
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
