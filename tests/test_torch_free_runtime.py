"""The runtime package must work without torch (README "Weights" claim).

The reference package hard-requires torch at import time (reference:
fad.py:1-30 imports torch to run the exported artifacts); this framework's
runtime path is JAX-only — torch is needed once, at dev time, inside
tools/extract_weights.py. That claim is structural (no `import torch`
anywhere under frechet_audio_distance_exported_tpu/) but nothing stopped a
future change from quietly adding a lazy torch import on the scoring path,
where `score()`'s -1 sentinel would swallow the ImportError per file and the
regression would surface as silently wrong behavior instead of a test
failure. This test scores a real corpus in a subprocess whose import system
refuses to load torch at all.
"""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO_ROOT = Path(__file__).parent.parent

_CHILD = textwrap.dedent(
    """
    import sys

    class _BlockTorch:
        '''Meta-path hook: any torch import anywhere fails loudly.'''

        def find_spec(self, name, path=None, target=None):
            if name == "torch" or name.startswith("torch."):
                raise ImportError(
                    "torch import attempted on the runtime path "
                    "(the framework must be torch-free at runtime)"
                )
            return None

    sys.meta_path.insert(0, _BlockTorch())

    import os

    os.environ["FAD_TPU_OFFLINE"] = "1"

    import jax

    # Pin CPU before backend init (sitecustomize force-prefers the TPU
    # platform; same pattern as test_distributed.py).
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, {repo!r})

    import numpy as np

    from frechet_audio_distance_exported_tpu import FrechetAudioDistance
    from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav

    sr = 16000
    bg, ev = sys.argv[1], sys.argv[2]
    t = np.linspace(0, 1.2, int(sr * 1.2), dtype=np.float32)
    for d, scale in ((bg, 0.5), (ev, 0.45)):
        for i, freq in enumerate((440.0, 660.0)):
            clip = (np.sin(2 * np.pi * freq * t) * scale).astype(np.float32)
            write_wav(os.path.join(d, f"{{i}}.wav"), clip, sr)

    fad = FrechetAudioDistance(model_name="vggish", weights="random")
    score = fad.score(bg, ev)
    # score() converts any internal error (including a swallowed per-file
    # ImportError that empties the embedding set) into -1; a real run of
    # these distinct corpora yields a positive finite score.
    assert score != -1, "score failed under the torch import block"
    assert np.isfinite(score) and score > 0, score
    assert "torch" not in sys.modules
    print("TORCH_FREE_OK", score)
    """
).format(repo=str(REPO_ROOT))


def test_score_runs_with_torch_imports_blocked(tmp_path):
    bg, ev = tmp_path / "bg", tmp_path / "ev"
    bg.mkdir()
    ev.mkdir()
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(bg), str(ev)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO_ROOT),
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "TORCH_FREE_OK" in r.stdout, r.stdout
