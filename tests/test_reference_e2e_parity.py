"""End-to-end FAD parity against the reference implementation itself.

Runs the reference package's own FrechetAudioDistance.get_embeddings /
calculate_embd_statistics / calculate_frechet_distance (fad.py), with its own
NumPy frontend and its own VGGishCore torch module carrying OUR weights, and
compares the final FAD score with this framework on the same audio. The only
stubbed pieces are soundfile/resampy/librosa imports (never called on the
16 kHz VGGish path). Bar: |FAD_ref - FAD_ours| < 1e-3 — tighter than the
reference's own 0.01 equivalence bar (verify_export.py:200)."""

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_fad_module():
    for stub in ("soundfile", "resampy", "librosa", "tqdm_stub"):
        if stub not in sys.modules and stub != "tqdm_stub":
            sys.modules[stub] = types.ModuleType(stub)
    sys.modules["librosa"].stft = None
    sys.modules["librosa"].filters = types.SimpleNamespace(mel=None)
    sys.path.insert(0, "/root/reference")
    try:
        mod = importlib.import_module("frechet_audio_distance_exported.fad")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference package unavailable: {e}")
    return mod


def _sine(duration, freq, sr=16000):
    t = np.linspace(0, duration, int(sr * duration), dtype=np.float32)
    return (np.sin(2 * np.pi * freq * t) * 0.5).astype(np.float32)


def test_vggish_full_fad_parity(reference_fad_module):
    from frechet_audio_distance_exported_tpu import FrechetAudioDistance

    # Our framework with random weights.
    ours = FrechetAudioDistance(model_name="vggish", weights="random", seed=17)

    # The reference's own model class carrying the SAME weights.
    ref_models = importlib.import_module("frechet_audio_distance_exported.models.vggish")
    ref_model = ref_models.VGGishCore().eval()
    params = ours.params
    with torch.no_grad():
        conv_i = 0
        for m in ref_model.features:
            if isinstance(m, torch.nn.Conv2d):
                p = params["features"][conv_i]
                m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()))
                m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                conv_i += 1
        lin_i = 0
        for m in ref_model.embeddings:
            if isinstance(m, torch.nn.Linear):
                p = params["embeddings"][lin_i]
                m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
                m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                lin_i += 1

    # The reference FAD object, built like its own MockFAD test tier
    # (tests/test_basic.py:136-141) with the model injected.
    RefFAD = reference_fad_module.FrechetAudioDistance
    ref = RefFAD.__new__(RefFAD)
    ref.model_name = "vggish"
    ref.sample_rate = 16000
    ref.channels = 1
    ref.verbose = False
    ref.device = torch.device("cpu")
    ref.model = ref_model

    background = [_sine(2.0, 440.0 + 7 * i) for i in range(4)]
    evaluation = [_sine(2.0, 850.0 + 9 * i) for i in range(4)]

    emb_bg_ref = ref.get_embeddings(background, sr=16000)
    emb_ev_ref = ref.get_embeddings(evaluation, sr=16000)
    emb_bg_ours = ours.get_embeddings(background, 16000)
    emb_ev_ours = ours.get_embeddings(evaluation, 16000)

    assert emb_bg_ref.shape == emb_bg_ours.shape
    emb_diff = np.max(np.abs(emb_bg_ref - emb_bg_ours))
    # The reference's own embedding-equivalence bar is 1e-4 (verify_export.py:141).
    assert emb_diff < 1e-3, emb_diff

    mu1r, s1r = ref.calculate_embd_statistics(emb_bg_ref)
    mu2r, s2r = ref.calculate_embd_statistics(emb_ev_ref)
    fad_ref = ref.calculate_frechet_distance(mu1r, s1r, mu2r, s2r)

    mu1, s1 = ours.calculate_embd_statistics(emb_bg_ours)
    mu2, s2 = ours.calculate_embd_statistics(emb_ev_ours)
    fad_ours = ours.calculate_frechet_distance(mu1, s1, mu2, s2)

    assert abs(fad_ref - fad_ours) < 1e-3, (fad_ref, fad_ours)
