"""Direct parity against the reference's own model code.

Imports the reference package's VGGishCore and PANNCore classes themselves
(librosa/resampy stubbed — the classes never touch them), loads OUR random
weights into them, and compares outputs with the JAX forwards. This is the
strongest hermetic check: any architecture drift from the reference fails
here, with no replica in between."""

import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

REF = "/root/reference/frechet_audio_distance_exported/models"


def _load_ref_module(name):
    for stub_name in ("resampy", "librosa"):
        if stub_name not in sys.modules:
            mod = types.ModuleType(stub_name)
            # A real ModuleSpec keeps importlib.util.find_spec() (used by
            # transformers' librosa availability probe) from raising on the
            # stub if it outlives this module's tests.
            mod.__spec__ = importlib.machinery.ModuleSpec(stub_name, None)
            sys.modules[stub_name] = mod
    try:
        spec = importlib.util.spec_from_file_location(f"ref_{name}", f"{REF}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module unavailable: {e}")


def test_vggish_against_reference_class():
    from frechet_audio_distance_exported_tpu.models.vggish import (
        init_vggish_params,
        vggish_forward,
    )

    ref = _load_ref_module("vggish")
    params = init_vggish_params(jax.random.PRNGKey(3))
    model = ref.VGGishCore().eval()

    with torch.no_grad():
        conv_i = 0
        for m in model.features:
            if isinstance(m, torch.nn.Conv2d):
                p = params["features"][conv_i]
                m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()))
                m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                conv_i += 1
        lin_i = 0
        for m in model.embeddings:
            if isinstance(m, torch.nn.Linear):
                p = params["embeddings"][lin_i]
                m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T.copy()))
                m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                lin_i += 1
        assert conv_i == 6 and lin_i == 3

    x = np.random.default_rng(0).standard_normal((3, 96, 64)).astype(np.float32)
    ours = np.asarray(vggish_forward(params, x))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x[:, None])).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_pann_against_reference_class():
    from frechet_audio_distance_exported_tpu.models.pann import (
        init_pann_params,
        pann_forward,
    )

    ref = _load_ref_module("pann")
    params = init_pann_params(jax.random.PRNGKey(4))
    model = ref.PANNCore().eval()

    def load_bn(bn, q):
        bn.weight.copy_(torch.from_numpy(np.asarray(q["gamma"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(q["beta"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(q["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(q["var"])))

    with torch.no_grad():
        load_bn(model.bn0, params["bn0"])
        for i in range(1, 7):
            blk = getattr(model, f"conv_block{i}")
            p = params["blocks"][i - 1]
            blk.conv1.weight.copy_(
                torch.from_numpy(np.asarray(p["conv1"]["w"]).transpose(3, 2, 0, 1).copy()))
            blk.conv2.weight.copy_(
                torch.from_numpy(np.asarray(p["conv2"]["w"]).transpose(3, 2, 0, 1).copy()))
            load_bn(blk.bn1, p["bn1"])
            load_bn(blk.bn2, p["bn2"])
        model.fc1.weight.copy_(torch.from_numpy(np.asarray(params["fc1"]["w"]).T.copy()))
        model.fc1.bias.copy_(torch.from_numpy(np.asarray(params["fc1"]["b"])))

    x = np.random.default_rng(1).standard_normal((2, 104, 64)).astype(np.float32)
    ours = np.asarray(pann_forward(params, x))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x[:, None])).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
