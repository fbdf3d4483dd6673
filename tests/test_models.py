"""Randomly-initialized model tests (shapes, batching, determinism) —
mirrors the reference's weightless model tier (tests/test_basic.py:84-122,
tests/test_pann.py:95-232)."""

import jax
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.models.pann import init_pann_params, pann_forward
from frechet_audio_distance_exported_tpu.models.vggish import init_vggish_params, vggish_forward


@pytest.fixture(scope="module")
def vggish_params():
    return init_vggish_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def pann_params():
    return init_pann_params(jax.random.PRNGKey(0))


class TestVGGish:
    def test_forward_shape(self, vggish_params):
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 96, 64))
        out = vggish_forward(vggish_params, x)
        assert out.shape == (5, 128)

    @pytest.mark.parametrize("batch", [1, 2, 10, 32])
    def test_batch_sizes(self, vggish_params, batch):
        x = jax.random.normal(jax.random.PRNGKey(2), (batch, 96, 64))
        assert vggish_forward(vggish_params, x).shape == (batch, 128)

    def test_deterministic(self, vggish_params):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 96, 64))
        a = np.asarray(vggish_forward(vggish_params, x))
        b = np.asarray(vggish_forward(vggish_params, x))
        np.testing.assert_array_equal(a, b)

    def test_batch_consistency(self, vggish_params):
        """Row i of a batched forward equals the single-row forward."""
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 96, 64))
        full = np.asarray(vggish_forward(vggish_params, x))
        single = np.asarray(vggish_forward(vggish_params, x[2:3]))
        np.testing.assert_allclose(full[2:3], single, rtol=1e-5, atol=1e-5)


class TestPANN:
    @pytest.mark.parametrize("time", [104, 200, 520, 1000])
    def test_forward_shapes(self, pann_params, time):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, time, 64))
        assert pann_forward(pann_params, x).shape == (2, 2048)

    def test_deterministic(self, pann_params):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 104, 64))
        a = np.asarray(pann_forward(pann_params, x))
        b = np.asarray(pann_forward(pann_params, x))
        np.testing.assert_array_equal(a, b)

    def test_output_nonnegative(self, pann_params):
        """fc1 is followed by ReLU (reference models/pann.py:271)."""
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 104, 64))
        out = np.asarray(pann_forward(pann_params, x))
        assert np.all(out >= 0)

    def test_time_pooling_floor_semantics(self, pann_params):
        """Odd intermediate time dims floor like torch avg_pool2d."""
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 72, 64))
        assert pann_forward(pann_params, x).shape == (1, 2048)


class TestTorchParity:
    """Bitwise-level architecture parity with freshly-initialized torch modules:
    identical weights -> near-identical outputs (CPU torch is available as a
    dev dependency; the runtime itself never imports torch)."""

    def test_vggish_matches_torch(self, vggish_params):
        torch = pytest.importorskip("torch")
        import torch.nn as nn

        torch.manual_seed(0)

        # Build a torch VGGish with OUR params to compare architectures.
        convs = []
        cin = 1
        cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]
        for v in cfg:
            if v == "M":
                convs.append(nn.MaxPool2d(2, 2))
            else:
                convs.append(nn.Conv2d(cin, v, 3, padding=1))
                convs.append(nn.ReLU())
                cin = v
        features = nn.Sequential(*convs)
        embeddings = nn.Sequential(
            nn.Linear(512 * 4 * 6, 4096), nn.ReLU(), nn.Linear(4096, 4096),
            nn.ReLU(), nn.Linear(4096, 128),
        )

        with torch.no_grad():
            ci = 0
            for m in features:
                if isinstance(m, nn.Conv2d):
                    p = vggish_params["features"][ci]
                    m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1)))
                    m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                    ci += 1
            li = 0
            for m in embeddings:
                if isinstance(m, nn.Linear):
                    p = vggish_params["embeddings"][li]
                    m.weight.copy_(torch.from_numpy(np.asarray(p["w"]).T))
                    m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
                    li += 1

        x = np.random.default_rng(0).standard_normal((3, 96, 64)).astype(np.float32)
        ours = np.asarray(vggish_forward(vggish_params, x))
        with torch.no_grad():
            h = features(torch.from_numpy(x[:, None, :, :]))
            h = h.transpose(1, 3).transpose(1, 2).contiguous().view(h.size(0), -1)
            theirs = embeddings(h).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    def test_pann_matches_torch(self, pann_params):
        torch = pytest.importorskip("torch")
        import torch.nn as nn
        import torch.nn.functional as F

        chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
        torch_blocks = []
        with torch.no_grad():
            for (cin, cout), p in zip(chans, pann_params["blocks"]):
                conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
                conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
                bn1, bn2 = nn.BatchNorm2d(cout), nn.BatchNorm2d(cout)
                conv1.weight.copy_(torch.from_numpy(np.asarray(p["conv1"]["w"]).transpose(3, 2, 0, 1)))
                conv2.weight.copy_(torch.from_numpy(np.asarray(p["conv2"]["w"]).transpose(3, 2, 0, 1)))
                for bn, q in ((bn1, p["bn1"]), (bn2, p["bn2"])):
                    bn.weight.copy_(torch.from_numpy(np.asarray(q["gamma"])))
                    bn.bias.copy_(torch.from_numpy(np.asarray(q["beta"])))
                    bn.running_mean.copy_(torch.from_numpy(np.asarray(q["mean"])))
                    bn.running_var.copy_(torch.from_numpy(np.asarray(q["var"])))
                    bn.eval()
                torch_blocks.append((conv1, bn1, conv2, bn2))
            bn0 = nn.BatchNorm2d(64)
            bn0.weight.copy_(torch.from_numpy(np.asarray(pann_params["bn0"]["gamma"])))
            bn0.bias.copy_(torch.from_numpy(np.asarray(pann_params["bn0"]["beta"])))
            bn0.running_mean.copy_(torch.from_numpy(np.asarray(pann_params["bn0"]["mean"])))
            bn0.running_var.copy_(torch.from_numpy(np.asarray(pann_params["bn0"]["var"])))
            bn0.eval()
            fc1 = nn.Linear(2048, 2048)
            fc1.weight.copy_(torch.from_numpy(np.asarray(pann_params["fc1"]["w"]).T))
            fc1.bias.copy_(torch.from_numpy(np.asarray(pann_params["fc1"]["b"])))

        x = np.random.default_rng(1).standard_normal((2, 104, 64)).astype(np.float32)
        ours = np.asarray(pann_forward(pann_params, x))

        with torch.no_grad():
            h = torch.from_numpy(x[:, None, :, :])
            h = h.transpose(1, 3)
            h = bn0(h)
            h = h.transpose(1, 3)
            for i, (conv1, bn1, conv2, bn2) in enumerate(torch_blocks):
                h = F.relu(bn1(conv1(h)))
                h = F.relu(bn2(conv2(h)))
                if i < 5:
                    h = F.avg_pool2d(h, 2)
            h = torch.mean(h, dim=3)
            h = torch.max(h, dim=2)[0] + torch.mean(h, dim=2)
            theirs = F.relu(fc1(h)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
