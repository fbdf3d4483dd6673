"""Weight-extraction round-trip tests: build torch modules with the
reference's exact module layouts, export/trace/save them the way the
reference artifacts are produced, run tools/extract_weights.py on the
artifact, and check the JAX model reproduces the torch outputs."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from tools import extract_weights as ew  # noqa: E402
from torch_replicas import SEANetLike as _SEANetLike  # noqa: E402


def _build_torch_vggish():
    convs = []
    cin = 1
    for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]:
        if v == "M":
            convs.append(nn.MaxPool2d(2, 2))
        else:
            convs.append(nn.Conv2d(cin, v, 3, padding=1))
            convs.append(nn.ReLU(inplace=True))
            cin = v

    class VGGishLike(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*convs)
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Linear(4096, 128),
            )

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    return VGGishLike()


@pytest.mark.slow
def test_vggish_pt2_roundtrip(tmp_path):
    from frechet_audio_distance_exported_tpu.models.vggish import vggish_forward
    from frechet_audio_distance_exported_tpu.utils.weights import unflatten_params, flatten_params

    torch.manual_seed(0)
    model = _build_torch_vggish().eval()
    example = torch.randn(2, 1, 96, 64)
    exported = torch.export.export(model, (example,))
    path = str(tmp_path / "vggish_exported.pt2")
    torch.export.save(exported, path)

    params = unflatten_params(flatten_params(ew.extract_vggish(path)))
    x = np.random.default_rng(0).standard_normal((2, 96, 64)).astype(np.float32)
    ours = np.asarray(vggish_forward(params, x))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x[:, None])).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_vggish_pth_roundtrip(tmp_path):
    """Upstream torchvggish-hub-style plain state dict (.pth): same
    features/embeddings Sequential indices as the reference artifact."""
    from frechet_audio_distance_exported_tpu.models.vggish import vggish_forward
    from frechet_audio_distance_exported_tpu.utils.weights import unflatten_params, flatten_params

    torch.manual_seed(3)
    model = _build_torch_vggish().eval()
    path = str(tmp_path / "vggish-10086976.pth")
    torch.save(model.state_dict(), path)

    params = unflatten_params(flatten_params(ew.extract_vggish(path)))
    x = np.random.default_rng(3).standard_normal((2, 96, 64)).astype(np.float32)
    ours = np.asarray(vggish_forward(params, x))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x[:, None])).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_pann_pth_roundtrip(tmp_path):
    """Upstream-style {'model': state_dict} checkpoint with the reference's
    module names (export_pann.py:166-195)."""
    from frechet_audio_distance_exported_tpu.models.pann import pann_forward
    from frechet_audio_distance_exported_tpu.utils.weights import unflatten_params, flatten_params

    torch.manual_seed(1)
    sd = {}
    for name, dim in [("bn0", 64)]:
        sd[f"{name}.weight"] = torch.randn(dim).abs() + 0.5
        sd[f"{name}.bias"] = torch.randn(dim)
        sd[f"{name}.running_mean"] = torch.randn(dim) * 0.1
        sd[f"{name}.running_var"] = torch.randn(dim).abs() + 0.5
    chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    for i, (cin, cout) in enumerate(chans, start=1):
        sd[f"conv_block{i}.conv1.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"conv_block{i}.conv2.weight"] = torch.randn(cout, cout, 3, 3) * 0.02
        for bn in ("bn1", "bn2"):
            sd[f"conv_block{i}.{bn}.weight"] = torch.randn(cout).abs() + 0.5
            sd[f"conv_block{i}.{bn}.bias"] = torch.randn(cout) * 0.1
            sd[f"conv_block{i}.{bn}.running_mean"] = torch.randn(cout) * 0.1
            sd[f"conv_block{i}.{bn}.running_var"] = torch.randn(cout).abs() + 0.5
    sd["fc1.weight"] = torch.randn(2048, 2048) * 0.01
    sd["fc1.bias"] = torch.randn(2048) * 0.1
    path = str(tmp_path / "Cnn14_16k.pth")
    torch.save({"model": sd}, path)

    params = unflatten_params(flatten_params(ew.extract_pann(path)))
    x = np.random.default_rng(1).standard_normal((1, 104, 64)).astype(np.float32)
    out = np.asarray(pann_forward(params, x))
    assert out.shape == (1, 2048)
    # Spot-check the layout transposes.
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["conv1"]["w"]),
        sd["conv_block1.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(np.asarray(params["bn0"]["var"]), sd["bn0.running_var"].numpy())


@pytest.mark.parametrize("causal,channels", [(True, 1), (False, 2)])
def test_encodec_pt_roundtrip(tmp_path, causal, channels):
    from frechet_audio_distance_exported_tpu.models.encodec import encodec_forward
    from frechet_audio_distance_exported_tpu.utils.weights import unflatten_params, flatten_params

    torch.manual_seed(2)
    model = _SEANetLike(channels, causal).eval()
    example = torch.randn(1, channels, 3200) * 0.1
    traced = torch.jit.trace(model, example)
    path = str(tmp_path / "encodec_exported.pt")
    traced.save(path)

    params = unflatten_params(flatten_params(ew.extract_encodec(path)))
    x = np.random.default_rng(2).standard_normal((1, channels, 3200)).astype(np.float32) * 0.1
    ours = np.asarray(encodec_forward(params, x, causal=causal))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x)).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_clap_mapping_shapes():
    """Synthetic laion_clap-style state dict -> correctly-shaped CLAP pytree
    that the JAX forward accepts."""
    from frechet_audio_distance_exported_tpu.models.clap import clap_forward

    class FakeModule:
        pass

    depths = (2, 2, 6, 2)
    dims = (96, 192, 384, 768)
    heads = (4, 8, 16, 32)
    g = torch.Generator().manual_seed(3)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "audio_branch.bn0.weight": r(64).abs() + 0.5,
        "audio_branch.bn0.bias": r(64),
        "audio_branch.bn0.running_mean": r(64),
        "audio_branch.bn0.running_var": r(64).abs() + 0.5,
        "audio_branch.patch_embed.proj.weight": r(96, 1, 4, 4),
        "audio_branch.patch_embed.proj.bias": r(96),
        "audio_branch.patch_embed.norm.weight": r(96) + 1.0,
        "audio_branch.patch_embed.norm.bias": r(96),
        "audio_branch.norm.weight": r(768) + 1.0,
        "audio_branch.norm.bias": r(768),
        "audio_projection.0.weight": r(512, 768),
        "audio_projection.0.bias": r(512),
        "audio_projection.2.weight": r(512, 512),
        "audio_projection.2.bias": r(512),
    }
    for i, depth in enumerate(depths):
        c, h = dims[i], heads[i]
        for j in range(depth):
            b = f"audio_branch.layers.{i}.blocks.{j}"
            sd[f"{b}.norm1.weight"] = r(c) + 1.0
            sd[f"{b}.norm1.bias"] = r(c)
            sd[f"{b}.attn.qkv.weight"] = r(3 * c, c)
            sd[f"{b}.attn.qkv.bias"] = r(3 * c)
            sd[f"{b}.attn.relative_position_bias_table"] = r(225, h)
            sd[f"{b}.attn.proj.weight"] = r(c, c)
            sd[f"{b}.attn.proj.bias"] = r(c)
            sd[f"{b}.norm2.weight"] = r(c) + 1.0
            sd[f"{b}.norm2.bias"] = r(c)
            sd[f"{b}.mlp.fc1.weight"] = r(4 * c, c)
            sd[f"{b}.mlp.fc1.bias"] = r(4 * c)
            sd[f"{b}.mlp.fc2.weight"] = r(c, 4 * c)
            sd[f"{b}.mlp.fc2.bias"] = r(c)
        if i < 3:
            d = f"audio_branch.layers.{i}.downsample"
            sd[f"{d}.norm.weight"] = r(4 * c) + 1.0
            sd[f"{d}.norm.bias"] = r(4 * c)
            sd[f"{d}.reduction.weight"] = r(2 * c, 4 * c)

    # Monkeypatch _load_state_dict to feed the synthetic dict.
    orig = ew._load_state_dict
    ew._load_state_dict = lambda path: (sd, None)
    try:
        params = ew.extract_clap("fake.pt2")
    finally:
        ew._load_state_dict = orig

    assert np.asarray(params["projection"]["fc1"]["w"]).shape == (768, 512)
    assert np.asarray(params["patch_embed"]["conv"]["w"]).shape == (4, 4, 1, 96)
    x = np.random.default_rng(0).standard_normal((1, 1001, 64)).astype(np.float32)
    out = np.asarray(clap_forward(params, x))
    assert out.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_extract_cli_end_to_end(tmp_path, monkeypatch):
    """tools/extract_weights.py CLI: artifact in ckpt-dir -> saved npz bundle
    loadable by the weight store."""
    import subprocess
    import sys as _sys

    sd = {}
    chans = [(1, 64), (64, 128), (128, 256), (256, 512), (512, 1024), (1024, 2048)]
    g = torch.Generator().manual_seed(9)
    sd["bn0.weight"] = torch.rand(64, generator=g) + 0.5
    sd["bn0.bias"] = torch.rand(64, generator=g)
    sd["bn0.running_mean"] = torch.rand(64, generator=g)
    sd["bn0.running_var"] = torch.rand(64, generator=g) + 0.5
    for i, (cin, cout) in enumerate(chans, start=1):
        sd[f"conv_block{i}.conv1.weight"] = torch.randn(cout, cin, 3, 3, generator=g) * 0.02
        sd[f"conv_block{i}.conv2.weight"] = torch.randn(cout, cout, 3, 3, generator=g) * 0.02
        for bn in ("bn1", "bn2"):
            sd[f"conv_block{i}.{bn}.weight"] = torch.rand(cout, generator=g) + 0.5
            sd[f"conv_block{i}.{bn}.bias"] = torch.rand(cout, generator=g)
            sd[f"conv_block{i}.{bn}.running_mean"] = torch.rand(cout, generator=g)
            sd[f"conv_block{i}.{bn}.running_var"] = torch.rand(cout, generator=g) + 0.5
    sd["fc1.weight"] = torch.randn(2048, 2048, generator=g) * 0.01
    sd["fc1.bias"] = torch.randn(2048, generator=g) * 0.1
    torch.save({"model": sd}, str(tmp_path / "pann_cnn14_16k_exported.pt2"))
    # The CLI treats .pth as upstream; use --artifact to point at our file but
    # exercise main() via the module API for speed.
    import tools.extract_weights as ewm

    monkeypatch.setattr(
        _sys, "argv",
        ["extract_weights.py", "--model", "pann-16k", "--ckpt-dir", str(tmp_path),
         "--artifact", str(tmp_path / "pann_cnn14_16k_exported.pt2")],
    )
    # .pt2 path goes through torch.export.load which this fake file is not;
    # route via the .pth branch instead by renaming.
    (tmp_path / "pann_cnn14_16k_exported.pt2").rename(tmp_path / "cnn14.pth")
    monkeypatch.setattr(
        _sys, "argv",
        ["extract_weights.py", "--model", "pann-16k", "--ckpt-dir", str(tmp_path),
         "--artifact", str(tmp_path / "cnn14.pth")],
    )
    ewm.main()
    from frechet_audio_distance_exported_tpu.utils.weights import load_weights
    from frechet_audio_distance_exported_tpu.models.pann import pann_forward

    params = load_weights(str(tmp_path / "pann_cnn14_16k_tpu.npz"))
    out = pann_forward(params, np.zeros((1, 104, 64), np.float32))
    assert out.shape == (1, 2048)


@pytest.mark.slow
def test_auto_convert_artifact_in_ckpt_dir(tmp_path):
    """Drop a reference-named .pt2 artifact into ckpt_dir: the weight store
    converts it on first use and FrechetAudioDistance scores with it
    (the runtime mirror of the reference's download-on-miss flow)."""
    import os

    from frechet_audio_distance_exported_tpu import FrechetAudioDistance
    from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav

    torch.manual_seed(5)
    model = _build_torch_vggish().eval()
    exported = torch.export.export(model, (torch.randn(2, 1, 96, 64),))
    torch.export.save(exported, str(tmp_path / "vggish_exported.pt2"))

    fad = FrechetAudioDistance(ckpt_dir=str(tmp_path), model_name="vggish")
    assert os.path.exists(tmp_path / "vggish_tpu.npz")  # bundle cached

    t = np.linspace(0, 2.0, 32000, dtype=np.float32)
    bg, ev = tmp_path / "bg", tmp_path / "ev"
    os.makedirs(bg)
    os.makedirs(ev)
    for i in range(2):
        write_wav(str(bg / f"{i}.wav"), np.sin(2 * np.pi * (440 + 5 * i) * t) * 0.5, 16000)
        write_wav(str(ev / f"{i}.wav"), np.sin(2 * np.pi * (880 + 5 * i) * t) * 0.5, 16000)
    score = fad.score(str(bg), str(ev))
    assert np.isfinite(score) and score > 0

    # And the embeddings equal the torch artifact's own outputs.
    x = np.random.default_rng(2).standard_normal((2, 96, 64)).astype(np.float32)
    from frechet_audio_distance_exported_tpu.models.vggish import vggish_forward

    ours = np.asarray(vggish_forward(fad.params, x))
    with torch.no_grad():
        theirs = model(torch.from_numpy(x[:, None])).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
