"""CLAP HTSAT-tiny torch-parity test.

Builds an independent torch implementation of the exported CLAP audio path
(bicubic time interpolation via torch's own F.interpolate align_corners=True,
bn0, reshape_wav2img, Swin stages with shifted-window attention + relative
position bias + patch merging, final norm, token mean, projection head, L2
normalization — the architecture of reference scripts/export_clap.py:88-150),
loads OUR random params into it, and compares outputs. This is the strongest
hermetic fidelity check available without the 350 MB artifact."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from frechet_audio_distance_exported_tpu.models import clap as jclap  # noqa: E402


def _np(p):
    return np.asarray(p)


def _window_partition_t(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, c)


def _window_reverse_t(windows, ws, h, w):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


def _torch_clap_forward(params, log_mel_np):
    """Independent torch forward using OUR param pytree."""
    ws = jclap.WINDOW_SIZE
    depths, heads_cfg = jclap.DEPTHS, jclap.NUM_HEADS
    x = torch.from_numpy(log_mel_np)[:, None]  # [B, 1, 1001, 64]

    # Bicubic time interpolation: torch's own kernel (the reference op).
    x = F.interpolate(x, (jclap.TARGET_T, 64), mode="bicubic", align_corners=True)

    # bn0 over mel bins (transpose sandwich like the export wrapper).
    bn = params["bn0"]
    x = x.transpose(1, 3)
    x = F.batch_norm(
        x,
        torch.from_numpy(_np(bn["mean"])), torch.from_numpy(_np(bn["var"])),
        torch.from_numpy(_np(bn["gamma"])), torch.from_numpy(_np(bn["beta"])),
        training=False,
    )
    x = x.transpose(1, 3)

    # reshape_wav2img (export_clap.py:136-140).
    B, C, T, freq = x.shape
    x = x.permute(0, 1, 3, 2)
    x = x.reshape(B, C, freq, 4, T // 4)
    x = x.permute(0, 1, 3, 2, 4)
    x = x.reshape(B, C, 256, 256)

    # patch embed.
    pe = params["patch_embed"]
    w = torch.from_numpy(_np(pe["conv"]["w"]).transpose(3, 2, 0, 1).copy())
    x = F.conv2d(x, w, torch.from_numpy(_np(pe["conv"]["b"])), stride=4)
    x = x.flatten(2).transpose(1, 2)  # [B, L, C]
    x = F.layer_norm(x, (96,), torch.from_numpy(_np(pe["norm"]["gamma"])),
                     torch.from_numpy(_np(pe["norm"]["beta"])))

    res = 64
    for i, depth in enumerate(depths):
        heads = heads_cfg[i]
        c = x.shape[-1]
        for j, blk in enumerate(params["stages"][i]["blocks"]):
            shift = 0 if (j % 2 == 0 or res <= ws) else ws // 2
            shortcut = x
            h = F.layer_norm(x, (c,), torch.from_numpy(_np(blk["norm1"]["gamma"])),
                             torch.from_numpy(_np(blk["norm1"]["beta"])))
            h = h.view(-1, res, res, c)
            if shift:
                h = torch.roll(h, (-shift, -shift), dims=(1, 2))
            windows = _window_partition_t(h, ws)
            n = ws * ws
            qkv = windows @ torch.from_numpy(_np(blk["qkv"]["w"])) + torch.from_numpy(
                _np(blk["qkv"]["b"]))
            qkv = qkv.view(-1, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * (c // heads) ** -0.5) @ k.transpose(-2, -1)
            # relative position bias
            coords = torch.stack(torch.meshgrid(
                torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
            rel = coords[:, :, None] - coords[:, None, :]
            rel = rel.permute(1, 2, 0) + (ws - 1)
            idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
            table = torch.from_numpy(_np(blk["rel_bias"]))
            bias = table[idx.view(-1)].view(n, n, heads).permute(2, 0, 1)
            attn = attn + bias[None]
            if shift:
                img = torch.zeros(1, res, res, 1)
                cnt = 0
                for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                        img[:, hs, wsl] = cnt
                        cnt += 1
                mwin = _window_partition_t(img, ws).view(-1, n)
                amask = (mwin[:, None] - mwin[:, :, None]).ne(0).float() * -100.0
                nw = amask.shape[0]
                attn = attn.view(-1, nw, heads, n, n) + amask[None, :, None]
                attn = attn.view(-1, heads, n, n)
            attn = attn.softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(-1, n, c)
            out = out @ torch.from_numpy(_np(blk["proj"]["w"])) + torch.from_numpy(
                _np(blk["proj"]["b"]))
            h = _window_reverse_t(out, ws, res, res)
            if shift:
                h = torch.roll(h, (shift, shift), dims=(1, 2))
            x = shortcut + h.view(-1, res * res, c)
            m = F.layer_norm(x, (c,), torch.from_numpy(_np(blk["norm2"]["gamma"])),
                             torch.from_numpy(_np(blk["norm2"]["beta"])))
            m = m @ torch.from_numpy(_np(blk["mlp"]["fc1"]["w"])) + torch.from_numpy(
                _np(blk["mlp"]["fc1"]["b"]))
            m = F.gelu(m)
            m = m @ torch.from_numpy(_np(blk["mlp"]["fc2"]["w"])) + torch.from_numpy(
                _np(blk["mlp"]["fc2"]["b"]))
            x = x + m
        if "downsample" in params["stages"][i]:
            d = params["stages"][i]["downsample"]
            xv = x.view(-1, res, res, c)
            merged = torch.cat(
                [xv[:, 0::2, 0::2], xv[:, 1::2, 0::2], xv[:, 0::2, 1::2], xv[:, 1::2, 1::2]],
                dim=-1,
            ).view(-1, (res // 2) ** 2, 4 * c)
            merged = F.layer_norm(merged, (4 * c,), torch.from_numpy(_np(d["norm"]["gamma"])),
                                  torch.from_numpy(_np(d["norm"]["beta"])))
            x = merged @ torch.from_numpy(_np(d["reduction"]["w"]))
            res //= 2

    x = F.layer_norm(x, (768,), torch.from_numpy(_np(params["norm"]["gamma"])),
                     torch.from_numpy(_np(params["norm"]["beta"])))
    emb = x.mean(dim=1)
    pr = params["projection"]
    emb = F.relu(emb @ torch.from_numpy(_np(pr["fc1"]["w"])) + torch.from_numpy(_np(pr["fc1"]["b"])))
    emb = emb @ torch.from_numpy(_np(pr["fc2"]["w"])) + torch.from_numpy(_np(pr["fc2"]["b"]))
    return F.normalize(emb, dim=-1).numpy()


def test_clap_matches_torch_replica():
    params = jclap.init_clap_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(0)
    log_mel = (rng.standard_normal((2, 1001, 64)) * 5.0 - 30.0).astype(np.float32)
    ours = np.asarray(jclap.clap_forward(params, log_mel))
    with torch.no_grad():
        theirs = _torch_clap_forward(params, log_mel)
    assert ours.shape == theirs.shape == (2, 512)
    cos = np.sum(ours * theirs, axis=1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
    assert np.all(cos > 0.9999)


def test_bicubic_matrix_matches_torch():
    """The precomputed interpolation matrix == torch bicubic align_corners."""
    m = jclap._bicubic_time_matrix(1001, 1024)
    rng = np.random.default_rng(1)
    sig = rng.standard_normal((1, 1, 1001, 64)).astype(np.float32)
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(sig), (1024, 64), mode="bicubic",
                            align_corners=True).numpy()[0, 0]
    got = m @ sig[0, 0]
    # The dense [1024, 1001] float32 matmul accumulates ~1e-4 noise vs
    # torch's 4-tap kernel evaluation; structure/weights are exact.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_bicubic_taps_reconstruct_dense_matrix():
    """The 4-tap gather decomposition (shipped forward path) scatters back to
    exactly the dense matrix: same indices, same weights, no tap dropped."""
    m = jclap._bicubic_time_matrix(1001, 1024)
    idx, w = jclap._bicubic_taps(1001, 1024)
    rebuilt = np.zeros_like(m)
    for k in range(4):
        np.add.at(rebuilt, (np.arange(1024), idx[:, k]), w[:, k])
    np.testing.assert_array_equal(rebuilt, m)
    # Every row keeps its full mass: bicubic align_corners weights sum to 1.
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_l2_normalize_clamps_zero_embedding():
    """torch F.normalize semantics: an exactly-zero projection output maps to
    the zero vector, not NaN (0/0). Regression: zero-padded batch rows under
    random init embed to zero and poisoned masked device statistics."""
    import jax

    params = jclap.init_clap_params(jax.random.PRNGKey(0))
    zero_mel = np.zeros((1, 1001, 64), np.float32)
    out = np.asarray(jclap.clap_forward(params, zero_mel))
    assert np.isfinite(out).all()
