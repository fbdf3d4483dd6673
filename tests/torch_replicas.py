"""Shared torch replicas of the reference model architectures, used by the
round-trip tests (test_tools.py), the hermetic model-parity tests
(test_clap_torch_parity.py), and the reference-code-in-the-loop e2e parity
tests (test_reference_e2e_parity.py).

- ``SEANetLike``: Meta encodec's SEANetEncoder with the exact SConv1d
  (NormConv1d + math.ceil reflect padding) semantics of the reference's
  traced artifacts (reference scripts/export_encodec.py:146-168; weight_norm
  + causal for 24k, GroupNorm + non-causal stereo for 48k).
- ``torch_clap_forward``: the exported CLAP audio path (bicubic interp
  align_corners=True, bn0, reshape_wav2img, HTSAT-tiny Swin, projection,
  L2 norm — reference scripts/export_clap.py:88-150) evaluated with torch's
  own kernels on OUR param pytree.
- ``load_vggish_weights`` / ``load_pann_weights``: copy our param pytrees
  into the reference package's own VGGishCore / PANNCore torch modules.

Import only under ``pytest.importorskip("torch")``.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Encodec SEANet replica (state-dict layout identical to Meta encodec)
# ---------------------------------------------------------------------------


class SConv1dLike(nn.Module):
    """Reproduces encodec's SConv1d(NormConv1d(Conv1d)) state-dict layout."""

    class _NormConv(nn.Module):
        def __init__(self, cin, cout, k, stride, weight_norm, group_norm):
            super().__init__()
            conv = nn.Conv1d(cin, cout, k, stride=stride)
            if weight_norm:
                conv = nn.utils.weight_norm(conv)
            self.conv = conv
            self.norm = nn.GroupNorm(1, cout) if group_norm else nn.Identity()

        def forward(self, x):
            return self.norm(self.conv(x))

    def __init__(self, cin, cout, k, stride=1, causal=True):
        super().__init__()
        self.kernel = k
        self.stride = stride
        self.causal = causal
        self.conv = self._NormConv(
            cin, cout, k, stride, weight_norm=causal, group_norm=not causal
        )

    def forward(self, x):
        L = x.shape[-1]
        p = self.kernel - self.stride
        n_frames = (L - self.kernel + p) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (self.kernel - p)
        extra = ideal - L
        if self.causal:
            left, right = p, extra
        else:
            right = p // 2
            left, right = p - right, right + extra
        return self.conv(F.pad(x, (left, right), mode="reflect"))


class ResBlockLike(nn.Module):
    def __init__(self, dim, causal):
        super().__init__()
        self.block = nn.Sequential(
            nn.ELU(),
            SConv1dLike(dim, dim // 2, 3, causal=causal),
            nn.ELU(),
            SConv1dLike(dim // 2, dim, 1, causal=causal),
        )
        self.shortcut = SConv1dLike(dim, dim, 1, causal=causal)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SLSTMLike(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers=2)

    def forward(self, x):
        x = x.permute(2, 0, 1)
        y, _ = self.lstm(x)
        return (y + x).permute(1, 2, 0)


class SEANetLike(nn.Module):
    def __init__(self, channels, causal):
        super().__init__()
        layers = [SConv1dLike(channels, 32, 7, causal=causal)]
        mult = 1
        for ratio in (2, 4, 5, 8):
            dim = 32 * mult
            layers += [
                ResBlockLike(dim, causal),
                nn.ELU(),
                SConv1dLike(dim, 2 * dim, 2 * ratio, stride=ratio, causal=causal),
            ]
            mult *= 2
        layers += [SLSTMLike(512), nn.ELU(), SConv1dLike(512, 128, 7, causal=causal)]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


# ---------------------------------------------------------------------------
# CLAP HTSAT-tiny forward with torch kernels on our param pytree
# ---------------------------------------------------------------------------


def _np(p):
    return np.asarray(p)


def window_partition_t(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, c)


def window_reverse_t(windows, ws, h, w):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


def torch_clap_forward(params, log_mel_np):
    """Independent torch forward of the CLAP audio path using OUR params."""
    from frechet_audio_distance_exported_tpu.models import clap as jclap

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
            windows = window_partition_t(h, ws)
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
                mwin = window_partition_t(img, ws).view(-1, n)
                amask = (mwin[:, None] - mwin[:, :, None]).ne(0).float() * -100.0
                nw = amask.shape[0]
                attn = attn.view(-1, nw, heads, n, n) + amask[None, :, None]
                attn = attn.view(-1, heads, n, n)
            attn = attn.softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(-1, n, c)
            out = out @ torch.from_numpy(_np(blk["proj"]["w"])) + torch.from_numpy(
                _np(blk["proj"]["b"]))
            h = window_reverse_t(out, ws, res, res)
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


class ClapModuleLike(nn.Module):
    """nn.Module facade over ``torch_clap_forward`` so the reference's own
    ``fad.py`` CLAP branch can call ``self.model(preprocessed)`` on a
    [1, 1, 1001, 64] tensor and get a [1, 512] tensor back — the call
    contract of the exported ``clap_exported.pt2`` artifact."""

    def __init__(self, params):
        super().__init__()
        self.params = params

    def forward(self, x):
        out = torch_clap_forward(self.params, x[:, 0].detach().numpy())
        return torch.from_numpy(out)


# ---------------------------------------------------------------------------
# Weight copy into the reference package's own torch modules
# ---------------------------------------------------------------------------


def load_vggish_weights(model, params):
    """Copy our VGGish param pytree into the reference's VGGishCore."""
    with torch.no_grad():
        conv_i = 0
        for m in model.features:
            if isinstance(m, nn.Conv2d):
                p = params["features"][conv_i]
                m.weight.copy_(torch.from_numpy(_np(p["w"]).transpose(3, 2, 0, 1).copy()))
                m.bias.copy_(torch.from_numpy(_np(p["b"])))
                conv_i += 1
        lin_i = 0
        for m in model.embeddings:
            if isinstance(m, nn.Linear):
                p = params["embeddings"][lin_i]
                m.weight.copy_(torch.from_numpy(_np(p["w"]).T.copy()))
                m.bias.copy_(torch.from_numpy(_np(p["b"])))
                lin_i += 1
        assert conv_i == 6 and lin_i == 3


def load_pann_weights(model, params):
    """Copy our PANN CNN14 param pytree into the reference's PANNCore."""

    def load_bn(bn, q):
        bn.weight.copy_(torch.from_numpy(_np(q["gamma"])))
        bn.bias.copy_(torch.from_numpy(_np(q["beta"])))
        bn.running_mean.copy_(torch.from_numpy(_np(q["mean"])))
        bn.running_var.copy_(torch.from_numpy(_np(q["var"])))

    with torch.no_grad():
        load_bn(model.bn0, params["bn0"])
        for i in range(1, 7):
            blk = getattr(model, f"conv_block{i}")
            p = params["blocks"][i - 1]
            blk.conv1.weight.copy_(
                torch.from_numpy(_np(p["conv1"]["w"]).transpose(3, 2, 0, 1).copy()))
            blk.conv2.weight.copy_(
                torch.from_numpy(_np(p["conv2"]["w"]).transpose(3, 2, 0, 1).copy()))
            load_bn(blk.bn1, p["bn1"])
            load_bn(blk.bn2, p["bn2"])
        model.fc1.weight.copy_(torch.from_numpy(_np(params["fc1"]["w"]).T.copy()))
        model.fc1.bias.copy_(torch.from_numpy(_np(params["fc1"]["b"])))
