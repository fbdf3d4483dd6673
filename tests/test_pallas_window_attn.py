"""Fused Pallas window-attention kernel vs the XLA assembly it replaces
(interpret mode on CPU). The kernel fuses LN1 -> qkv -> per-head attention
(bias + shift mask + softmax) -> projection -> residual for the CLAP Swin
blocks; measured 1.7x the XLA assembly on v5e stage-1 shapes (TODO.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frechet_audio_distance_exported_tpu.models import clap as M
from frechet_audio_distance_exported_tpu.models import common
from frechet_audio_distance_exported_tpu.ops.pallas_window_attn import (
    window_attention_fused,
)

H, N, C, WS, RES = 4, 64, 96, 8, 64
NW = (RES // WS) ** 2


def _inputs(dtype=jnp.float32, b=2):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bw = b * NW
    return {
        "x": (jax.random.normal(ks[0], (bw, N, C), jnp.float32) * 0.5).astype(dtype),
        "wqkv": (jax.random.normal(ks[1], (C, 3 * C), jnp.float32) * 0.05).astype(dtype),
        "bqkv": (jax.random.normal(ks[2], (3 * C,), jnp.float32) * 0.01).astype(dtype),
        "wproj": (jax.random.normal(ks[3], (C, C), jnp.float32) * 0.05).astype(dtype),
        "bproj": (jax.random.normal(ks[4], (C,), jnp.float32) * 0.01).astype(dtype),
        "g1": (1.0 + 0.1 * jax.random.normal(ks[5], (C,), jnp.float32)).astype(dtype),
        "b1": (0.1 * jax.random.normal(ks[6], (C,), jnp.float32)).astype(dtype),
        "rel_bias": jax.random.normal(ks[7], ((2 * WS - 1) ** 2, H), jnp.float32) * 0.1,
    }


def _gathered_bias(rel_bias):
    return M._gathered_rel_bias(jnp.asarray(rel_bias), WS, H)


def _xla_reference(i, mask):
    p = {
        "qkv": {"w": i["wqkv"], "b": i["bqkv"]},
        "proj": {"w": i["wproj"], "b": i["bproj"]},
        "rel_bias": i["rel_bias"],
    }
    h = common.layer_norm(i["x"], i["g1"], i["b1"])
    return i["x"] + M._window_attention(p, h, H, WS, mask)


@pytest.mark.parametrize("shifted", [False, True])
@pytest.mark.parametrize("group", [1, 2, 4])
def test_fused_matches_xla(shifted, group):
    i = _inputs()
    if shifted:
        mask_np = M._shift_attn_mask(RES, WS, WS // 2)
        mask = jnp.asarray(mask_np, jnp.float32)
    else:
        mask_np = None
        mask = jnp.zeros((1, N, N), jnp.float32)
    fused = window_attention_fused(
        i["x"], i["wqkv"], i["bqkv"], i["wproj"], i["bproj"],
        _gathered_bias(i["rel_bias"]), mask, i["g1"], i["b1"],
        heads=H, num_windows=NW, group=group, interpret=True,
    )
    ref = _xla_reference(i, mask_np)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)


def test_swin_block_fused_path_matches_xla_path(monkeypatch):
    """The full _swin_block with the fused attention half (forced on via the
    interpret-capable kernel) equals the default XLA block."""
    params = M.init_clap_params(jax.random.PRNGKey(1))
    blk = params["stages"][0]["blocks"][1]  # shifted block
    b, res, heads = 2, M._STAGE_RES[0], M.NUM_HEADS[0]
    x = jax.random.normal(jax.random.PRNGKey(2), (b, res * res, C), jnp.float32) * 0.5

    ref = M._swin_block(blk, x, res, heads, M.WINDOW_SIZE // 2, mode="xla")

    # Build the fused half manually in interpret mode, then the MLP half.
    import frechet_audio_distance_exported_tpu.ops.pallas_window_attn as W

    orig = W.window_attention_fused

    def interp_kernel(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(W, "window_attention_fused", interp_kernel)
    fused = M._swin_block(blk, x, res, heads, M.WINDOW_SIZE // 2, mode="fused")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("shift", [0, WS // 2])
def test_whole_block_fused_matches_xla_path(monkeypatch, shift):
    """The whole-block kernel (attention + MLP halves in one pallas_call)
    equals the default XLA block."""
    import frechet_audio_distance_exported_tpu.ops.pallas_window_attn as W

    params = M.init_clap_params(jax.random.PRNGKey(3))
    blk = params["stages"][0]["blocks"][1 if shift else 0]
    b, res, heads = 2, M._STAGE_RES[0], M.NUM_HEADS[0]
    x = jax.random.normal(jax.random.PRNGKey(4), (b, res * res, C), jnp.float32) * 0.5

    ref = M._swin_block(blk, x, res, heads, shift, mode="xla")

    orig = W.swin_block_fused

    def interp_kernel(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(W, "swin_block_fused", interp_kernel)
    fused = M._swin_block(blk, x, res, heads, shift, mode="fused_block")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-6)
