"""Fused Swin window-attention Pallas kernel (CLAP HTSAT stages).

Motivation (round 2d profile, v5e, B=32): CLAP step time is dominated by
stage 1's window attention, whose XLA lowering materializes ~600 MB of
awkwardly-laid-out intermediates per block (q/k/v transposes with a
24-element minor dim, [BW, H, 64, 64] float32 logits) and runs at ~250 GB/s
effective — ~2.9 ms per block for ~3 GFLOP of arithmetic. This kernel fuses
LayerNorm -> qkv -> per-head attention (bias + mask + softmax) -> output
projection -> residual for a group of windows per grid cell, keeping every
intermediate in VMEM.

Layout contract (one attention layer):
  x_windows : [BW, N, C]   partitioned windows (BW = batch * windows/image)
  w_qkv     : [C, 3C]      b_qkv [3C]
  w_proj    : [C, C]       b_proj [C]
  bias      : [H, N, N]    relative-position bias, f32 (precomputed gather)
  mask      : [nW, N, N]   shifted-window additive mask, f32 (zeros when
                           the layer is unshifted; indexed by window-in-image)
  out       : [BW, N, C]   x + proj(attention(LN(x)))  — the attention
                           half-block; the MLP half stays in XLA where its
                           [L, C] x [C, 4C] matmuls are already efficient.

N = 64 (window 8x8) and head_dim = C/H = 24 for every HTSAT-tiny stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
            g1_ref, b1_ref, out_ref, *, heads: int, group: int):
    """One grid cell: `group` windows, all heads, fully fused in VMEM."""
    g_win, n, c = x_ref.shape
    hd = c // heads
    x = x_ref[:].reshape(g_win * n, c)

    # LayerNorm (f32 moments, bf16 re-entry — matches models.common.layer_norm).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)

    qkv = jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(x.dtype)
    qkv = qkv.reshape(g_win, n, 3 * c)

    scale = jnp.float32(hd) ** -0.5
    out_heads = []
    for g in range(group):
        q_g = qkv[g, :, :c]
        k_g = qkv[g, :, c:2 * c]
        v_g = qkv[g, :, 2 * c:]
        per_head = []
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            # logits = q . k^T via a last-dim contraction (no transpose).
            logits = jax.lax.dot_general(
                q_g[:, sl], k_g[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            logits = logits + bias_ref[hh] + mask_ref[g if mask_ref.shape[0] > 1 else 0]
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            per_head.append(
                jax.lax.dot_general(
                    p, v_g[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )
        out_heads.append(jnp.concatenate(per_head, axis=-1))  # [N, C]
    attn = jnp.stack(out_heads, axis=0).reshape(g_win * n, c)

    y = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    y = y + bproj_ref[:].astype(jnp.float32)
    out_ref[:] = (x.astype(jnp.float32) + y).astype(x.dtype).reshape(g_win, n, c)


@functools.partial(
    jax.jit, static_argnames=("heads", "num_windows", "group", "interpret")
)
def window_attention_fused(
    x_windows: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    gamma1: jnp.ndarray,
    beta1: jnp.ndarray,
    heads: int,
    num_windows: int,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + proj(attn(LN(x))) over partitioned windows. mask: [nW, N, N] f32
    (zeros for unshifted layers); num_windows = windows per image (nW)."""
    bw, n, c = x_windows.shape
    group = min(group, num_windows)
    assert bw % group == 0 and num_windows % group == 0, (bw, num_windows, group)
    if mask.shape[0] == 1:  # unshifted layer: one zero mask broadcast to all
        mask_block, mask_index = 1, (lambda i: (0, 0, 0))
    else:
        mask_cells = num_windows // group
        mask_block, mask_index = group, (lambda i: (i % mask_cells, 0, 0))

    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, group=group),
        grid=(bw // group,),
        in_specs=[
            pl.BlockSpec((group, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0)),
            pl.BlockSpec((mask_block, n, n), mask_index),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((group, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
        interpret=interpret,
    )(x_windows, w_qkv, b_qkv, w_proj, b_proj, bias, mask, gamma1, beta1)
