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


def _attention_half(x, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                    mask_ref, g1_ref, b1_ref, *, heads: int, group: int,
                    g_win: int, n: int, c: int):
    """x [g_win*n, c] -> f32 attention residual x + proj(attn(LN1(x))).

    Shared by the attention-only and whole-block kernels so a fix to the
    attention math applies to both (they are interchangeable via attn=)."""
    hd = c // heads

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
    return x.astype(jnp.float32) + y


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
            g1_ref, b1_ref, out_ref, *, heads: int, group: int):
    """One grid cell: `group` windows, all heads, fully fused in VMEM."""
    g_win, n, c = x_ref.shape
    x = x_ref[:].reshape(g_win * n, c)
    x2f = _attention_half(
        x, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
        g1_ref, b1_ref, heads=heads, group=group, g_win=g_win, n=n, c=c,
    )
    out_ref[:] = x2f.astype(x.dtype).reshape(g_win, n, c)


def _erf_f32(x: jnp.ndarray) -> jnp.ndarray:
    """float32 erf via Abramowitz–Stegun 7.1.26. Mosaic has no erf primitive
    (measured: `jax.lax.erf` fails TPU lowering with NotImplementedError, and
    `jnp.sign` is avoided for the same reason), so the polynomial is used
    unconditionally — including in interpret mode, so tests exercise the
    shipped math. ~1.5e-7 abs accurate: invisible under the kernel's bf16
    output cast (7e-3 ulp) and ~20x below the f32 test tolerance."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.where(x < 0.0, -1.0, 1.0).astype(x.dtype)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _block_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                  mask_ref, g1_ref, b1_ref, g2_ref, b2_ref, wfc1_ref, bfc1_ref,
                  wfc2_ref, bfc2_ref, out_ref, *, heads: int, group: int):
    """One grid cell of the WHOLE Swin block: attention half (shared
    _attention_half, identical math to _kernel) then LN2 -> fc1 -> exact
    GELU -> fc2 -> residual, still in VMEM. The MLP is per-token, so it
    commutes with the window partition / roll permutations — running it in
    window space is exact."""
    g_win, n, c = x_ref.shape
    x = x_ref[:].reshape(g_win * n, c)
    x2f = _attention_half(
        x, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
        g1_ref, b1_ref, heads=heads, group=group, g_win=g_win, n=n, c=c,
    )  # attention residual, f32
    x2 = x2f.astype(x.dtype)

    # MLP half. LN2 moments in f32 over the bf16-rounded residual — matches
    # the XLA path, where layer_norm reads the materialized x2 tensor.
    x2f = x2.astype(jnp.float32)
    mean2 = jnp.mean(x2f, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x2f - mean2), axis=-1, keepdims=True)
    h2 = (x2f - mean2) * jax.lax.rsqrt(var2 + 1e-5)
    h2 = h2 * g2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    h2 = h2.astype(x.dtype)

    m = jnp.dot(h2, wfc1_ref[:], preferred_element_type=jnp.float32)
    m = m + bfc1_ref[:].astype(jnp.float32)
    # exact (erf) GELU in f32, as jax.nn.gelu(approximate=False)
    m = 0.5 * m * (1.0 + _erf_f32(m * jnp.float32(0.7071067811865476)))
    m = m.astype(x.dtype)
    m = jnp.dot(m, wfc2_ref[:], preferred_element_type=jnp.float32)
    m = m + bfc2_ref[:].astype(jnp.float32)
    out_ref[:] = (x2f + m).astype(x.dtype).reshape(g_win, n, c)


@functools.partial(
    jax.jit, static_argnames=("heads", "num_windows", "group", "interpret")
)
def swin_block_fused(
    x_windows: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    gamma1: jnp.ndarray,
    beta1: jnp.ndarray,
    gamma2: jnp.ndarray,
    beta2: jnp.ndarray,
    w_fc1: jnp.ndarray,
    b_fc1: jnp.ndarray,
    w_fc2: jnp.ndarray,
    b_fc2: jnp.ndarray,
    heads: int,
    num_windows: int,
    group: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole pre-norm Swin block over partitioned windows:
    x2 = x + proj(attn(LN1(x))); out = x2 + fc2(gelu(fc1(LN2(x2)))).
    Same layout contract as window_attention_fused plus the MLP params
    (w_fc1 [C, 4C], w_fc2 [4C, C])."""
    bw, n, c = x_windows.shape
    group = min(group, num_windows)
    assert bw % group == 0 and num_windows % group == 0, (bw, num_windows, group)
    if mask.shape[0] == 1:
        mask_block, mask_index = 1, (lambda i: (0, 0, 0))
    else:
        mask_cells = num_windows // group
        mask_block, mask_index = group, (lambda i: (i % mask_cells, 0, 0))

    hidden = w_fc1.shape[1]
    return pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, group=group),
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
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((group, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
        interpret=interpret,
    )(x_windows, w_qkv, b_qkv, w_proj, b_proj, bias, mask, gamma1, beta1,
      gamma2, beta2, w_fc1, b_fc1, w_fc2, b_fc2)


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
