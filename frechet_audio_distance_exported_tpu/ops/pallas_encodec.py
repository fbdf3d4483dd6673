"""Fused Pallas kernels for the Encodec SEANet conv stages.

Why this exists (encodec-48k is the fleet outlier, 18.8 audio-min/s/chip):
the 48 kHz variant runs GroupNorm(1, C) after EVERY conv, and XLA's lowering
of the chain pays, per padded conv, a reflect-pad materialization (reverse+
concat writes a full [B, T, C] copy), a conv read/write, a GN moments read,
and a GN normalize read+write — the round-3 profile (TODO.md) shows stage
1+2 alone at 106 ms of the 149.8 ms step, almost all of it HBM traffic on
[16, 480k, C] tensors. Folding zero padding into the conv measured a 1.38x
ceiling (149.6 -> 108.1 ms) but every XLA-side edge fixup re-materializes a
full activation pass and erases the win (scripts/exp_pad_fold.py).

These kernels capture that ceiling the only way XLA can't: by computing the
reflect edges INSIDE the conv kernel. Three observations make the design:

1. GroupNorm(1, C) normalizes over ALL (T, C) per sample, so its effect is a
   per-(sample, channel) affine y*scale[b,c] + shift[b,c]. The affine needs
   global moments (a barrier), but it can be applied lazily as the PROLOG of
   whatever kernel reads the tensor next — so each kernel here fuses
   [previous GN affine] -> [optional ELU] -> reflect-padded conv -> output
   write + masked (sum, sum-of-squares) channel moments for its OWN GN, and
   no tensor is ever read or written just to normalize it.
2. All the res-block convs are stride 1, so a time-tiled kernel needs only a
   (k-1)-row halo. Inter-kernel tensors use a FRONT-PADDED STORE layout:
   valid row u of the logical [B, T, C] tensor lives at store row FP + u
   (FP = 8, one sublane tile). Every Element block start is then
   t*tile >= 0 and divisible by 8 — Mosaic rejects negative starts and
   cannot prove divisibility through max()/select (probed: HTTP 500 compiler
   crash, scripts/exp_mosaic_probe_r4*.py) — and the reflect rows are fixed
   in-VMEM by the first/last grid cells (lax.cond on program_id compiles
   fine).
3. The strided downsample convs stay in XLA: Mosaic supports neither strided
   sublane slices nor sublane->lane reshapes (probed, same scripts), and the
   down conv's input is an ELEMENTWISE combination of two kernel outputs, so
   XLA fuses the reflect-pad gather into the z build (no extra pass), takes
   zero low-padding to emit the FP front rows for free, and its GN moments
   are one slice-read. models/encodec.py owns that glue.

Numerics: dots run at Mosaic DEFAULT (one bf16 MXU pass) or HIGHEST (f32
emulation) — Mosaic has no HIGH. The XLA path ships HIGH (bf16x3), so the
kernel is either slightly less or slightly more exact than the path it
replaces; the FAD-level acceptance gate lives in
scripts/exp_fused_encodec_fad.py and the default is wired in
models/encodec.py. Interpret mode (CPU tests) computes exact f32.

Reference behavior reproduced: Meta encodec's SConv1d asymmetric math.ceil
reflect padding (reference scripts/export_encodec.py:231-239) and
nn.GroupNorm(1, C) 'time_group_norm' (48 kHz variant) — see
models/encodec.py for the layer map.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

FP = 8  # front-pad rows of the inter-kernel store layout (one sublane tile)
_BACK = 8  # back slack so the last halo block stays in bounds


def store_width(T: int, tile: int) -> int:
    """Store rows for a logical length-T tensor tiled by `tile`."""
    t_pad = -(-T // tile) * tile
    return FP + t_pad + _BACK


def to_store(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    """[B, T, C] -> front-padded store [B, store_width(T), C] (one XLA pad;
    only used for the tiny waveform entry — kernel outputs are born padded)."""
    T = x.shape[1]
    return jnp.pad(x, ((0, 0), (FP, store_width(T, tile) - FP - T), (0, 0)))


def from_store(x_store: jnp.ndarray, T: int) -> jnp.ndarray:
    """Valid [B, T, C] view of a store (a slice; fuses into consumers)."""
    return x_store[:, FP : FP + T]


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    """ELU without expm1 (Mosaic has no expm1 primitive — measured
    NotImplementedError, same class as the missing erf the Swin kernel works
    around). exp(min(x,0))-1 loses only ~1 ulp(1) absolute near 0 vs expm1."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _row_fix(rows: jnp.ndarray, fixes):
    """Overwrite row dst with row src (static indices) via iota selects."""
    if not fixes:
        return rows
    ii = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    for dst, src in fixes:
        rows = jnp.where(ii == dst, rows[src], rows)
    return rows


def _reflect_idx(i: int, T: int) -> int:
    """NumPy 'reflect' (no edge repeat) index for any out-of-range i. The
    multi-bounce case (|i| >= T) only arises at tiny T where the whole
    tensor is one grid cell, so the source row is always in-block."""
    if T == 1:
        return 0
    period = 2 * T - 2
    i = i % period
    return i if i < T else period - i


def _reflect_fixed(rows, t, n_t, left: int, right: int, T: int, tile: int):
    """Apply front/back reflect fixes to a halo block (store layout).

    Front (cell 0): x[-q] := x[q]  -> local FP-q := FP+q, q in [1, left].
    Back (cell n_t-1): x[T-1+q] := x[T-1-q], q in [1, right]; local of x[u]
    in the last cell is u - (n_t-1)*tile + FP.

    When the last cell holds fewer than `right` valid rows (t_loc <= right-1,
    e.g. T = k*tile + 1 under the non-causal k=7 conv's right=3), the
    PENULTIMATE cell's tap reads reach past T into the reflect region too —
    it gets the same fixes at local offsets shifted by one tile. Reflect
    commutes with the per-(sample, channel) affine/ELU prologs, so fixing
    after them is exact. (Shipped 10 s buckets divide their tiles exactly
    and never take this branch; arbitrary-length audio does.)
    """
    front = [(FP - q, FP + _reflect_idx(-q, T)) for q in range(1, left + 1)]
    t_loc = T - (n_t - 1) * tile  # valid rows in the last cell (1..tile)
    base = (n_t - 1) * tile
    back = [
        (FP + t_loc - 1 + q, FP + _reflect_idx(T - 1 + q, T) - base)
        for q in range(1, right + 1)
    ]
    if front:
        rows = jax.lax.cond(t == 0, lambda r: _row_fix(r, front), lambda r: r, rows)
    if back:
        rows = jax.lax.cond(
            t == n_t - 1, lambda r: _row_fix(r, back), lambda r: r, rows
        )
        if n_t >= 2 and t_loc <= right - 1:
            back_prev = [(dst + tile, src + tile) for dst, src in back]
            rows = jax.lax.cond(
                t == n_t - 2, lambda r: _row_fix(r, back_prev), lambda r: r, rows
            )
    return rows


def _masked_sums(y: jnp.ndarray, t, T: int, tile: int):
    """[tile, C] -> [1, 2C] masked (sum, sum_sq) over valid rows (where-mask,
    not multiply: tail rows can hold Inf/NaN from uninitialized store slack)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    valid = ii < (T - t * tile)
    ym = jnp.where(valid, y, 0.0)
    s = jnp.sum(ym, axis=0, keepdims=True)
    ss = jnp.sum(ym * ym, axis=0, keepdims=True)
    return jnp.concatenate([s, ss], axis=1)


def _taps_dot(rows, w_taps, k: int, off: int, tile: int, precision):
    """Σ_j rows[off+j : off+j+tile] @ w_taps[j]; w_taps [k, Cin, Cout]."""
    acc = None
    for j in range(k):
        term = jnp.dot(
            rows[off + j : off + j + tile],
            w_taps[j],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        acc = term if acc is None else acc + term
    return acc


def _affine_prolog(rows, scale_ref, shift_ref):
    """rows * scale[b] + shift[b] ([1, C] blocks of the [B, C] affines)."""
    if scale_ref is None:
        return rows
    return rows * scale_ref[0] + shift_ref[0]


def _grid_specs(T, tile, C_in):
    from jax.experimental import pallas as pl

    n_t = -(-T // tile)
    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile + FP + _BACK), pl.Element(C_in)),
        lambda b, t: (b, t * tile, 0),
    )
    # Affines ride as [B, 1, C]: block (1, 1, C) has its last two dims equal
    # to the array's, which the TPU lowering accepts for any C.
    aff_spec = pl.BlockSpec((1, 1, C_in), lambda b, t: (b, 0, 0))
    return n_t, in_spec, aff_spec


def _store_out_spec(tile: int, C: int):
    """Element out-spec writing grid cell t at store rows [FP + t*tile, ...).

    NOTE: the start MUST stay in this mul-by-8 form — Mosaic's divisibility
    prover accepts 8*(1 + t*(tile//8)) but crashes (remote-compile HTTP 500)
    on the arithmetically equal FP + t*tile (probed:
    scripts/exp_mosaic_probe_r4c.py). FP == 8 == one sublane tile.
    """
    from jax.experimental import pallas as pl

    return pl.BlockSpec(
        (pl.Element(1), pl.Element(tile), pl.Element(C)),
        lambda b, t: (b, FP * (1 + t * (tile // 8)), 0),
    )


def _sums_spec(C: int):
    from jax.experimental import pallas as pl

    return pl.BlockSpec((1, 1, 2 * C), lambda b, t: (b, 0, 0))


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "left", "right", "T", "tile", "pre_elu", "gn", "interpret", "precision"
    ),
)
def fused_sconv(
    x_store: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    scale: jnp.ndarray | None,
    shift: jnp.ndarray | None,
    *,
    k: int,
    left: int,
    right: int,
    T: int,
    tile: int,
    pre_elu: bool,
    gn: bool,
    interpret: bool = False,
    precision=None,
):
    """One fused stride-1 conv: [prev-GN affine] -> [elu] -> reflect conv.

    x_store: [B, store_width(T, tile), C_in] (front-padded store layout)
    w: [k, C_in, C_out] (WIO), b: [C_out]
    scale/shift: [B, C_in] per-sample-per-channel affine (or None)
    Returns (y_store [B, store_width, C_out], sums [B, 1, 2*C_out] | None):
    sums are the masked per-channel (Σy, Σy²) for this conv's own GroupNorm.
    """
    from jax.experimental import pallas as pl

    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    B, store_w, C_in = x_store.shape
    C_out = w.shape[-1]
    assert store_w == store_width(T, tile), (store_w, store_width(T, tile))
    assert left <= FP and right <= _BACK - (k - 1 - left), (left, right, k)
    n_t, in_spec, aff_spec = _grid_specs(T, tile, C_in)
    t_pad = n_t * tile

    def kernel(*refs):
        if scale is None:
            x_ref, w_ref, b_ref = refs[:3]
            out_refs = refs[3:]
            sc_ref = sh_ref = None
        else:
            x_ref, w_ref, b_ref, sc_ref, sh_ref = refs[:5]
            out_refs = refs[5:]
        t = pl.program_id(1)
        rows = x_ref[0].astype(jnp.float32)
        rows = _affine_prolog(rows, sc_ref, sh_ref)
        if pre_elu:
            rows = _elu(rows)
        rows = _reflect_fixed(rows, t, n_t, left, right, T, tile)
        y = _taps_dot(rows, w_ref, k, FP - left, tile, precision) + b_ref[:]
        out_refs[0][0] = y
        if gn:
            sums = _masked_sums(y, t, T, tile)
            @pl.when(t == 0)
            def _init():
                out_refs[1][0] = sums
            @pl.when(t != 0)
            def _acc():
                out_refs[1][0] += sums

    in_specs = [in_spec, pl.BlockSpec(memory_space=_vmem()), pl.BlockSpec(memory_space=_vmem())]
    args = [x_store, w, b]
    if scale is not None:
        in_specs += [aff_spec, aff_spec]
        args += [scale, shift]
    out_specs = [_store_out_spec(tile, C_out)]
    out_shape = [jax.ShapeDtypeStruct((B, FP + t_pad + _BACK, C_out), jnp.float32)]
    if gn:
        out_specs.append(_sums_spec(C_out))
        out_shape.append(jax.ShapeDtypeStruct((B, 1, 2 * C_out), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if gn:
        return res[0], res[1]
    return (res if not isinstance(res, (list, tuple)) else res[0]), None


@functools.partial(
    jax.jit,
    static_argnames=("left", "right", "T", "tile", "gn", "interpret", "precision"),
)
def fused_res_front(
    x_store: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    ws: jnp.ndarray,
    bs: jnp.ndarray,
    scale: jnp.ndarray | None,
    shift: jnp.ndarray | None,
    *,
    left: int,
    right: int,
    T: int,
    tile: int,
    gn: bool,
    interpret: bool = False,
    precision=None,
):
    """Res-block front: ONE read of the stage input x produces BOTH
    h1 = conv_k3(elu(affine(x))) and hs = conv_k1(affine(x)) (the shortcut),
    plus both GN moment sets. Saves the second full read of x.

    w1: [3, C, C/2], ws: [1, C, C] (shortcut k=1).
    Returns (h1_store, hs_store, sums1 | None, sums_s | None).
    """
    from jax.experimental import pallas as pl

    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    B, store_w, C = x_store.shape
    k = w1.shape[0]
    C_half = w1.shape[-1]
    C_s = ws.shape[-1]
    assert store_w == store_width(T, tile)
    n_t, in_spec, aff_spec = _grid_specs(T, tile, C)
    t_pad = n_t * tile

    def kernel(*refs):
        if scale is None:
            x_ref, w1_ref, b1_ref, ws_ref, bs_ref = refs[:5]
            out_refs = refs[5:]
            sc_ref = sh_ref = None
        else:
            x_ref, w1_ref, b1_ref, ws_ref, bs_ref, sc_ref, sh_ref = refs[:7]
            out_refs = refs[7:]
        t = pl.program_id(1)
        rows = x_ref[0].astype(jnp.float32)
        rows = _affine_prolog(rows, sc_ref, sh_ref)
        e = _elu(rows)
        e = _reflect_fixed(e, t, n_t, left, right, T, tile)
        h1 = _taps_dot(e, w1_ref, k, FP - left, tile, precision) + b1_ref[:]
        hs = (
            jnp.dot(
                rows[FP : FP + tile],
                ws_ref[0],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            + bs_ref[:]
        )
        out_refs[0][0] = h1
        out_refs[1][0] = hs
        if gn:
            s1 = _masked_sums(h1, t, T, tile)
            s2 = _masked_sums(hs, t, T, tile)
            @pl.when(t == 0)
            def _init():
                out_refs[2][0] = s1
                out_refs[3][0] = s2
            @pl.when(t != 0)
            def _acc():
                out_refs[2][0] += s1
                out_refs[3][0] += s2

    in_specs = [
        in_spec,
        pl.BlockSpec(memory_space=_vmem()),
        pl.BlockSpec(memory_space=_vmem()),
        pl.BlockSpec(memory_space=_vmem()),
        pl.BlockSpec(memory_space=_vmem()),
    ]
    args = [x_store, w1, b1, ws, bs]
    if scale is not None:
        in_specs += [aff_spec, aff_spec]
        args += [scale, shift]
    out_specs = [_store_out_spec(tile, C_half), _store_out_spec(tile, C_s)]
    out_shape = [
        jax.ShapeDtypeStruct((B, FP + t_pad + _BACK, C_half), jnp.float32),
        jax.ShapeDtypeStruct((B, FP + t_pad + _BACK, C_s), jnp.float32),
    ]
    if gn:
        out_specs += [_sums_spec(C_half), _sums_spec(C_s)]
        out_shape += [
            jax.ShapeDtypeStruct((B, 1, 2 * C_half), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2 * C_s), jnp.float32),
        ]
    res = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if gn:
        return res[0], res[1], res[2], res[3]
    return res[0], res[1], None, None


def _vmem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM


def gn_affine_from_sums(
    sums: jnp.ndarray, T: int, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5
):
    """[B, 1, 2C] masked channel sums -> the GroupNorm(1, C) per-sample
    affine (scale, shift), each [B, C]. Matches common.group_norm_full's
    one-pass (Σx, Σx²) float32 moments exactly (same cancellation form)."""
    C = sums.shape[-1] // 2
    s = jnp.sum(sums[:, 0, :C], axis=-1)  # [B]
    ss = jnp.sum(sums[:, 0, C:], axis=-1)
    n = T * C
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # [B]
    # [B, 1, C] so the arrays feed both XLA broadcasts and the kernels'
    # (1, 1, C) affine blocks directly.
    scale = inv[:, None, None] * gamma[None, None, :].astype(jnp.float32)
    shift = beta[None, None, :].astype(jnp.float32) - mean[:, None, None] * scale
    return scale, shift


def masked_channel_sums(y: jnp.ndarray) -> jnp.ndarray:
    """XLA-side (Σ, Σ²) channel sums of a valid [B, T, C] slice, in the
    [B, 1, 2C] layout gn_affine_from_sums expects (for the XLA down convs)."""
    yf = y.astype(jnp.float32)
    s = jnp.sum(yf, axis=1, keepdims=True)
    ss = jnp.sum(yf * yf, axis=1, keepdims=True)
    return jnp.concatenate([s, ss], axis=-1)
