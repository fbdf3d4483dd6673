#!/usr/bin/env python
"""Experiment: fold Encodec's reflect padding into the conv op.

Hypothesis: `jnp.pad(mode="reflect")` before a VALID conv lowers to
reverse+concatenate, which XLA must materialize (convs cannot fuse their
input producers), costing one extra full HBM write+read of the [B, T, C]
activation per padded conv. Folding zero padding into
`conv_general_dilated(padding=((l, r),))` reads the activation directly;
the handful of edge outputs whose receptive field touches the pad are then
recomputed exactly from tiny reflect-padded edge slices and written back
with dynamic-update-slice (in-place on the conv output buffer).

Interior outputs are bitwise identical (zero-pad taps contribute exact
+0.0); edge outputs are recomputed with the reference reflect semantics, so
the whole thing is numerics-exact, not approximate.

Measures the full encodec forward (24k bf16-mixed B=32 and 48k f32 stereo
B=16) with the stock `_sconv` vs the folded variant.

Usage: python scripts/exp_pad_fold.py [--iters 12]
(TPU; run as the only TPU process, background task, internal alarm.)
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sconv_corr(enc, common):
    """Zero-pad folded into the conv + ADDITIVE edge corrections.

    The zero-padded conv is exact except at outputs whose window overlaps a
    pad slot: there it used +0.0 where the reflect pad holds x[|p-left|].
    The missing contribution is linear in a <= pad-wide edge slice of x, so
    one tiny einsum per edge (tap-map weights built at trace time from the
    conv kernel) produces the correction, and `y + zeropad(corr)` is an
    elementwise chain that fuses into y's consumers — no big-tensor copy.
    """
    import jax
    import jax.numpy as jnp

    def _sconv_corr(p, x, kernel, stride, causal):
        left, right = enc._pad_amounts(x.shape[1], kernel, stride, causal)
        t = x.shape[1]
        if not (left or right):
            y = common.conv1d(x, p["w"], p["b"], stride=stride)
        else:
            w = p["w"]
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=((left, right),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
                precision=common.matmul_precision(),
            ).astype(x.dtype)
            if p.get("b") is not None:
                y = y + p["b"]
            t_out = y.shape[1]
            nl = -(-left // stride) if left else 0
            if nl:
                # W_l[j, s-1] = w[d] where pad pos j*stride-left+d reflects
                # to x[s], for taps d inside the pad region
                rows = []
                for j in range(nl):
                    per_src = [None] * left
                    for d in range(min(kernel, left - j * stride)):
                        src = left - j * stride - d  # reflect source, 1..left
                        per_src[src - 1] = w[d]
                    rows.append(jnp.stack([
                        r if r is not None else jnp.zeros_like(w[0])
                        for r in per_src
                    ]))
                wl = jnp.stack(rows)  # [nl, left, Cin, Cout]
                corr = jnp.einsum(
                    "bsc,jsco->bjo", x[:, 1:left + 1].astype(jnp.float32),
                    wl.astype(jnp.float32), precision="highest",
                ).astype(y.dtype)
                y = y + jnp.pad(corr, ((0, 0), (0, t_out - nl), (0, 0)))
            nr = (t_out - 1) - (t + left - kernel) // stride if right else 0
            if nr > 0:
                jr0 = t_out - nr
                rows = []
                for j in range(jr0, t_out):
                    per_src = [None] * right
                    for d in range(kernel):
                        pos = j * stride - left + d
                        if pos >= t:
                            i = pos - (t - 1)  # reflect: x[t-1-i], i=1..right
                            m = right - i      # slice x[:, t-1-right : t-1]
                            per_src[m] = w[d]
                    rows.append(jnp.stack([
                        r if r is not None else jnp.zeros_like(w[0])
                        for r in per_src
                    ]))
                wr = jnp.stack(rows)  # [nr, right, Cin, Cout]
                corr = jnp.einsum(
                    "bsc,jsco->bjo",
                    x[:, t - 1 - right:t - 1].astype(jnp.float32),
                    wr.astype(jnp.float32), precision="highest",
                ).astype(y.dtype)
                y = y + jnp.pad(corr, ((0, 0), (jr0, 0), (0, 0)))
        if "gn" in p:
            y = common.group_norm_full(y, p["gn"]["gamma"], p["gn"]["beta"])
        return y

    return _sconv_corr


def make_sconv_gncorr(enc, common, edges=True, madj=True, zadd=True):
    """Like make_sconv_corr, but for GN convs (the 48k variant) the
    correction never forms a corrected-y intermediate: GroupNorm moments are
    computed from the RAW zero-padded conv output plus tiny analytic
    adjustments (the correction is additive and touches only edge rows:
    Σ(y+e) = Σy + Σe, Σ(y+e)² = Σy² + Σ(2·y_edge·e + e²)), and `+ pad(e)`
    rides inside the single-consumer normalize pass. Avoids the extra full
    [B, T, C] materialization that made make_sconv_corr run at stock speed.
    Non-GN convs fall back to the stock reflect path."""
    import jax
    import jax.numpy as jnp

    corr_conv = make_sconv_corr(enc, common)

    def _edge_corrs(p, x, kernel, stride, causal):
        """(corr_l [B,nl,C] | None, corr_r [B,nr,C] | None, t_out)."""
        left, right = enc._pad_amounts(x.shape[1], kernel, stride, causal)
        t = x.shape[1]
        w = p["w"]
        t_out = (t + left + right - kernel) // stride + 1
        corr_l = corr_r = None
        nl = -(-left // stride) if left else 0
        if nl:
            rows = []
            for j in range(nl):
                per_src = [None] * left
                for d in range(min(kernel, left - j * stride)):
                    src = left - j * stride - d
                    per_src[src - 1] = w[d]
                rows.append(jnp.stack([
                    r if r is not None else jnp.zeros_like(w[0]) for r in per_src
                ]))
            wl = jnp.stack(rows)
            corr_l = jnp.einsum(
                "bsc,jsco->bjo", x[:, 1:left + 1].astype(jnp.float32),
                wl.astype(jnp.float32), precision="highest",
            )
        nr = (t_out - 1) - (t + left - kernel) // stride if right else 0
        if nr > 0:
            jr0 = t_out - nr
            rows = []
            for j in range(jr0, t_out):
                per_src = [None] * right
                for d in range(kernel):
                    pos = j * stride - left + d
                    if pos >= t:
                        per_src[right - (pos - (t - 1))] = w[d]
                rows.append(jnp.stack([
                    r if r is not None else jnp.zeros_like(w[0]) for r in per_src
                ]))
            wr = jnp.stack(rows)
            corr_r = jnp.einsum(
                "bsc,jsco->bjo", x[:, t - 1 - right:t - 1].astype(jnp.float32),
                wr.astype(jnp.float32), precision="highest",
            )
        return corr_l, corr_r, t_out

    def _sconv_gncorr(p, x, kernel, stride, causal):
        left, right = enc._pad_amounts(x.shape[1], kernel, stride, causal)
        if "gn" not in p or not (left or right):
            if not (left or right):
                y = common.conv1d(x, p["w"], p["b"], stride=stride)
                if "gn" in p:
                    y = common.group_norm_full(y, p["gn"]["gamma"], p["gn"]["beta"])
                return y
            return enc._sconv(p, x, kernel, stride, causal)  # stock reflect
        y = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,), padding=((left, right),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
            precision=common.matmul_precision(),
        ).astype(x.dtype)
        if p.get("b") is not None:
            y = y + p["b"]
        if edges:
            corr_l, corr_r, t_out = _edge_corrs(p, x, kernel, stride, causal)
        else:
            corr_l = corr_r = None
            t_out = y.shape[1]
        yf = y.astype(jnp.float32)
        n = y.shape[1] * y.shape[2]
        s1 = jnp.sum(yf, axis=(1, 2))
        s2 = jnp.sum(jnp.square(yf), axis=(1, 2))
        if corr_l is not None and madj:
            nl = corr_l.shape[1]
            ye = yf[:, :nl]
            s1 = s1 + jnp.sum(corr_l, axis=(1, 2))
            s2 = s2 + jnp.sum(2.0 * ye * corr_l + jnp.square(corr_l), axis=(1, 2))
        if corr_r is not None and madj:
            nr = corr_r.shape[1]
            ye = yf[:, t_out - nr:]
            s1 = s1 + jnp.sum(corr_r, axis=(1, 2))
            s2 = s2 + jnp.sum(2.0 * ye * corr_r + jnp.square(corr_r), axis=(1, 2))
        mean = (s1 / n)[:, None, None]
        var = (s2 / n)[:, None, None] - jnp.square(mean)
        inv = jax.lax.rsqrt(var + 1e-5)
        zc = yf
        if corr_l is not None and zadd:
            zc = zc + jnp.pad(corr_l, ((0, 0), (0, t_out - corr_l.shape[1]), (0, 0)))
        if corr_r is not None and zadd:
            zc = zc + jnp.pad(corr_r, ((0, 0), (t_out - corr_r.shape[1], 0), (0, 0)))
        out = (zc - mean) * inv
        out = out * p["gn"]["gamma"].astype(jnp.float32) + p["gn"]["beta"].astype(jnp.float32)
        return out.astype(x.dtype)

    return _sconv_gncorr


def make_sconv_folded(enc, common, fixup="dus"):
    import jax.numpy as jnp

    def _sconv_folded(p, x, kernel, stride, causal):
        left, right = enc._pad_amounts(x.shape[1], kernel, stride, causal)
        t = x.shape[1]
        if not (left or right):
            y = common.conv1d(x, p["w"], p["b"], stride=stride)
        else:
            import jax

            y = jax.lax.conv_general_dilated(
                x,
                p["w"],
                window_strides=(stride,),
                padding=((left, right),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
                precision=common.matmul_precision(),
            ).astype(x.dtype)
            if p.get("b") is not None:
                y = y + p["b"]
            t_out = y.shape[1]
            # Left edge: outputs whose window starts inside the pad.
            nl = -(-left // stride) if left else 0
            if nl:
                el = (nl - 1) * stride + kernel - left  # window coverage
                el = max(el, left + 1)  # reflect source needs left+1 samples
                xe = jnp.pad(x[:, :el], ((0, 0), (left, 0), (0, 0)), mode="reflect")
                yl = common.conv1d(xe, p["w"], p["b"], stride=stride)[:, :nl]
                if fixup == "dus":
                    y = jax.lax.dynamic_update_slice(
                        y, yl.astype(y.dtype), (0, 0, 0)
                    )
                else:  # "where": elementwise select fuses into y's consumers
                    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_out, 1), 1)
                    ylf = jnp.pad(yl.astype(y.dtype), ((0, 0), (0, t_out - nl), (0, 0)))
                    y = jnp.where(idx < nl, ylf, y)
            # Right edge: outputs whose window runs past the original end.
            nr = (t_out - 1) - (t + left - kernel) // stride if right else 0
            if nr > 0:
                jr0 = t_out - nr
                start = jr0 * stride - left
                skip = 0
                # reflect source needs right+1 samples; extend by whole
                # strides so edge-conv windows stay on the global grid
                while t - start < right + 1:
                    start -= stride
                    skip += 1
                xe = jnp.pad(x[:, start:], ((0, 0), (0, right), (0, 0)), mode="reflect")
                yr = common.conv1d(xe, p["w"], p["b"], stride=stride)
                yr = yr[:, skip:skip + nr]
                if fixup == "dus":
                    y = jax.lax.dynamic_update_slice(
                        y, yr.astype(y.dtype), (0, jr0, 0)
                    )
                else:
                    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_out, 1), 1)
                    yrf = jnp.pad(yr.astype(y.dtype), ((0, 0), (jr0, 0), (0, 0)))
                    y = jnp.where(idx >= jr0, yrf, y)
        if "gn" in p:
            y = common.group_norm_full(y, p["gn"]["gamma"], p["gn"]["beta"])
        return y

    return _sconv_folded


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--cpu", action="store_true", help="numerics check only, on CPU")
    args = ap.parse_args()

    signal.alarm(3000)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models import common, encodec as enc

    print(f"backend: {jax.default_backend()}", flush=True)
    folded = make_sconv_gncorr(enc, common)
    corr = make_sconv_corr(enc, common)
    stock = enc._sconv

    # --- numerics: every (kernel, stride, causal) combo the model uses,
    # for BOTH variants, with and without GN (make_sconv_gncorr falls back
    # to the stock path for GN-free convs, so plain-conv params would make
    # its check vacuous — the GN-param leg is the one that exercises it) ---
    rng = np.random.default_rng(0)
    worst = 0.0
    for kernel, stride, causal in [
        (7, 1, True), (7, 1, False), (3, 1, True), (3, 1, False),
        (4, 2, True), (4, 2, False), (8, 4, True), (8, 4, False),
        (10, 5, True), (10, 5, False), (16, 8, True), (16, 8, False),
    ]:
        x = jnp.asarray(rng.standard_normal((2, 400, 8)), jnp.float32)
        for gn in (False, True):
            p = enc._init_sconv(jax.random.PRNGKey(1), kernel, 8, 16, gn)
            if gn:  # non-unit affine so GN normalization errors are visible
                p["gn"]["gamma"] = p["gn"]["gamma"] * 1.7 + 0.3
                p["gn"]["beta"] = p["gn"]["beta"] + 0.1
            a = stock(p, x, kernel, stride, causal)
            for name, variant in (
                ("corr", corr), ("gncorr", folded),
                ("folddus", make_sconv_folded(enc, common, "dus")),
                ("foldwhr", make_sconv_folded(enc, common, "where")),
            ):
                b = variant(p, x, kernel, stride, causal)
                assert a.shape == b.shape, (a.shape, b.shape, kernel, stride, causal)
                d = float(jnp.max(jnp.abs(a - b)))
                worst = max(worst, d)
                # interior outputs are bitwise-identical; edge frames round
                # at the conv's f32(bf16_3x) precision when the sum splits
                # between the zero-padded conv and the correction einsum
                # (~2e-5 on TPU); GN moments add one more rounding.
                assert d < 2e-4, (d, name, gn, kernel, stride, causal)
    print(f"numerics: max |stock - folded| over all conv shapes/variants = "
          f"{worst:.2e}", flush=True)
    if args.cpu:
        return

    # --- timing: full forward, both variants, both families ---
    def run(name, batch, channels, causal, dtype):
        params = enc.init_encodec_params(
            jax.random.PRNGKey(0), causal=causal, channels=channels
        )
        if dtype == jnp.bfloat16:
            # mirror the shipped mixed mode: conv stages bf16, LSTM/out f32
            def cast(p):
                return jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
            params = dict(params, conv_in=cast(params["conv_in"]),
                          stages=[cast(s) for s in params["stages"]])
        t = 480000 if channels == 2 else 240000
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, channels, t),
                              jnp.float32) * 0.3
        def nofix(p, x, kernel, stride, causal):
            # timing diagnostic ONLY (edge outputs wrong): zero padding
            # folded into the conv, no fixup — isolates the pad cost from
            # the DUS fixup cost.
            import jax as _jax
            left, right = enc._pad_amounts(x.shape[1], kernel, stride, causal)
            y = _jax.lax.conv_general_dilated(
                x, p["w"], window_strides=(stride,), padding=((left, right),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
                precision=common.matmul_precision(),
            ).astype(x.dtype)
            if p.get("b") is not None:
                y = y + p["b"]
            if "gn" in p:
                y = common.group_norm_full(y, p["gn"]["gamma"], p["gn"]["beta"])
            return y

        variants = [
            ("stock ", stock),
            ("nofix ", nofix),
            ("folddus", make_sconv_folded(enc, common, "dus")),
            ("foldwhr", make_sconv_folded(enc, common, "where")),
        ]
        if channels == 1:
            variants.append(("corr  ", corr))  # pad-add fixup (no GN at 24k)
        for label, sconv in variants:
            enc._sconv = sconv
            fn = jax.jit(
                lambda acc, w, c=causal: acc
                + jnp.sum(enc.encodec_forward_raw(params, w, c)
                          .astype(jnp.float32))
            )
            acc = jnp.zeros((), jnp.float32)
            acc = fn(acc, x)
            float(acc)
            acc = jnp.zeros((), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc = fn(acc, x)
            float(acc)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            amin = batch * 10.0 / 60.0
            print(f"{name} {label}: {ms:8.2f} ms  "
                  f"({amin / (ms / 1e3):6.1f} audio-min/s/chip)", flush=True)
        enc._sconv = stock

    run("encodec-48k B=16 f32      ", 16, 2, False, jnp.float32)
    run("encodec-24k B=32 mixed    ", 32, 1, True, jnp.bfloat16)


if __name__ == "__main__":
    main()
