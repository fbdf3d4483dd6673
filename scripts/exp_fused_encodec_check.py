#!/usr/bin/env python
"""CPU interpret-mode exactness check: _encoder_fused vs the XLA stage chain
(both causal/24k-style and non-causal+GN/48k-style), small shapes."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from frechet_audio_distance_exported_tpu.models import encodec as enc
if not hasattr(enc, "_encoder_fused"):
    sys.exit(
        "fused encodec kernel torn out (round-5 hardware rejection); restore with:"
        " git apply -R scripts/patches/fused_encodec_kernel.patch"
    )


def xla_stages(params, x, causal):
    h = enc._sconv(params["conv_in"], x, kernel=7, stride=1, causal=causal)
    for ratio, stage in zip(enc.RATIOS, params["stages"]):
        h = enc._res_block(stage["res"], h, causal)
        h = jax.nn.elu(h)
        h = enc._sconv(stage["down"], h, kernel=2 * ratio, stride=ratio, causal=causal)
    return h


for causal, ch in ((True, 1), (False, 2)):
    for T in (3200, 4800):
        rng = jax.random.PRNGKey(0)
        params = enc.init_encodec_params(rng, causal=causal, channels=ch)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, T, ch), jnp.float32) * 0.3
        ref = np.asarray(xla_stages(params, x, causal))
        got = np.asarray(enc._encoder_fused(params, x, causal, interpret=True))
        err = np.abs(ref - got).max()
        denom = np.abs(ref).max()
        print(f"causal={causal} ch={ch} T={T}: shape ref={ref.shape} got={got.shape} "
              f"max_abs_err={err:.3e} (scale {denom:.3f})", flush=True)
        assert ref.shape == got.shape
        assert err < 5e-5 * max(denom, 1.0), err
print("ALL OK")
