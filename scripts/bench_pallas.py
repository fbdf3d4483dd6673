"""Frontend-only benchmark: the REJECTED fused Pallas log-mel kernel
(scripts/pallas_logmel_rejected.py) vs the shipped XLA strided path
(VERDICT r1 #4 — the default must be backed by numbers; round-2 result:
XLA wins, vggish 386.3 vs 357.9 audio-min/s, pann-16k 141.4 vs 127.7).

    python scripts/bench_pallas.py        # both paths, one process (TPU)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _time(fn, args, iters=12):
    """Chain-dispatch timing: carry a device scalar, fetch once at the end
    (per-step fetches put the tunnel RTT on the critical path)."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda acc, *a: acc + jnp.sum(fn(*a).astype(jnp.float32)))
    acc = jnp.zeros((), jnp.float32)
    acc = f(acc, *args)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = f(acc, *args)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.ops import dsp, frontends as fe
    from pallas_logmel_rejected import fused_logmel

    interpret = jax.default_backend() == "cpu"

    # VGGish: 256 x 10 s @ 16 kHz -> magnitude log-mel.
    b, s = 256, 160000
    frames = fe.vggish_num_patches(s) * 96
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, s), jnp.float32) * 0.1
    mel_v = jnp.asarray(dsp.htk_mel_matrix(64, 257, 16000, 125.0, 7500.0))

    def vggish_pallas(w):
        return fused_logmel(w, mel_v, frames, 400, 512, 160, power=False,
                            log_offset=0.01, interpret=interpret)

    for mode, fn in (
        ("xla", lambda w: fe.vggish_logmel_batch(w, frames)),
        ("pallas", vggish_pallas),
    ):
        dt = _time(fn, (wave,))
        amin_s = b * 10.0 / 60.0 / dt
        print(f"[{mode}] vggish logmel: {dt*1e3:.2f} ms/step = {amin_s:.0f} audio-min/s")

    # PANN-16k: 32 x 10 s, power log-mel on the 32k-24 grid.
    cfg = fe.PANN_CONFIGS[16000]
    t_i = fe.pann_num_frames(160000, cfg["hop_size"])
    grid = fe.pann_valid_time(t_i)
    length = grid * cfg["hop_size"] + cfg["window_size"]
    b2 = 32
    wave2 = jax.random.normal(jax.random.PRNGKey(1), (b2, length), jnp.float32) * 0.1
    n_valid = jnp.full((b2,), t_i, jnp.int32)
    mel_p = jnp.asarray(dsp.slaney_mel_matrix(16000, cfg["window_size"], 64, 50, 8000))

    def pann_pallas(w, n):
        return fused_logmel(w, mel_p, grid, cfg["window_size"], cfg["window_size"],
                            cfg["hop_size"], power=True, interpret=interpret)

    for mode, fn in (
        ("xla", lambda w, n: fe.pann_logmel_batch(w, 16000, grid, n)),
        ("pallas", pann_pallas),
    ):
        dt = _time(fn, (wave2, n_valid))
        amin_s = b2 * 10.0 / 60.0 / dt
        print(f"[{mode}] pann-16k logmel: {dt*1e3:.2f} ms/step = {amin_s:.0f} audio-min/s")


if __name__ == "__main__":
    main()
