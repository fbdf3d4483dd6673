"""Frontend-only benchmark: fused Pallas log-mel kernel vs the XLA strided
path (VERDICT r1 #4 — the default must be backed by numbers).

Run twice on TPU (jit caches trace the env at first call, so one process per
setting):

    FAD_TPU_PALLAS_FRONTEND=0 python scripts/bench_pallas.py
    FAD_TPU_PALLAS_FRONTEND=1 python scripts/bench_pallas.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _time_step as _time  # shared deferred-materialization timer


def main():
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.ops import frontends as fe

    mode = "pallas" if os.environ.get("FAD_TPU_PALLAS_FRONTEND", "0") != "0" else "xla"

    # VGGish: 256 x 10 s @ 16 kHz -> magnitude log-mel.
    b, s = 256, 160000
    frames = fe.vggish_num_patches(s) * 96
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, s), jnp.float32) * 0.1
    dt = _time(lambda w: fe.vggish_logmel_batch(w, frames), (wave,))
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
    dt = _time(lambda w, n: fe.pann_logmel_batch(w, 16000, grid, n), (wave2, n_valid))
    amin_s = b2 * 10.0 / 60.0 / dt
    print(f"[{mode}] pann-16k logmel: {dt*1e3:.2f} ms/step = {amin_s:.0f} audio-min/s")


if __name__ == "__main__":
    main()
