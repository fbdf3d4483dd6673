"""Benchmarks on the real TPU chip.

Driver mode (no args): prints ONE JSON line — the flagship VGGish embedding
throughput (audio-min/sec/chip) vs a CPU-torch baseline of the identical
architecture (the reference's execution model; it publishes no numbers of
its own, BASELINE.md), plus a "families" field with every variant's fused
embed+stats step throughput so per-family regressions are driver-visible.

Extended modes (logged to stderr, VERDICT r1 #5):
  python bench.py --families   # per-variant jitted-step throughput
                               # (all seven: vggish, pann-8k/16k/32k, clap,
                               #  encodec-24k/48k)
  python bench.py --e2e        # warm end-to-end score() throughput per family

Timing notes: the step benches time the fused embed+stats device program of
score(device_stats=True) — frontend -> model -> masked streaming (N, Σx,
Σxxᵀ) accumulator, the production TPU-native scoring path where embeddings
never leave the chip. The whole step chain is dispatched asynchronously and
forced once by fetching the final accumulator's scalar count (4 bytes),
because block_until_ready lies through the axon tunnel and a full-embedding fetch
would time the ~62 MB/s tunnel instead of the chip (it dominated and its
run-to-run variance swamped real changes in rounds 1-2; --e2e still
measures the full host roundtrip).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

CLIP_SECONDS = 10.0
PATCH_SECONDS = 0.96


def _time_stats_step(step_fn, acc, args, n_iters=24):
    """Seconds per fused embed+stats step. The accumulator is carried on
    device (each step consumes the previous step's state, so the device
    executes them back to back); all n_iters steps are dispatched
    asynchronously and the final 4-byte acc.n fetch forces the whole chain —
    a per-step fetch would put the tunnel's RTT (~15-30 ms) on the critical
    path and cap every family at the RTT, which is exactly what the round-2
    tunnel-timed records did (see module docstring)."""
    acc0 = acc
    acc = step_fn(acc, *args)  # compile + warmup
    float(acc.n)
    acc = acc0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = step_fn(acc, *args)
    float(acc.n)
    return (time.perf_counter() - t0) / n_iters


def _shipped_dtype(family, params):
    """Apply the production model-compute dtype (config.model_dtype — bf16 on
    TPU by default, f32 elsewhere/forced) so the step benches measure the
    shipped configuration. Returns (dtype, cast params)."""
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.config import model_dtype
    from frechet_audio_distance_exported_tpu.pipeline import cast_model_params

    dt = model_dtype()
    if dt != jnp.float32:
        params = cast_model_params(family, params, dt)
    return dt, params


def _accumulate(acc, emb):
    """Fold a [..., d] embedding chunk into the streaming accumulator (the
    device_stats scoring path; all rows valid in the benches)."""
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.ops import stats

    return stats.update_stats(acc, emb, jnp.ones(emb.shape[:-1], jnp.float32))


def bench_vggish(files_per_step=512):  # shipped TPU default (pipeline.py)
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models.vggish import (
        init_vggish_params,
        vggish_forward,
    )
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops import stats

    params = init_vggish_params(jax.random.PRNGKey(0))
    cdt, params = _shipped_dtype("vggish", params)
    s = int(CLIP_SECONDS * fe.VGGISH_SAMPLE_RATE)
    num_patches = fe.vggish_num_patches(s)

    @jax.jit
    def step(acc, params, wave):
        patches = fe.vggish_patches_batch(wave, num_patches, impl="auto")
        emb = vggish_forward(params, patches.reshape(-1, 96, 64).astype(cdt))
        return _accumulate(acc, emb.astype(jnp.float32))

    wave = jax.random.normal(jax.random.PRNGKey(1), (files_per_step, s), jnp.float32) * 0.1
    dt = _time_stats_step(step, stats.init_stats(128), (params, wave))
    patches_per_sec = files_per_step * num_patches / dt
    return patches_per_sec * PATCH_SECONDS / 60.0


def _bench_pann(sr, files_per_step=128):  # B=128: shipped TPU default (pipeline.py)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from frechet_audio_distance_exported_tpu.models.pann import init_pann_params, pann_forward
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops import stats

    params = init_pann_params(jax.random.PRNGKey(0))
    cdt, params = _shipped_dtype("pann", params)
    cfg = fe.PANN_CONFIGS[sr]
    n_fft, hop = cfg["window_size"], cfg["hop_size"]
    t_i = fe.pann_num_frames(int(CLIP_SECONDS * sr), hop)
    grid = fe.pann_valid_time(t_i)
    length = grid * hop + n_fft

    @jax.jit
    def step(acc, params, wave, n_valid):
        mel = fe.pann_logmel_batch(wave, sr, grid, n_valid, impl="auto")
        emb = pann_forward(params, mel.astype(cdt))
        return _accumulate(acc, emb.astype(jnp.float32))

    wave = jax.random.normal(jax.random.PRNGKey(1), (files_per_step, length), jnp.float32) * 0.1
    n_valid = jnp.full((files_per_step,), t_i, jnp.int32)
    dt = _time_stats_step(step, stats.init_stats(2048), (params, wave, n_valid))
    return files_per_step * CLIP_SECONDS / 60.0 / dt


def bench_pann8k(files_per_step=128):
    return _bench_pann(8000, files_per_step)


def bench_pann16k(files_per_step=128):
    return _bench_pann(16000, files_per_step)


def bench_pann32k(files_per_step=128):
    return _bench_pann(32000, files_per_step)


def bench_clap(files_per_step=32):
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models.clap import clap_forward, init_clap_params
    from frechet_audio_distance_exported_tpu.ops import frontends as fe
    from frechet_audio_distance_exported_tpu.ops import stats

    params = init_clap_params(jax.random.PRNGKey(0))
    cdt, params = _shipped_dtype("clap", params)
    n_fft = fe.PANN_CONFIGS[fe.CLAP_SAMPLE_RATE]["window_size"]
    length = fe.CLAP_MAX_SAMPLES + n_fft  # reflect-padded 10 s @ 48 kHz

    @jax.jit
    def step(acc, params, wave, n_valid):
        mel = fe.pann_logmel_batch(
            wave, fe.CLAP_SAMPLE_RATE, fe.CLAP_TIME_FRAMES, n_valid, impl="auto"
        )
        emb = clap_forward(params, mel.astype(cdt))
        return _accumulate(acc, emb.astype(jnp.float32))

    wave = jax.random.normal(jax.random.PRNGKey(1), (files_per_step, length), jnp.float32) * 0.1
    n_valid = jnp.full((files_per_step,), fe.CLAP_TIME_FRAMES, jnp.int32)
    dt = _time_stats_step(step, stats.init_stats(512), (params, wave, n_valid))
    return files_per_step * CLIP_SECONDS / 60.0 / dt


def _bench_encodec(sample_rate, causal, channels, files_per_step):
    import jax
    import jax.numpy as jnp

    from frechet_audio_distance_exported_tpu.models.encodec import (
        encodec_forward,
        init_encodec_params,
    )

    params = init_encodec_params(jax.random.PRNGKey(0), causal=causal, channels=channels)
    from frechet_audio_distance_exported_tpu.config import model_dtype_is_forced

    if causal or model_dtype_is_forced():
        # shipped default: 24k runs mixed (conv bf16, LSTM f32); 48k stays
        # f32 unless FAD_TPU_MODEL_DTYPE opts in (see pipeline.py rationale)
        _, params = _shipped_dtype("encodec", params)
    s = int(CLIP_SECONDS * sample_rate)

    from frechet_audio_distance_exported_tpu.ops import stats

    @jax.jit
    def step(acc, params, wave):
        return _accumulate(acc, encodec_forward(params, wave, causal=causal))

    wave = jax.random.normal(
        jax.random.PRNGKey(1), (files_per_step, channels, s), jnp.float32
    ) * 0.1
    dt = _time_stats_step(step, stats.init_stats(128), (params, wave))
    return files_per_step * CLIP_SECONDS / 60.0 / dt


def bench_encodec24k(files_per_step=128):  # shipped TPU default (pipeline.py)
    return _bench_encodec(24000, causal=True, channels=1, files_per_step=files_per_step)


def bench_encodec48k(files_per_step=16):
    return _bench_encodec(48000, causal=False, channels=2, files_per_step=files_per_step)


FAMILY_BENCHES = {
    "vggish": bench_vggish,
    "pann-8k": bench_pann8k,
    "pann-16k": bench_pann16k,
    "pann-32k": bench_pann32k,
    "clap": bench_clap,
    "encodec-24k": bench_encodec24k,
    "encodec-48k": bench_encodec48k,
}


def bench_e2e(model_name: str, num_files: int = 64) -> float:
    """Warm end-to-end score() throughput (audio-min/sec) on temp WAV dirs."""
    import os
    import tempfile

    import numpy as np

    from frechet_audio_distance_exported_tpu import FrechetAudioDistance
    from frechet_audio_distance_exported_tpu.utils.audio_io import write_wav

    fad = FrechetAudioDistance(model_name=model_name, weights="random")
    sr = fad.sample_rate
    rng = np.random.default_rng(0)
    bg, ev = tempfile.mkdtemp(), tempfile.mkdtemp()
    for i in range(num_files):
        clip = (rng.standard_normal(int(sr * CLIP_SECONDS)) * 0.1).astype(np.float32)
        write_wav(os.path.join(bg, f"{i}.wav"), clip, sr)
        write_wav(os.path.join(ev, f"{i}.wav"), clip * 0.9, sr)
    fad.score(bg, ev)  # warm: compile all buckets
    t0 = time.perf_counter()
    score = fad.score(bg, ev)
    dt = time.perf_counter() - t0
    assert score != -1
    return 2 * num_files * CLIP_SECONDS / 60.0 / dt


def bench_torch_cpu(n_patches: int = 128):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    convs = []
    cin = 1
    for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]:
        if v == "M":
            convs.append(nn.MaxPool2d(2, 2))
        else:
            convs.append(nn.Conv2d(cin, v, 3, padding=1))
            convs.append(nn.ReLU(inplace=True))
            cin = v
    model = nn.Sequential(
        *convs,
        nn.Flatten(),
        nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
        nn.Linear(4096, 4096), nn.ReLU(True),
        nn.Linear(4096, 128),
    )
    model.eval()
    x = torch.randn(n_patches, 1, 96, 64)
    with torch.no_grad():
        model(x[:8])  # warmup
        t0 = time.perf_counter()
        model(x)
        dt = time.perf_counter() - t0
    return n_patches / dt


# Driver-mode record, mutated as measurements land so the watchdog can emit
# an honest partial record (zero-valued flagship if vggish never finished).
DRIVER_RECORD = {
    "metric": "vggish_embedding_throughput",
    "value": 0.0,
    "unit": "audio_min/sec/chip",
    # null until a real baseline divide happens (a 0.0 here would be
    # indistinguishable from a genuine measurement of zero).
    "vs_baseline": None,
    "families": {},
}


def _emit_driver_record():
    print(json.dumps(DRIVER_RECORD), flush=True)


def _wait_for_backend(total_budget_s: int = 1500, attempt_timeout_s: int = 240) -> bool:
    """Wait out a transiently wedged TPU tunnel before measuring.

    Round 4 lost its entire hardware record to BENCH=0.0 because the tunnel
    happened to be wedged at the one moment the driver ran bench; the same
    wedge observed in round 5 cleared in ~20 minutes. Backend init is the
    hang point, so probe it in a SUBPROCESS with a timeout (killing an
    init-only probe is safe — it never acquired the device; killing a client
    mid-execution is what wedges the tunnel further) and retry within a
    bounded budget. Returns True once a probe succeeds (the in-process init
    that follows is then fast), False when the budget runs out — callers
    proceed either way; the watchdog keeps the emitted record honest.
    FAD_TPU_INIT_WAIT=0 disables the wait."""
    import os
    import subprocess

    if os.environ.get("FAD_TPU_INIT_WAIT", "").strip().lower() in ("0", "off", "false"):
        return True
    deadline = time.monotonic() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=attempt_timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(
                        f"[bench] backend reachable after {attempt} probes",
                        file=sys.stderr, flush=True,
                    )
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() + 60 > deadline:
            print(
                "[bench] backend unreachable after the wait budget; proceeding "
                "(the watchdog keeps the record honest)",
                file=sys.stderr, flush=True,
            )
            return False
        print(
            f"[bench] backend init probe {attempt} hung/failed; retrying in 60 s",
            file=sys.stderr, flush=True,
        )
        time.sleep(60)


def _arm_watchdog(seconds: int = 600, emit_driver_record: bool = True):
    """The tunneled TPU can wedge indefinitely (observed after killed
    mid-flight clients); bail out instead of hanging. In driver mode the
    record measured so far goes to stdout (honest zeros for what never ran);
    the --families/--e2e modes only report the wedge on stderr (their stdout
    must not fabricate a flagship metric they never measured) and exit
    nonzero."""
    import os
    import signal

    def _fire(signum, frame):
        if emit_driver_record:
            _emit_driver_record()
        print("bench watchdog fired: TPU unresponsive", file=sys.stderr, flush=True)
        os._exit(0 if emit_driver_record else 1)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def main():
    args = set(sys.argv[1:])
    _wait_for_backend()
    if "--families" in args:
        _arm_watchdog(1800, emit_driver_record=False)
        for name, fn in FAMILY_BENCHES.items():
            v = fn()
            print(f"[bench] {name} step: {v:.1f} audio-min/s/chip", file=sys.stderr, flush=True)
        return
    if "--e2e" in args:
        _arm_watchdog(3600, emit_driver_record=False)
        for name in ("vggish", "pann-16k", "clap", "encodec-24k"):
            v = bench_e2e(name)
            print(f"[bench] {name} e2e score(): {v:.1f} audio-min/s", file=sys.stderr, flush=True)
        return

    # Driver mode: flagship vggish first (the headline metric), then every
    # other family so regressions in pann/clap/encodec are driver-visible
    # (VERDICT r2 #6) — each family guarded so one wedge/compile failure
    # cannot zero the rest of the record.
    # Per-family watchdog re-arm: a full 7-family run measured 1230 s through
    # the tunnel (compiles dominate), so one global deadline either truncates
    # a healthy run or waits forever on a wedged one. 600 s of no-progress
    # per family emits the partial record instead.
    _arm_watchdog(600)
    import signal

    value = None
    try:
        value = bench_vggish()
        DRIVER_RECORD["value"] = round(value, 3)
        DRIVER_RECORD["families"]["vggish"] = round(value, 3)
    except Exception as e:
        DRIVER_RECORD["families"]["vggish"] = 0.0
        print(f"[bench] vggish failed: {e}", file=sys.stderr, flush=True)
    for name, fn in FAMILY_BENCHES.items():
        if name == "vggish":
            continue
        signal.alarm(600)
        try:
            DRIVER_RECORD["families"][name] = round(fn(), 3)
        except Exception as e:
            DRIVER_RECORD["families"][name] = 0.0
            print(f"[bench] {name} failed: {e}", file=sys.stderr, flush=True)

    signal.alarm(0)
    if value is None:
        # vggish never measured: vs_baseline must read null, not a fabricated
        # 0.0 that is indistinguishable from a genuine zero (ADVICE r3).
        DRIVER_RECORD["vs_baseline"] = None
    else:
        try:
            baseline = bench_torch_cpu() * PATCH_SECONDS / 60.0
            DRIVER_RECORD["vs_baseline"] = round(value / baseline, 2)
        except Exception as e:
            print(f"[bench] torch-cpu baseline failed: {e}", file=sys.stderr, flush=True)
    _emit_driver_record()


if __name__ == "__main__":
    main()
