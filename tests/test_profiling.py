"""Tracing/profiling utilities (the aux subsystem the reference lacks)."""

import jax.numpy as jnp
import numpy as np

from frechet_audio_distance_exported_tpu.utils import profiling


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    report = t.report()
    assert "a" in report and "b" in report


def test_trace_noop_without_dir():
    with profiling.trace():
        x = jnp.ones((4, 4)) @ jnp.ones((4, 4))
    assert float(x.sum()) == 64.0


def test_trace_annotation():
    with profiling.annotate("frontend"):
        x = jnp.ones((4,)) * 2
    np.testing.assert_array_equal(np.asarray(x), 2.0)


def test_pipeline_reports_timings(capsys, sine_audio):
    from frechet_audio_distance_exported_tpu import FrechetAudioDistance

    fad = FrechetAudioDistance(model_name="vggish", weights="random", verbose=True)
    fad.get_embeddings([sine_audio(1.0, 440.0), sine_audio(1.0, 550.0)], 16000)
    out = capsys.readouterr().out + capsys.readouterr().err
    assert "stage timings" in out
