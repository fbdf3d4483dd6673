"""CLAP HTSAT-tiny torch-parity test.

Builds an independent torch implementation of the exported CLAP audio path
(bicubic time interpolation via torch's own F.interpolate align_corners=True,
bn0, reshape_wav2img, Swin stages with shifted-window attention + relative
position bias + patch merging, final norm, token mean, projection head, L2
normalization — the architecture of reference scripts/export_clap.py:88-150),
loads OUR random params into it, and compares outputs. This is the strongest
hermetic fidelity check available without the 350 MB artifact."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402

from frechet_audio_distance_exported_tpu.models import clap as jclap  # noqa: E402
from torch_replicas import torch_clap_forward as _torch_clap_forward  # noqa: E402


def test_clap_matches_torch_replica():
    params = jclap.init_clap_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(0)
    log_mel = (rng.standard_normal((2, 1001, 64)) * 5.0 - 30.0).astype(np.float32)
    ours = np.asarray(jclap.clap_forward(params, log_mel))
    with torch.no_grad():
        theirs = _torch_clap_forward(params, log_mel)
    assert ours.shape == theirs.shape == (2, 512)
    cos = np.sum(ours * theirs, axis=1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)
    assert np.all(cos > 0.9999)


def test_bicubic_matrix_matches_torch():
    """The precomputed interpolation matrix == torch bicubic align_corners."""
    m = jclap._bicubic_time_matrix(1001, 1024)
    rng = np.random.default_rng(1)
    sig = rng.standard_normal((1, 1, 1001, 64)).astype(np.float32)
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(sig), (1024, 64), mode="bicubic",
                            align_corners=True).numpy()[0, 0]
    got = m @ sig[0, 0]
    # The dense [1024, 1001] float32 matmul accumulates ~1e-4 noise vs
    # torch's 4-tap kernel evaluation; structure/weights are exact.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_bicubic_taps_reconstruct_dense_matrix():
    """The 4-tap gather decomposition (shipped forward path) scatters back to
    exactly the dense matrix: same indices, same weights, no tap dropped."""
    m = jclap._bicubic_time_matrix(1001, 1024)
    idx, w = jclap._bicubic_taps(1001, 1024)
    rebuilt = np.zeros_like(m)
    for k in range(4):
        np.add.at(rebuilt, (np.arange(1024), idx[:, k]), w[:, k])
    np.testing.assert_array_equal(rebuilt, m)
    # Every row keeps its full mass: bicubic align_corners weights sum to 1.
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_l2_normalize_clamps_zero_embedding():
    """torch F.normalize semantics: an exactly-zero projection output maps to
    the zero vector, not NaN (0/0). Regression: zero-padded batch rows under
    random init embed to zero and poisoned masked device statistics."""
    import jax

    params = jclap.init_clap_params(jax.random.PRNGKey(0))
    zero_mel = np.zeros((1, 1001, 64), np.float32)
    out = np.asarray(jclap.clap_forward(params, zero_mel))
    assert np.isfinite(out).all()
