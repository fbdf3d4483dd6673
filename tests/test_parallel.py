"""Multi-chip tests on the virtual 8-device CPU mesh: sharded statistics and
the fused scoring step must equal the single-chip results (a tier the
reference has no equivalent of — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.models.vggish import init_vggish_params, vggish_forward
from frechet_audio_distance_exported_tpu.ops import stats as st
from frechet_audio_distance_exported_tpu.parallel import embed, mesh


@pytest.fixture(scope="module")
def vggish_params():
    return init_vggish_params(jax.random.PRNGKey(0))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_stats_match_single_chip(vggish_params):
    m = mesh.data_mesh()
    n_dev = len(jax.devices())
    b = 2 * n_dev
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 96, 64))
    mask = jnp.ones((b,)).at[-3:].set(0.0)

    fn = embed.make_sharded_embed_stats(m, vggish_forward)
    state_sh = fn(vggish_params, x, mask)

    # Compare finalized (mu, sigma) — the sharded accumulator centers at the
    # global mean internally, so raw sums are shift-relative.
    mu_sh, sig_sh = st.finalize_stats(state_sh)
    emb = vggish_forward(vggish_params, x)
    state = st.update_stats(st.init_stats(128), emb, mask)
    mu_1c, sig_1c = st.finalize_stats(state)
    np.testing.assert_allclose(float(state_sh.n), float(state.n))
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu_1c), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_sh), np.asarray(sig_1c), rtol=1e-4, atol=1e-5)


def test_sharded_score_step_matches_host():
    """Fused shard_map scoring step == host-f64 reference, using a linear
    embedding model with O(1) output scale (random-weight CNNs make FAD ~1e-5
    where float32 relative comparison is meaningless)."""
    m = mesh.data_mesh()
    n_dev = len(jax.devices())
    b = 32 * n_dev
    d_in, d_out = 24, 16
    w = jax.random.normal(jax.random.PRNGKey(0), (d_in, d_out)) / np.sqrt(d_in)

    def linear_model(params, x):
        return x @ params

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    rows_bg = jax.random.normal(k1, (b, d_in))
    rows_ev = jax.random.normal(k2, (b, d_in)) * 1.2 + 0.3
    ones = jnp.ones((b,))

    step = embed.make_sharded_score_step(m, linear_model)
    fused = float(step(w, rows_bg, ones, rows_ev, ones))

    e1 = np.asarray(linear_model(w, rows_bg), dtype=np.float64)
    e2 = np.asarray(linear_model(w, rows_ev), dtype=np.float64)
    ref = st.frechet_distance_np(
        e1.mean(0), np.cov(e1, rowvar=False), e2.mean(0), np.cov(e2, rowvar=False)
    )
    assert ref > 0.1  # meaningful scale
    # Mean-centered sharded accumulation + f32 eigh epilogue: inside the
    # <=1e-3 parity bar (was 2e-2 with the shift=0 accumulator).
    assert abs(fused - ref) / ref < 1e-3, (fused, ref)


def test_sharded_score_step_matches_host_real_cnn(vggish_params):
    """Fused shard_map scoring step with the REAL VGGish CNN (VERDICT r2 #9;
    complements the linear stand-in above). Random-init embeddings are
    ~1e-3-scale, which puts raw FAD below float32 resolution — the embedding
    is scaled to O(1) inside the step (a linear map, preserved exactly by
    both paths) so the <=1e-3 relative bar is meaningful."""
    m = mesh.data_mesh()
    n_dev = len(jax.devices())
    b = 4 * n_dev

    def scaled_vggish(params, x):
        return vggish_forward(params, x) * 300.0

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    rows_bg = jax.random.normal(k1, (b, 96, 64))
    rows_ev = jax.random.normal(k2, (b, 96, 64)) * 1.5 + 0.4
    mask_bg = jnp.ones((b,))
    mask_ev = jnp.ones((b,)).at[-2:].set(0.0)  # masked rows drop out

    step = embed.make_sharded_score_step(m, scaled_vggish)
    fused = float(step(vggish_params, rows_bg, mask_bg, rows_ev, mask_ev))

    e1 = np.asarray(scaled_vggish(vggish_params, rows_bg), dtype=np.float64)
    e2 = np.asarray(scaled_vggish(vggish_params, rows_ev), dtype=np.float64)[:-2]
    ref = st.frechet_distance_np(
        e1.mean(0), np.cov(e1, rowvar=False), e2.mean(0), np.cov(e2, rowvar=False)
    )
    assert ref > 0.1  # meaningful scale
    assert abs(fused - ref) / ref < 1e-3, (fused, ref)
