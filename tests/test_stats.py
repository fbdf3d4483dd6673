"""Statistics and Fréchet-distance tests: streaming accumulator vs np.mean /
np.cov, on-device trace-sqrtm (eigh + Newton-Schulz) vs scipy."""

import jax.numpy as jnp
import numpy as np
import pytest

from frechet_audio_distance_exported_tpu.ops import stats as st


def _random_gaussian_stats(rng, d, n=500, scale=1.0):
    x = rng.standard_normal((n, d)) * scale
    mu = x.mean(axis=0)
    sigma = np.cov(x, rowvar=False)
    return mu, sigma


class TestStreamingStats:
    def test_matches_numpy_mean_cov(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((257, 32)).astype(np.float32) + 5.0  # nonzero mean
        # Shifted accumulator (shift ~ E[x]): tight float32 agreement.
        state = st.init_stats(32, shift=jnp.asarray(x[:16].mean(axis=0)))
        for lo, hi in [(0, 100), (100, 200), (200, 257)]:
            chunk = x[lo:hi]
            state = st.update_stats(state, jnp.asarray(chunk), jnp.ones(chunk.shape[0]))
        mu, sigma = st.finalize_stats(state)
        mu_np, sigma_np = st.calculate_embd_statistics_np(x)
        np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), sigma_np, rtol=1e-3, atol=1e-3)

    def test_unshifted_accumulator_close(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((257, 32)).astype(np.float32)
        state = st.init_stats(32)
        state = st.update_stats(state, jnp.asarray(x), jnp.ones(x.shape[0]))
        mu, sigma = st.finalize_stats(state)
        mu_np, sigma_np = st.calculate_embd_statistics_np(x)
        np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=1e-5, atol=1e-5)
        # float32 single-pass cancellation: ~1e-3 absolute
        np.testing.assert_allclose(np.asarray(sigma), sigma_np, atol=2e-3)

    def test_masked_rows_excluded(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((16, 8)).astype(np.float32)
        state = st.init_stats(8)
        padded = np.concatenate([x, 1e6 * np.ones((4, 8), np.float32)])
        mask = np.concatenate([np.ones(16), np.zeros(4)]).astype(np.float32)
        state = st.update_stats(state, jnp.asarray(padded), jnp.asarray(mask))
        mu, sigma = st.finalize_stats(state)
        mu_np, sigma_np = st.calculate_embd_statistics_np(x)
        np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), sigma_np, rtol=1e-3, atol=2e-3)


class TestFrechetNp:
    def test_identical_gaussians_zero(self):
        mu, sigma = _random_gaussian_stats(np.random.default_rng(0), 16)
        assert abs(st.frechet_distance_np(mu, sigma, mu, sigma)) < 1e-8

    def test_shifted_mean_equals_squared_distance(self):
        mu, sigma = _random_gaussian_stats(np.random.default_rng(1), 16)
        mu2 = mu + 1.0
        d = st.frechet_distance_np(mu, sigma, mu2, sigma)
        assert abs(d - 16.0) < 1e-6

    def test_known_diagonal_case(self):
        # N(0, I) vs N(0, 4I) in d dims: d_F^2 = d*(1 + 4 - 2*2) = d.
        d = 8
        mu = np.zeros(d)
        assert abs(st.frechet_distance_np(mu, np.eye(d), mu, 4 * np.eye(d)) - d) < 1e-8

    def test_singular_product_eps_retry(self, capsys):
        d = 6
        mu = np.zeros(d)
        sigma = np.zeros((d, d))  # fully singular
        out = st.frechet_distance_np(mu, sigma, mu + 1.0, sigma)
        assert np.isfinite(out)

    def test_eigh_route_singular_stays_finite_near_retried_scipy(self):
        """The eigh route clamps eigenvalues, so it returns the finite
        PSD-projected value directly on singular products — no retry path
        exists or is needed (review r5 removed the unreachable one). Where
        the reference's scipy retry fires, the two may diverge by the
        retry's O(eps*d) offset; pin that scale."""
        d = 64
        mu = np.zeros(d)
        sigma = np.zeros((d, d))  # fully singular: scipy sqrtm retries here
        ref = st.frechet_distance_np(mu, sigma, mu + 1.0, sigma)  # retried
        got = st.frechet_distance_eigh_np(mu, sigma, mu + 1.0, sigma)
        assert np.isfinite(got)
        assert got == float(d)  # |delta mu|^2 exactly; trace terms all zero
        assert abs(got - ref) < 1e-3  # the eps-retry offset scale, O(eps*d)


class TestFrechetLowRank:
    @pytest.mark.parametrize("d,n,m", [(64, 20, 24), (256, 40, 40), (2048, 32, 48)])
    def test_matches_scipy_rank_deficient(self, d, n, m):
        """Gram-trick epilogue == scipy sqrtm path (exact identity, f64)."""
        rng = np.random.default_rng(d + n)
        x1 = rng.standard_normal((n, d))
        x2 = rng.standard_normal((m, d)) * 1.2 + 0.1
        ref = st.frechet_distance_np(
            x1.mean(0), np.cov(x1, rowvar=False), x2.mean(0), np.cov(x2, rowvar=False)
        )
        got = st.frechet_distance_lowrank_np(x1, x2)
        # scipy's complex Schur sqrtm carries ~1e-7 of its own error on
        # rank-deficient products; the identity itself is exact.
        assert abs(got - ref) / max(abs(ref), 1.0) < 1e-6, (got, ref)

    def test_matches_scipy_overdetermined(self):
        """Identity also holds with more rows than dims."""
        rng = np.random.default_rng(3)
        x1 = rng.standard_normal((100, 16))
        x2 = rng.standard_normal((120, 16)) + 0.2
        ref = st.frechet_distance_np(
            x1.mean(0), np.cov(x1, rowvar=False), x2.mean(0), np.cov(x2, rowvar=False)
        )
        got = st.frechet_distance_lowrank_np(x1, x2)
        assert abs(got - ref) / max(abs(ref), 1.0) < 1e-6, (got, ref)

    def test_identical_sets_zero(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((30, 64))
        assert abs(st.frechet_distance_lowrank_np(x, x)) < 1e-9


class TestFrechetJax:
    @pytest.mark.parametrize("d", [8, 64, 256])
    @pytest.mark.parametrize("method", ["eigh", "newton_schulz"])
    def test_matches_scipy(self, d, method):
        rng = np.random.default_rng(d)
        mu1, s1 = _random_gaussian_stats(rng, d, n=4 * d)
        mu2, s2 = _random_gaussian_stats(rng, d, n=4 * d, scale=1.3)
        mu2 = mu2 + 0.1
        ref = st.frechet_distance_np(mu1, s1, mu2, s2)
        got = float(
            st.frechet_distance_jax(
                jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
                jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32),
                method=method,
            )
        )
        # float32 device floor: ~3e-3 relative (eigh), ~4e-2 (Newton-Schulz
        # through the FAD cancellation); the default host path is exact f64.
        tol = 1e-2 if method == "eigh" else 6e-2
        assert abs(got - ref) / max(abs(ref), 1.0) < tol, (got, ref)

    def test_rank_deficient_matches_scipy(self):
        """Covariances from fewer samples than dims (the PANN regime)."""
        d, n = 64, 20
        rng = np.random.default_rng(7)
        x1 = rng.standard_normal((n, d))
        x2 = rng.standard_normal((n, d)) + 0.2
        mu1, s1 = x1.mean(0), np.cov(x1, rowvar=False)
        mu2, s2 = x2.mean(0), np.cov(x2, rowvar=False)
        ref = st.frechet_distance_np(mu1, s1, mu2, s2)
        got = float(
            st.frechet_distance_jax(
                jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
                jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32),
            )
        )
        assert abs(got - ref) / max(abs(ref), 1.0) < 2e-2, (got, ref)

    def test_ns_rank_deficient_falls_back_finite(self):
        """Newton-Schulz diverges on singular products; the non-finite retry
        reroutes through eigh and must stay finite and accurate."""
        d, n = 128, 20
        rng = np.random.default_rng(11)
        x1 = rng.standard_normal((n, d))
        x2 = rng.standard_normal((n, d)) + 0.1
        mu1, s1 = x1.mean(0), np.cov(x1, rowvar=False)
        mu2, s2 = x2.mean(0), np.cov(x2, rowvar=False)
        ref = st.frechet_distance_np(mu1, s1, mu2, s2)
        got = float(
            st.frechet_distance_jax(
                jnp.asarray(mu1, jnp.float32), jnp.asarray(s1, jnp.float32),
                jnp.asarray(mu2, jnp.float32), jnp.asarray(s2, jnp.float32),
                method="newton_schulz",
            )
        )
        assert np.isfinite(got)
        assert abs(got - ref) / abs(ref) < 5e-2, (got, ref)


class TestEighHostEpilogue:
    @pytest.mark.parametrize("d,n", [(16, 100), (64, 20), (256, 100)])
    def test_matches_scipy_f64(self, d, n):
        rng = np.random.default_rng(d + n)
        x1 = rng.standard_normal((n, d)) * 0.8 + 0.3
        x2 = rng.standard_normal((n, d)) * 1.1
        mu1, s1 = x1.mean(0), np.cov(x1, rowvar=False)
        mu2, s2 = x2.mean(0), np.cov(x2, rowvar=False)
        ref = st.frechet_distance_np(mu1, s1, mu2, s2)
        got = st.frechet_distance_eigh_np(mu1, s1, mu2, s2)
        assert abs(got - ref) / max(abs(ref), 1e-9) < 1e-6, (got, ref)

    def test_identical_zero(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 32))
        mu, s = x.mean(0), np.cov(x, rowvar=False)
        assert abs(st.frechet_distance_eigh_np(mu, s, mu, s)) < 1e-9


class TestMaskedNaNRows:
    def test_masked_nan_rows_drop_out(self):
        """A NaN/Inf in a masked-out padded row must not poison the sums
        (0 * NaN is NaN — the accumulators use where(), not multiply).
        Regression: CLAP zero-padded batch rows can embed to NaN-adjacent
        values under random init; the sink path masks them out."""
        rng = np.random.default_rng(7)
        x = rng.standard_normal((6, 8)).astype(np.float32)
        x_bad = x.copy()
        x_bad[4:] = np.nan
        mask = np.array([1, 1, 1, 1, 0, 0], np.float32)

        st1 = st.init_update_stats(jnp.asarray(x[:4]), jnp.ones((4,), jnp.float32))
        st2 = st.init_update_stats(jnp.asarray(x_bad), jnp.asarray(mask))
        mu1, s1 = (np.asarray(a) for a in st.finalize_stats(st1))
        mu2, s2 = (np.asarray(a) for a in st.finalize_stats(st2))
        assert np.isfinite(mu2).all() and np.isfinite(s2).all()
        np.testing.assert_allclose(mu2, mu1, rtol=1e-6)
        np.testing.assert_allclose(s2, s1, rtol=1e-5, atol=1e-7)

        # Same for a follow-up update chunk.
        st3 = st.update_stats(st1, jnp.asarray(x_bad), jnp.asarray(mask))
        mu3, s3 = (np.asarray(a) for a in st.finalize_stats(st3))
        assert np.isfinite(mu3).all() and np.isfinite(s3).all()
