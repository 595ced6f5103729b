"""Metrics tests: AUPRC vs sklearn, Frechet distance golden values, MMD."""

import jax
import jax.numpy as jnp
import numpy as np

from damc_tpu.metrics import (
    RunningStats,
    auprc,
    fid_from_samples,
    frechet_distance,
    make_random_feature_fn,
    mmd2_rbf,
)


class TestAUPRC:
    def test_matches_sklearn(self):
        from sklearn.metrics import auc, precision_recall_curve

        rng = np.random.RandomState(0)
        for sep in (0.0, 0.5, 2.0):
            labels = (rng.rand(400) < 0.3).astype(np.float64)
            scores = np.round(rng.randn(400) + labels * sep, 1)  # with ties
            p, r, _ = precision_recall_curve(labels, scores)
            expected = auc(r, p)
            np.testing.assert_allclose(auprc(scores, labels), expected, atol=1e-9)

    def test_perfect_classifier(self):
        labels = np.array([0, 0, 1, 1])
        scores = np.array([0.1, 0.2, 0.8, 0.9])
        assert auprc(scores, labels) == 1.0


class TestFrechet:
    def test_identical_stats_zero(self):
        mu = np.zeros(4)
        sigma = np.eye(4)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8

    def test_mean_shift_closed_form(self):
        # Same covariance: d^2 = ||mu1 - mu2||^2.
        mu1, mu2 = np.zeros(3), np.array([1.0, 2.0, 2.0])
        sigma = np.eye(3) * 0.5
        np.testing.assert_allclose(
            frechet_distance(mu1, sigma, mu2, sigma), 9.0, rtol=1e-8
        )

    def test_diag_cov_closed_form(self):
        # Diagonal covs: Tr(S1 + S2 - 2 sqrt(S1 S2)) = sum (sqrt(s1)-sqrt(s2))^2.
        mu = np.zeros(2)
        s1 = np.diag([1.0, 4.0])
        s2 = np.diag([9.0, 16.0])
        expected = (1 - 3) ** 2 + (2 - 4) ** 2
        np.testing.assert_allclose(
            frechet_distance(mu, s1, mu, s2), expected, rtol=1e-8
        )

    def test_running_stats_match_numpy(self):
        rng = np.random.RandomState(1)
        data = rng.randn(500, 6)
        rs = RunningStats(6)
        for chunk in np.array_split(data, 7):
            rs.update(chunk)
        mu, cov = rs.finalize()
        np.testing.assert_allclose(mu, data.mean(axis=0), atol=1e-10)
        np.testing.assert_allclose(cov, np.cov(data, rowvar=False), atol=1e-10)

    def test_fid_pipeline_discriminates(self):
        key = jax.random.PRNGKey(0)
        feat = make_random_feature_fn(key, (8, 8, 1), dim=16)
        rng = np.random.RandomState(0)
        real = [rng.rand(64, 8, 8, 1).astype(np.float32) for _ in range(3)]
        fake_same = [rng.rand(64, 8, 8, 1).astype(np.float32) for _ in range(3)]
        fake_diff = [
            (rng.rand(64, 8, 8, 1) ** 3).astype(np.float32) for _ in range(3)
        ]
        from damc_tpu.metrics import compute_stats

        mu, sigma = compute_stats(feat, real)
        fid_same = fid_from_samples(feat, fake_same, mu, sigma)
        fid_diff = fid_from_samples(feat, fake_diff, mu, sigma)
        assert fid_diff > 5 * max(fid_same, 1e-6)


class TestMMD:
    def test_same_distribution_near_zero(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (400, 2))
        y = jax.random.normal(k2, (400, 2))
        assert abs(float(mmd2_rbf(x, y))) < 0.01

    def test_different_distributions_positive(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (400, 2))
        y = jax.random.normal(k2, (400, 2)) * 0.3 + 2.0
        assert float(mmd2_rbf(x, y)) > 0.1


class TestShardedStats:
    def test_sharded_stats_match_host_stats(self):
        """Mesh-parallel feature statistics (SURVEY §2.6 multi-host FID
        reduction) must equal the host-side RunningStats on identical data,
        whether fed host arrays or already-sharded device arrays."""
        import jax

        from damc_tpu.metrics.fid import (
            compute_stats,
            compute_stats_sharded,
            make_random_feature_fn,
        )
        from damc_tpu.parallel import make_mesh, shard_batch

        feat = make_random_feature_fn(jax.random.PRNGKey(0), (8, 8, 3), dim=16)
        rng = np.random.RandomState(0)
        batches = [rng.rand(16, 8, 8, 3).astype(np.float32) for _ in range(3)]

        mu_host, sig_host = compute_stats(feat, iter(batches))

        mesh = make_mesh()
        mu_s, sig_s = compute_stats_sharded(feat, iter(batches), mesh, dim=16)
        np.testing.assert_allclose(mu_s, mu_host, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sig_s, sig_host, rtol=1e-4, atol=1e-6)

        device_batches = [shard_batch(mesh, b) for b in batches]
        mu_d, sig_d = compute_stats_sharded(feat, iter(device_batches), mesh, dim=16)
        np.testing.assert_allclose(mu_d, mu_host, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sig_d, sig_host, rtol=1e-4, atol=1e-6)


def test_images_to_unit_handles_both_storage_conventions():
    """uint8 [0,255] and float [-1,1] must both land in [0,1] — mixing them
    up corrupted eval-CLI FID stats (review finding: eval_gen_recon ran
    (uint8 + 1)/2, producing features over [0.5, 128])."""
    from damc_tpu.metrics.fid import images_to_unit

    u8 = np.array([[0, 128, 255]], np.uint8)
    np.testing.assert_allclose(images_to_unit(u8), [[0.0, 128 / 255, 1.0]])
    pm1 = np.array([[-1.0, 0.0, 1.0]], np.float32)
    np.testing.assert_allclose(images_to_unit(pm1), [[0.0, 0.5, 1.0]])
