import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vector_quantization_tpu.models.losses.lpips import LPIPS
from vector_quantization_tpu.models.metrics import (
    FIDStatistics,
    InceptionV3Features,
    frechet_distance,
    inception_score,
)


class TestInception:
    def test_feature_shape(self):
        # resize_input=False with 75px input keeps compile fast on CPU
        model = InceptionV3Features(resize_input=False)
        img = jnp.zeros((2, 75, 75, 3), jnp.uint8)
        variables = model.init(jax.random.PRNGKey(0), img)
        feats = model.apply(variables, img)
        assert feats.shape == (2, 2048)

    def test_param_count_matches_inception_v3(self):
        model = InceptionV3Features(resize_input=False)
        img = jnp.zeros((1, 75, 75, 3), jnp.uint8)
        variables = model.init(jax.random.PRNGKey(0), img)
        n = sum(
            np.prod(p.shape)
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        # torchvision inception_v3 feature trunk (conv+bn, no fc/aux):
        # ~21.8M params
        assert 20e6 < n < 24e6, n


class TestFIDStatistics:
    def test_mean_cov_match_numpy(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(100, 8))
        stats = FIDStatistics(dim=8)
        stats.update(feats[:30])
        stats.update(feats[30:])
        np.testing.assert_allclose(stats.mean, feats.mean(0), rtol=1e-8)
        np.testing.assert_allclose(
            stats.cov, np.cov(feats, rowvar=False), rtol=1e-6
        )

    def test_save_load_roundtrip(self, tmp_path):
        stats = FIDStatistics(dim=4)
        stats.update(np.random.default_rng(1).normal(size=(50, 4)))
        path = str(tmp_path / "stats.npz")
        stats.save(path)
        loaded = FIDStatistics.load(path)
        np.testing.assert_allclose(loaded.mean, stats.mean)
        np.testing.assert_allclose(loaded.cov, stats.cov)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(2)
        mu = rng.normal(size=8)
        a = rng.normal(size=(8, 8))
        cov = a @ a.T + np.eye(8)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-3

    def test_mean_shift(self):
        mu1 = np.zeros(4)
        mu2 = np.ones(4) * 2
        cov = np.eye(4)
        np.testing.assert_allclose(
            frechet_distance(mu1, cov, mu2, cov), 16.0, atol=1e-3
        )

    def test_variance_difference_positive(self):
        mu = np.zeros(4)
        assert frechet_distance(mu, np.eye(4), mu, 4 * np.eye(4)) > 0


class TestInceptionScore:
    def test_uniform_predictions_is_one(self):
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score(probs, splits=2)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-6)

    def test_confident_diverse_is_high(self):
        probs = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
        mean, _ = inception_score(probs, splits=2)
        assert mean > 5.0


class TestLPIPS:
    def test_zero_for_identical(self):
        lpips = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
        params = lpips.init(jax.random.PRNGKey(1), x, x)
        assert float(lpips.apply(params, x, x)) == 0.0

    def test_positive_for_different(self):
        lpips = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
        y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
        params = lpips.init(jax.random.PRNGKey(1), x, y)
        assert float(lpips.apply(params, x, y)) > 0

    def test_differentiable_wrt_pred(self):
        lpips = LPIPS()
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 2 - 1
        y = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
        params = lpips.init(jax.random.PRNGKey(1), x, y)
        g = jax.grad(lambda x: lpips.apply(params, x, y))(x)
        assert np.abs(np.asarray(g)).sum() > 0

    def test_vgg16_param_count(self):
        lpips = LPIPS()
        x = jnp.zeros((1, 32, 32, 3))
        params = lpips.init(jax.random.PRNGKey(0), x, x)["params"]
        n = sum(
            np.prod(p.shape)
            for p in jax.tree_util.tree_leaves(params["vgg"])
        )
        # VGG16 conv trunk = 14.71M params
        assert 14.5e6 < n < 15e6, n


class TestFIDMetricIntegration:
    def test_self_contained_fid(self):
        from vector_quantization_tpu.training.metrics import FIDMetric

        metric = FIDMetric(dataset=None)
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
        # pred == gt -> FID ~ 0
        memo = {
            "pred": imgs.astype(np.float32) / 127.5 - 1.0,
            "batch": {"original_image": imgs},
        }
        metric.update(memo)
        metric.update(memo)
        result = metric.summary("fid")
        assert abs(result["fid"]) < 1e-2
