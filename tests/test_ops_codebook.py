import functools

import jax
import jax.numpy as jnp
import numpy as np

from vector_quantization_tpu.ops import (
    code_frequency,
    code_histogram,
    cluster_stats,
    cvq_decay,
    cvq_update,
    ema,
    kmeans_init,
    kmeans_update,
    nearest_codes,
    normalize,
)


class TestStats:
    def test_histogram(self):
        codes = jnp.array([0, 1, 1, 3])
        h = code_histogram(codes, 5)
        np.testing.assert_array_equal(np.asarray(h), [1, 2, 0, 1, 0])

    def test_frequency_sums_to_one(self):
        codes = jax.random.randint(jax.random.PRNGKey(0), (100,), 0, 7)
        f = code_frequency(codes, 7)
        np.testing.assert_allclose(float(f.sum()), 1.0, rtol=1e-6)

    def test_cluster_stats_match_numpy(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (50, 4))
        codes = jax.random.randint(jax.random.PRNGKey(2), (50,), 0, 8)
        counts, sums = cluster_stats(x, codes, 8)
        xn, cn = np.asarray(x), np.asarray(codes)
        for k in range(8):
            np.testing.assert_allclose(float(counts[k]), (cn == k).sum())
            np.testing.assert_allclose(
                np.asarray(sums[k]), xn[cn == k].sum(0), rtol=1e-4, atol=1e-5
            )

    def test_psum_across_devices(self):
        ndev = jax.device_count()
        codes = jnp.tile(jnp.arange(4), (ndev, 1))

        hist = jax.pmap(
            functools.partial(code_histogram, codebook_size=4, axis_name="dp"),
            axis_name="dp",
        )(codes)
        np.testing.assert_array_equal(np.asarray(hist[0]), [ndev] * 4)


class TestEMA:
    def test_scalar_decay(self):
        old = jnp.ones(4)
        new = jnp.zeros(4)
        np.testing.assert_allclose(np.asarray(ema(old, new, 0.9)), 0.9)

    def test_per_entry_decay(self):
        old = jnp.ones((2, 3))
        new = jnp.zeros((2, 3))
        decay = jnp.array([[1.0], [0.0]])
        out = np.asarray(ema(old, new, decay))
        np.testing.assert_allclose(out[0], 1.0)
        np.testing.assert_allclose(out[1], 0.0)


class TestKMeans:
    def test_update_moves_to_centroids(self):
        # two well-separated clusters
        key = jax.random.PRNGKey(3)
        a = jax.random.normal(key, (64, 4)) * 0.01 + jnp.array([1, 0, 0, 0.0])
        b = jax.random.normal(key, (64, 4)) * 0.01 + jnp.array([0, 1, 0, 0.0])
        x = jnp.concatenate([a, b])
        e = jnp.array([[0.9, 0.1, 0, 0], [0.1, 0.9, 0, 0.0]])
        codes = nearest_codes(x, normalize(e), use_pallas=False)
        new = kmeans_update(e, x, codes, decay=None)
        # normalized centroids ≈ normalized cluster means
        np.testing.assert_allclose(
            np.asarray(new[0]), np.asarray(normalize(a.mean(0))), atol=0.05
        )

    def test_empty_codes_keep_old_entries(self):
        x = jnp.ones((8, 4))
        e = jnp.stack([jnp.ones(4), -jnp.ones(4)])
        codes = jnp.zeros(8, jnp.int32)  # nobody uses code 1
        new = kmeans_update(e, x, codes, decay=None, renormalize=False)
        np.testing.assert_allclose(np.asarray(new[1]), np.asarray(e[1]))

    def test_kmeans_init_reduces_quantization_error(self):
        key = jax.random.PRNGKey(4)
        centers = jax.random.normal(key, (4, 8)) * 4
        pts = jnp.repeat(centers, 50, axis=0) + jax.random.normal(
            jax.random.PRNGKey(5), (200, 8)
        ) * 0.05
        e = kmeans_init(pts, 8, jax.random.PRNGKey(6), iters=10)
        assert e.shape == (8, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-4
        )
        xn = np.asarray(normalize(pts.reshape(-1, 8)))
        inertia = (
            ((xn[:, None] - np.asarray(e)[None]) ** 2).sum(-1).min(-1).mean()
        )
        rand_e = np.asarray(
            normalize(jax.random.normal(jax.random.PRNGKey(7), (8, 8)))
        )
        rand_inertia = (
            ((xn[:, None] - rand_e[None]) ** 2).sum(-1).min(-1).mean()
        )
        assert inertia < 0.25 * rand_inertia

    def test_kmeans_init_fewer_points_than_codes(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (3, 4))
        e = kmeans_init(x, 8, jax.random.PRNGKey(8), normalize_input=False)
        np.testing.assert_allclose(np.asarray(e[:3]), np.asarray(x), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(e[3:]), 0.0)


class TestCVQ:
    def test_decay_limits(self):
        k = 512
        d_dead = float(cvq_decay(jnp.array(0.0), k, 0.99))
        d_active = float(cvq_decay(jnp.array(0.1), k, 0.99))
        assert d_dead < 0.01  # dead codes snap to anchors
        assert d_active > 0.999  # active codes keep their entry

    def test_update_replaces_dead_codes(self):
        key = jax.random.PRNGKey(9)
        x = jax.random.normal(key, (128, 4)) + 5.0  # far from origin
        e = jnp.zeros((8, 4)).at[0].set(jnp.asarray([5.0, 5, 5, 5]))
        codes = nearest_codes(x, e, use_pallas=False)
        d = jnp.sqrt(
            ((x[:, None] - e[None]) ** 2).sum(-1)
        )
        p = jnp.zeros(8)
        new_e, new_p, _ = cvq_update(
            e, p, x, d, codes,
            ema_decay=0.99, anchor="nearest", key=jax.random.PRNGKey(10),
            sync=False, axis_name=None,
        )
        # dead codes (1..7) moved near the data cloud
        assert float(jnp.abs(new_e[1:]).mean()) > 1.0
        assert new_p.shape == (8,)

    def test_anchor_variants_shapes(self):
        from vector_quantization_tpu.ops import (
            multinomial_anchors,
            nearest_anchors,
            random_anchors,
        )

        x = jax.random.normal(jax.random.PRNGKey(11), (40, 4))
        d = jax.random.uniform(jax.random.PRNGKey(12), (40, 8))
        key = jax.random.PRNGKey(13)
        assert nearest_anchors(x, d).shape == (8, 4)
        assert multinomial_anchors(x, d, key).shape == (8, 4)
        assert random_anchors(x, d, key).shape == (8, 4)
        # random anchors with fewer features than codes pads with uniforms
        assert random_anchors(x[:5], d[:5], key).shape == (8, 4)


class TestKMeansInitMemoryGuard:
    """VERDICT r1 missing #6: kmeans_init must bound HBM regardless of
    feature count (reference 2^30-element guard, vqkd callbacks.py:86-95)."""

    def test_chunked_matches_unchunked(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (600, 8))
        from vector_quantization_tpu.ops.codebook import kmeans_init

        full = kmeans_init(x, 16, key, iters=4, chunk_elems=1 << 30)
        # tiny chunk_elems forces the scan-over-chunks path (chunk=128,
        # 600 rows -> 5 chunks with 40 padded rows)
        chunked = kmeans_init(x, 16, key, iters=4, chunk_elems=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(chunked), atol=1e-5, rtol=1e-5
        )

    def test_max_points_subsample(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(2), (512, 4))
        from vector_quantization_tpu.ops.codebook import kmeans_init

        e = kmeans_init(x, 8, key, iters=2, max_points=64)
        assert e.shape == (8, 4)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-4
        )


class TestCachedAnchor:
    """CachedAnchor cross-batch cache (VERDICT r1 missing #7; reference
    cvqvae/anchors.py:107-166)."""

    def test_anchors_draw_from_cache_across_steps(self):
        from vector_quantization_tpu.ops.codebook import cached_anchors

        k, dim = 8, 4
        d = jnp.zeros((3, k))  # batch smaller than codebook
        # distinctive cache rows (all 7s) vs batch rows (all 1s)
        cache = jnp.full((k, dim), 7.0)
        x = jnp.ones((3, dim))
        anchors, new_cache = cached_anchors(
            x, d, jax.random.PRNGKey(0), cache
        )
        assert anchors.shape == (k, dim)
        vals = np.unique(np.asarray(anchors).round(3))
        assert 7.0 in vals  # cached features were sampled
        assert 1.0 in vals  # current batch too
        np.testing.assert_array_equal(np.asarray(new_cache), np.asarray(anchors))

    def test_large_batch_skips_cache(self):
        from vector_quantization_tpu.ops.codebook import cached_anchors

        k, dim = 4, 2
        d = jnp.zeros((16, k))
        cache = jnp.full((k, dim), 7.0)
        x = jnp.ones((16, dim))
        anchors, _ = cached_anchors(x, d, jax.random.PRNGKey(0), cache)
        # reference: cache only concatenated when batch < K
        np.testing.assert_allclose(np.asarray(anchors), 1.0)

    def test_cvq_cached_dead_code_snaps_to_cached_feature(self):
        from vector_quantization_tpu.ops.codebook import cvq_update

        k, dim = 4, 2
        codebook = jnp.zeros((k, dim))
        p = jnp.zeros(k)  # all codes dead -> decay ~ eps -> snap to anchors
        x = jnp.full((2, dim), 3.0)
        d = jnp.zeros((2, k))
        codes = jnp.zeros(2, jnp.int32)
        cache = jnp.full((k, dim), 5.0)
        new_cb, new_p, new_cache = cvq_update(
            codebook, p, x, d, codes,
            ema_decay=0.99, anchor="cached",
            key=jax.random.PRNGKey(1), sync=True, anchor_cache=cache,
        )
        assert new_cache is not None
        # dead codes moved nearly onto anchors (3s and 5s), far from 0
        moved = np.abs(np.asarray(new_cb)).max()
        assert moved > 2.0
        vals = set(np.unique(np.asarray(new_cache)))
        assert vals <= {3.0, 5.0}
