import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovtrace.kernels import atrous, jfa, logpolar, pullpush, sampling, sibson


def _sparse_image(h=64, w=64, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(h, w)) < density
    rgb = rng.uniform(size=(h, w, 3)).astype(np.float32)
    img = np.concatenate([rgb * mask[..., None], mask[..., None].astype(np.float32)], -1)
    return jnp.asarray(img), mask


class TestJFA:
    def test_matches_brute_force_nearest_seed(self):
        img, mask = _sparse_image(48, 48, 0.05, seed=3)
        coord, color = jfa.jump_flood(img)
        h, w = 48, 48
        seeds = np.argwhere(mask)
        ys = (np.arange(h)[:, None] + 0.5) / h
        xs = (np.arange(w)[None, :] + 0.5) / w
        suv = np.stack([(seeds[:, 1] + 0.5) / w, (seeds[:, 0] + 0.5) / h], -1)
        got_uv = np.asarray(coord[..., :2])
        # distance to JFA's chosen seed must match the true nearest distance.
        # (JFA with 8-neighbor flood is exact for these densities)
        for y in range(0, h, 7):
            for x in range(0, w, 7):
                d = np.linalg.norm(suv - [xs[0, x], ys[y, 0]], axis=1)
                best = d.min()
                chosen = np.linalg.norm(got_uv[y, x] - [xs[0, x], ys[y, 0]])
                assert chosen <= best + 1e-4

    def test_seeds_keep_own_color(self):
        img, mask = _sparse_image(32, 32, 0.1, seed=1)
        _, color = jfa.jump_flood(img)
        got = np.asarray(color[..., :3])[mask]
        np.testing.assert_allclose(got, np.asarray(img[..., :3])[mask], atol=1e-6)

    def test_all_pixels_covered(self):
        img, _ = _sparse_image(32, 32, 0.02, seed=2)
        coord, _ = jfa.jump_flood(img)
        assert (np.asarray(coord[..., 3]) > 0).all()


class TestPullPush:
    def test_valid_samples_preserved(self):
        img, mask = _sparse_image(64, 64, 0.3, seed=4)
        out = np.asarray(pullpush.pull_push(img))
        np.testing.assert_allclose(out[mask][:, :3],
                                   np.asarray(img)[mask][:, :3], atol=1e-5)

    def test_holes_filled(self):
        img, mask = _sparse_image(64, 64, 0.1, seed=5)
        out = np.asarray(pullpush.pull_push(img))
        assert (out[..., 3] > 0).all()
        holes = ~mask
        assert np.isfinite(out[holes]).all()

    def test_constant_image_stays_constant(self):
        h = w = 32
        rng = np.random.default_rng(6)
        mask = rng.uniform(size=(h, w)) < 0.2
        img = np.zeros((h, w, 4), np.float32)
        img[..., :3] = 0.7 * mask[..., None]
        img[..., 3] = mask
        out = np.asarray(pullpush.pull_push(jnp.asarray(img)))
        np.testing.assert_allclose(out[..., :3], 0.7, atol=1e-4)


class TestSibson:
    def test_dense_input_identityish(self):
        h = w = 32
        rgb = np.random.default_rng(7).uniform(size=(h, w, 3)).astype(np.float32)
        img = np.concatenate([rgb, np.ones((h, w, 1), np.float32)], -1)
        coord, color = jfa.jump_flood(jnp.asarray(img))
        out = np.asarray(sibson.sibson_interpolate(coord, color, max_radius=4))
        # every pixel is its own seed -> disc radius ~0 -> nearly identity
        np.testing.assert_allclose(out[..., :3], rgb, atol=0.05)

    def test_fills_sparse(self):
        img, _ = _sparse_image(32, 32, 0.05, seed=8)
        coord, color = jfa.jump_flood(img)
        out = np.asarray(sibson.sibson_interpolate(coord, color, max_radius=8))
        assert np.isfinite(out).all()
        assert (out[..., 3] > 0).all()


class TestAtrous:
    def test_constant_image_fixed_point(self):
        h = w = 32
        c = jnp.full((h, w, 3), 0.4)
        p = jnp.zeros((h, w, 3))
        n = jnp.zeros((h, w, 3))
        out = np.asarray(atrous.atrous_denoise(c, p, n, iterations=2))
        np.testing.assert_allclose(out, 0.4, atol=1e-5)

    def test_edge_preserved(self):
        h = w = 32
        c = np.zeros((h, w, 3), np.float32)
        c[:, w // 2:] = 1.0
        pos = np.zeros((h, w, 3), np.float32)
        pos[:, w // 2:, 0] = 100.0  # huge position discontinuity at the edge
        nrm = np.zeros((h, w, 3), np.float32)
        out = np.asarray(atrous.atrous_denoise(
            jnp.asarray(c), jnp.asarray(pos), jnp.asarray(nrm),
            iterations=1, c_phi=10.0, n_phi=1.0, p_phi=0.01))
        # far from edge influence the halves keep their values
        assert abs(out[16, 4, 0] - 0.0) < 1e-3
        assert abs(out[16, -4, 0] - 1.0) < 1e-3

    def test_denoises_noise(self):
        h = w = 64
        rng = np.random.default_rng(9)
        clean = 0.5 * np.ones((h, w, 3), np.float32)
        noisy = clean + rng.normal(0, 0.2, (h, w, 3)).astype(np.float32)
        out = np.asarray(atrous.atrous_denoise(
            jnp.asarray(noisy), jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3)),
            iterations=3, c_phi=4.0))
        assert out.std() < noisy.std() * 0.5


class TestLogPolar:
    def test_roundtrip_coords_near_gaze(self):
        h = w = 128
        gx, gy = 64.0, 64.0
        # avoid the exact gaze point: r = 0 is degenerate in the reference
        # formula (log of zero radius), same as FowardLogPolar there.
        xs = np.linspace(21, 107, 22)
        ys = np.linspace(21, 107, 22)
        X, Y = np.meshgrid(xs, ys)
        u, v = logpolar.forward_coords(jnp.asarray(X), jnp.asarray(Y),
                                       gx, gy, w // 4, h // 4)
        x2, y2 = logpolar.inverse_coords(u, v, gx, gy, w // 4, h // 4)
        np.testing.assert_allclose(np.asarray(x2), X, atol=1e-2)
        np.testing.assert_allclose(np.asarray(y2), Y, atol=1e-2)

    def test_transform_shapes(self):
        img = jnp.ones((64, 64, 3))
        lp = logpolar.forward_transform(img, (32, 32), scale=0.25)
        assert lp.shape == (16, 16, 3)
        back = logpolar.inverse_transform(lp, (64, 64), (32, 32))
        assert back.shape == (64, 64, 3)
        np.testing.assert_allclose(np.asarray(back), 1.0, atol=1e-6)


class TestSampling:
    def test_weier_falloff_bands(self):
        gd = jnp.asarray([0.0, 0.05, 0.07, 0.1, 0.14, 0.5])
        r = np.asarray(sampling.weier_sample_rate(gd, 0.07, 0.05))
        assert r[0] == 1.0 and r[1] == 1.0
        assert r[-1] == pytest.approx(0.05)
        assert 0.05 < r[3] < 1.0

    def test_masked_sampling_fovea_full(self):
        h = w = 128
        gd = sampling.gaze_distance(h, w, (64, 64))
        sal = jnp.zeros((h, w))
        mask = np.asarray(sampling.masked_sampling(h, w, gd, sal, 0.07))
        # fovea fully sampled
        assert mask[64, 64] and mask[63, 66]
        # periphery only the 1/8 grid
        corner = mask[:32, :32]
        assert corner.mean() < 0.05

    def test_saliency_raises_density(self):
        h = w = 64
        gd = jnp.ones((h, w))  # everything far from gaze
        lo = np.asarray(sampling.masked_sampling(h, w, gd, jnp.zeros((h, w)), 0.07)).mean()
        hi = np.asarray(sampling.masked_sampling(h, w, gd, 0.7 * jnp.ones((h, w)), 0.07)).mean()
        assert hi > lo

    def test_compact_scatter_roundtrip(self):
        h = w = 32
        rng = np.random.default_rng(11)
        mask = jnp.asarray(rng.uniform(size=(h, w)) < 0.3)
        budget = 512
        idx, active = sampling.compact_rays(mask, budget)
        assert int(active.sum()) == int(mask.sum())
        vals = jnp.arange(budget, dtype=jnp.float32) + 1.0
        out = sampling.scatter_rays(vals, idx, active, h * w)
        out2d = np.asarray(out).reshape(h, w)
        assert ((out2d > 0) == np.asarray(mask)).all()

    def test_compaction_is_scanline_ordered(self):
        mask = jnp.ones((8, 8), bool)
        idx, active = sampling.compact_rays(mask, 64)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(64))


def test_compact_mask_keyed_matches_counting_sort():
    """Octant-major compaction == numpy stable counting sort, incl.
    tail-bucket overflow drops."""
    import numpy as np
    from fovtrace.kernels import sampling

    rng = np.random.default_rng(17)
    n = 4096
    mask = rng.uniform(size=n) < 0.4
    key = rng.integers(0, 8, size=n).astype(np.int32)

    order = np.lexsort((np.arange(n), key))       # stable by (key, pos)
    want_full = np.asarray([i for i in order if mask[i]])

    for budget in (int(mask.sum()) + 64, 512):    # roomy + starved
        idx, active = sampling.compact_mask_keyed(
            jnp.asarray(mask), jnp.asarray(key), 8, budget)
        idx, active = np.asarray(idx), np.asarray(active)
        take = min(budget, len(want_full))
        assert active.sum() == take
        np.testing.assert_array_equal(idx[:take], want_full[:take])
