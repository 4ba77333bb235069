import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovtrace.core import mathx, rng, color
from fovtrace.core.camera import Camera


class TestRng:
    def test_tea_deterministic_and_distinct(self):
        a = rng.tea(jnp.arange(1024), jnp.zeros(1024, jnp.uint32))
        b = rng.tea(jnp.arange(1024), jnp.zeros(1024, jnp.uint32))
        assert (np.asarray(a) == np.asarray(b)).all()
        assert len(np.unique(np.asarray(a))) > 1000

    def test_rnd_range_and_uniformity(self):
        seeds = rng.tea(jnp.arange(100000), jnp.uint32(3))
        vals, _ = rng.rnd(seeds)
        v = np.asarray(vals)
        assert (v >= 0).all() and (v < 1).all()
        assert abs(v.mean() - 0.5) < 0.01

    def test_frame_changes_stream(self):
        s0 = rng.pixel_seed(jnp.arange(100), 0)
        s1 = rng.pixel_seed(jnp.arange(100), 1)
        assert not (np.asarray(s0) == np.asarray(s1)).all()


class TestMathx:
    def test_reflect(self):
        i = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = mathx.reflect(i, n)
        np.testing.assert_allclose(np.asarray(r), [[0, 1, 0]], atol=1e-6)

    def test_onb_orthonormal(self):
        key = jax.random.PRNGKey(0)
        n = mathx.normalize(jax.random.normal(key, (64, 3)))
        t, b = mathx.onb(n)
        np.testing.assert_allclose(np.asarray(mathx.dot(t, n)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mathx.dot(b, n)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mathx.dot(t, b)), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mathx.norm(t)), 1, atol=1e-5)

    def test_refract_snell(self):
        # straight-on ray passes through un-bent
        i = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        t, tir = mathx.refract(i, n, jnp.asarray([[1.5]]))
        assert not bool(tir[0])
        np.testing.assert_allclose(np.asarray(t), [[0, -1, 0]], atol=1e-6)

    def test_refract_tir(self):
        # grazing exit from dense medium -> TIR. Exiting when dot(i, n) > 0
        # (n is the outward surface normal, optix::refract convention).
        i = mathx.normalize(jnp.asarray([[0.9, 0.1, 0.0]]))
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        t, tir = mathx.refract(i, n, jnp.asarray([[1.5]]))
        assert bool(tir[0])

    def test_cosine_hemisphere_mean(self):
        key = jax.random.PRNGKey(1)
        z1 = jax.random.uniform(key, (20000,))
        z2 = jax.random.uniform(jax.random.PRNGKey(2), (20000,))
        d = mathx.cosine_sample_hemisphere(z1, z2)
        assert (np.asarray(d[:, 2]) >= 0).all()
        # E[cos] = 2/3 for cosine-weighted
        assert abs(float(d[:, 2].mean()) - 2.0 / 3.0) < 0.01


class TestColor:
    def test_tonemap_monotonic_nonneg(self):
        x = jnp.linspace(0.0, 20.0, 100)[:, None] * jnp.ones((1, 3))
        y = np.asarray(color.uncharted2_tonemap(x))
        assert (y >= 0).all()
        assert (np.diff(y[:, 0]) >= -1e-6).all()

    def test_accumulate(self):
        acc = jnp.asarray([[[2.0, 4.0, 6.0, 2.0]]])
        out = np.asarray(color.accumulate_to_color(acc))
        np.testing.assert_allclose(out[0, 0], [1, 2, 3, 1], atol=1e-6)

    def test_accumulate_zero_weight_passthrough(self):
        acc = jnp.asarray([[[0.5, 0.5, 0.5, 0.0]]])
        out = np.asarray(color.accumulate_to_color(acc))
        np.testing.assert_allclose(out[0, 0, 3], 0.0)


class TestCamera:
    def _cam(self):
        return Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))

    def test_rays_through_target(self):
        cam = self._cam()
        w = h = 64
        ro, rd = cam.primary_rays(w, h)
        center = np.asarray(rd[h // 2, w // 2])
        expect = np.asarray((cam.target - cam.eye) / jnp.linalg.norm(cam.target - cam.eye))
        assert np.dot(center, expect) > 0.999

    def test_project_unproject_roundtrip(self):
        cam = self._cam()
        w = h = 64
        ro, rd = cam.primary_rays(w, h)
        # point along each ray should project back to its own pixel
        pts = np.asarray(ro + 3.0 * rd)
        uv = np.asarray(cam.world_to_screen(jnp.asarray(pts), w, h))
        px = np.arange(w)[None, :].repeat(h, 0)
        py = np.arange(h)[:, None].repeat(w, 1)
        np.testing.assert_allclose(uv[..., 0], px, atol=0.51)
        np.testing.assert_allclose(uv[..., 1], py, atol=0.51)

    def test_view_matrix_orthonormal(self):
        m = np.asarray(self._cam().view_matrix())[:3, :3]
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)

    def test_camera_is_differentiable(self):
        def f(eye):
            cam = Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))
            cam = cam.replace(eye=eye)
            _, rd = cam.primary_rays(8, 8)
            return jnp.sum(rd)

        g = jax.grad(f)(jnp.asarray([3.0, 2.0, 4.0]))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


# --- camera: ortho modes, quaternion controls, thin lens ----------------
def test_camera_ortho_modes():
    """getPMat's 3 ortho modes (REF/Camera.cpp:153-181): parallel rays
    with the requested world extents."""
    import jax.numpy as jnp
    import numpy as np

    from fovtrace.core import camera as cam_mod

    cam = cam_mod.Camera.create(
        eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0), fov_y=4.0,
        mode=cam_mod.PM_ORTHO_HEIGHT)
    ro, rd = cam.primary_rays(8, 8)
    # all rays parallel to -z
    np.testing.assert_allclose(np.asarray(rd), np.broadcast_to(
        [0.0, 0.0, -1.0], rd.shape), atol=1e-5)
    # world height = fov_y value: origins span [-2, 2) (pixel corners,
    # so the top sample sits one pixel (4/8 = 0.5) below +2)
    ys = np.asarray(ro[..., 1])
    np.testing.assert_allclose(ys.min(), -2.0, atol=1e-5)
    np.testing.assert_allclose(ys.max(), 2.0 - 4.0 / 8.0, atol=1e-5)

    for mode in (cam_mod.PM_ORTHO, cam_mod.PM_ORTHO_WIDTH):
        c2 = cam.replace(mode=mode)
        _, rd2 = c2.primary_rays(8, 4)
        np.testing.assert_allclose(
            np.asarray(rd2), np.broadcast_to([0.0, 0.0, -1.0], rd2.shape),
            atol=1e-5)


def test_camera_rotate_around():
    """Orbit by 2*pi returns the camera; pi about +y mirrors the eye."""
    import numpy as np

    from fovtrace.core.camera import Camera

    cam = Camera.create(eye=(3.0, 2.0, 0.0), target=(0.0, 2.0, 0.0))
    full = cam.rotate_around((0.0, 2.0, 0.0), 2.0 * np.pi, (0.0, 1.0, 0.0))
    np.testing.assert_allclose(np.asarray(full.eye), np.asarray(cam.eye),
                               atol=1e-5)
    half = cam.rotate_around((0.0, 2.0, 0.0), np.pi, (0.0, 1.0, 0.0))
    np.testing.assert_allclose(np.asarray(half.eye), [-3.0, 2.0, 0.0],
                               atol=1e-5)


def test_thin_lens_focus_plane():
    """Thin-lens rays all pass through the pinhole focal point: at the
    focus distance, lens jitter converges (createPinHoleCam semantics)."""
    import jax.numpy as jnp
    import numpy as np

    from fovtrace.core.camera import Camera

    cam = Camera.create(eye=(0.0, 0.0, 5.0), target=(0.0, 0.0, 0.0))
    dirs = jnp.asarray([[0.1, 0.05, -1.0]] * 64)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    u1 = jnp.linspace(0.0, 1.0, 64)
    u2 = jnp.linspace(0.0, 1.0, 64)
    focus = 5.0
    o, d = cam.thin_lens_perturb(dirs, focus, 0.2, u1, u2)
    view = jnp.asarray([0.0, 0.0, -1.0])
    # march every lens ray to the focal plane -> same point
    t = focus / jnp.sum(d * view, axis=-1)
    pts = np.asarray(o + t[:, None] * d)
    assert pts.std(axis=0).max() < 1e-4
    # origins actually spread over the lens disc
    assert np.asarray(o)[:, 0].std() > 0.01
