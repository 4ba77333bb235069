import numpy as np
import jax.numpy as jnp
import pytest

from fovtrace.kernels import intersect as isect
from fovtrace.scene import procedural
from fovtrace.scene.scene import Materials, Scene, MATL_DIFFUSE, MATL_REFRACTION

import reference_renderer as refnp


def _random_scene(num_tris=50, seed=0, kind=MATL_DIFFUSE):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-2, 2, (num_tris * 3, 3)).astype(np.float32)
    t = np.arange(num_tris * 3).reshape(num_tris, 3)
    mats = Materials.create([kind], [[0.8, 0.7, 0.6]])
    return Scene.build(v, t, np.zeros(num_tris, np.int32), mats)


def _random_rays(n=200, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


class TestBruteIntersect:
    def test_matches_numpy_reference(self):
        scene = _random_scene()
        ro, rd = _random_rays()
        hit = isect.intersect_brute(scene, jnp.asarray(ro), jnp.asarray(rd),
                                    1e-4, 1e30)
        sc = refnp.scene_to_np(scene)
        t_ref, tri_ref, u_ref, v_ref = refnp.intersect_all(
            sc, ro, rd, np.full(len(ro), 1e-4, np.float32),
            np.full(len(ro), 1e30, np.float32))
        np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(hit.tri), tri_ref)

    def test_single_triangle_hit_miss(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        t = np.array([[0, 1, 2]])
        mats = Materials.create([MATL_DIFFUSE], [[1, 1, 1]])
        scene = Scene.build(v, t, np.zeros(1, np.int32), mats)
        ro = jnp.asarray([[0.2, 0.2, 1.0], [0.9, 0.9, 1.0]])
        rd = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        hit = isect.intersect_brute(scene, ro, rd, 1e-4, 1e30)
        assert int(hit.tri[0]) == 0
        assert int(hit.tri[1]) == -1
        np.testing.assert_allclose(float(hit.t[0]), 1.0, rtol=1e-5)

    def test_closest_of_two(self):
        v = np.array(
            [[-1, -1, 0], [1, -1, 0], [0, 1, 0],
             [-1, -1, -2], [1, -1, -2], [0, 1, -2]], np.float32)
        t = np.array([[0, 1, 2], [3, 4, 5]])
        mats = Materials.create([MATL_DIFFUSE], [[1, 1, 1]])
        scene = Scene.build(v, t, np.zeros(2, np.int32), mats)
        hit = isect.intersect_brute(
            scene, jnp.asarray([[0.0, 0.0, 3.0]]), jnp.asarray([[0.0, 0.0, -1.0]]),
            1e-4, 1e30)
        assert int(hit.tri[0]) == 0  # nearer plane at z=0

    def test_tmax_respected(self):
        v = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
        t = np.array([[0, 1, 2]])
        mats = Materials.create([MATL_DIFFUSE], [[1, 1, 1]])
        scene = Scene.build(v, t, np.zeros(1, np.int32), mats)
        hit = isect.intersect_brute(
            scene, jnp.asarray([[0.0, 0.0, 3.0]]), jnp.asarray([[0.0, 0.0, -1.0]]),
            1e-4, 2.0)
        assert int(hit.tri[0]) == -1


class TestOcclusion:
    def test_opaque_blocks(self):
        scene = procedural.box_scene()
        # ray from above the box straight down through it to the ground
        atten = isect.occlusion_brute(
            scene, jnp.asarray([[0.0, 3.0, 0.0]]), jnp.asarray([[0.0, -1.0, 0.0]]),
            1e-3, 10.0)
        np.testing.assert_allclose(np.asarray(atten), 0.0, atol=1e-6)

    def test_clear_path(self):
        scene = procedural.box_scene()
        atten = isect.occlusion_brute(
            scene, jnp.asarray([[0.0, 3.0, 0.0]]), jnp.asarray([[0.0, 1.0, 0.0]]),
            1e-3, 10.0)
        np.testing.assert_allclose(np.asarray(atten), 1.0, atol=1e-6)

    def test_refractive_attenuates_not_blocks(self):
        scene = _random_scene(num_tris=1, kind=MATL_REFRACTION)
        # build a simple big triangle in the path
        v = np.array([[-5, -5, 0], [5, -5, 0], [0, 5, 0]], np.float32)
        t = np.array([[0, 1, 2]])
        mats = Materials.create([MATL_REFRACTION], [[1, 1, 1]])
        scene = type(scene).build(v, t, np.zeros(1, np.int32), mats)
        atten = np.asarray(isect.occlusion_brute(
            scene, jnp.asarray([[0.0, 0.0, 3.0]]), jnp.asarray([[0.0, 0.0, -1.0]]),
            1e-3, 10.0))
        assert (atten > 0).all() and (atten < 1.0 + 1e-6).all()

    def test_matches_numpy_reference(self):
        scene = procedural.earth_scene()
        ro, rd = _random_rays(100, seed=5)
        ro[:, 1] += 2
        atten = isect.occlusion_brute(scene, jnp.asarray(ro), jnp.asarray(rd),
                                      1e-3, 8.0)
        sc = refnp.scene_to_np(scene)
        ref = refnp.occlusion(sc, ro, rd, np.full(100, 1e-3, np.float32),
                              np.full(100, 8.0, np.float32))
        np.testing.assert_allclose(np.asarray(atten), ref, atol=1e-5)


class TestHitSurface:
    def test_barycentric_interpolation(self):
        v = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
        t = np.array([[0, 1, 2]])
        uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        mats = Materials.create([MATL_DIFFUSE], [[0.5, 0.6, 0.7]])
        scene = Scene.build(v, t, np.zeros(1, np.int32), mats, uvs=uvs)
        ro = jnp.asarray([[0.5, 0.5, 1.0]])
        rd = jnp.asarray([[0.0, 0.0, -1.0]])
        hit = isect.intersect_brute(scene, ro, rd, 1e-4, 1e30)
        surf = isect.hit_surface(scene, ro, rd, hit)
        np.testing.assert_allclose(np.asarray(surf["uv"])[0], [0.25, 0.25], atol=1e-5)
        np.testing.assert_allclose(np.asarray(surf["point"])[0], [0.5, 0.5, 0], atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(surf["gnormal"])[0, 2]), 1.0, atol=1e-5)


class TestEpsilonOffsetRefinement:
    """Justifies replacing the reference's integer-ulp hit refinement
    (intersection_refinement.h:36-99) with the geometric-normal epsilon
    offset (render/shade.py new-origin construction): secondary rays
    re-launched from epsilon-offset hit points must never re-hit their
    own surface ("shadow acne"), even at grazing incidence — and the
    margin holds with the epsilon shrunk 4x below the configured
    scene_epsilon=1e-3 (config.py)."""

    @pytest.mark.parametrize("eps", [1e-3, 2.5e-4])
    def test_grazing_secondary_rays_no_self_hit(self, eps):
        # a finely tessellated tilted quad: many coplanar triangles so a
        # refired grazing ray sweeps low over MANY triangles of the same
        # surface (worst case for acne)
        n = 24
        ys, xs = np.mgrid[0:n + 1, 0:n + 1].astype(np.float32) / n
        # tilt the plane so hit points have mixed-magnitude coordinates
        verts = np.stack(
            [xs * 8 - 4, 0.3 * xs + 0.1 * ys, ys * 8 - 4],
            axis=-1).reshape(-1, 3)
        quad = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
        t0 = np.stack([quad[:-1, :-1], quad[1:, :-1], quad[:-1, 1:]], -1)
        t1 = np.stack([quad[1:, :-1], quad[1:, 1:], quad[:-1, 1:]], -1)
        tris = np.concatenate([t0.reshape(-1, 3), t1.reshape(-1, 3)])
        mats = Materials.create([MATL_DIFFUSE], [[0.8, 0.8, 0.8]])
        scene = Scene.build(verts, tris, np.zeros(len(tris), np.int32),
                            mats)

        # primary rays from above at steep-to-grazing angles
        rng = np.random.default_rng(11)
        m = 256
        ro = np.stack([rng.uniform(-3, 3, m), np.full(m, 4.0, np.float32),
                       rng.uniform(-3, 3, m)], -1).astype(np.float32)
        aim = np.stack([rng.uniform(-3.5, 3.5, m),
                        0.3 * rng.uniform(0, 1, m),
                        rng.uniform(-3.5, 3.5, m)], -1).astype(np.float32)
        rd = aim - ro
        rd /= np.linalg.norm(rd, axis=1, keepdims=True)

        hit = isect.intersect_brute(scene, jnp.asarray(ro), jnp.asarray(rd),
                                    1e-4, 1e30)
        surf = isect.hit_surface(scene, jnp.asarray(ro), jnp.asarray(rd),
                                 hit)
        valid = np.asarray(hit.valid)
        assert valid.sum() > m // 2

        point = np.asarray(surf["point"])
        gn = np.asarray(surf["gnormal"])
        # secondary directions: nearly parallel to the surface (grazing),
        # slightly upward — the acne-prone regime
        tang = np.stack([np.ones(m), np.zeros(m), np.ones(m)],
                        -1).astype(np.float32)
        tang /= np.linalg.norm(tang, axis=1, keepdims=True)
        sec = tang + 0.02 * gn
        sec /= np.linalg.norm(sec, axis=1, keepdims=True)
        side = np.where(np.sum(sec * gn, -1) >= 0, 1.0, -1.0)[:, None]
        new_o = point + gn * (side * eps)

        hit2 = isect.intersect_brute(scene, jnp.asarray(new_o),
                                     jnp.asarray(sec), eps, 1e30)
        t2 = np.asarray(hit2.t)[valid]
        v2 = np.asarray(hit2.valid)[valid]
        # a self-hit shows up as a hit at distance ~epsilon; real
        # surface exits at grazing incidence are far away (plane is flat)
        near_self = v2 & (t2 < 0.05)
        assert near_self.sum() == 0, (
            f"{near_self.sum()} grazing secondary rays re-hit their own "
            f"surface at eps={eps}")
