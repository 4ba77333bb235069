import numpy as np
import jax.numpy as jnp
import pytest

from fovtrace.kernels import bvh_traverse, intersect as isect
from fovtrace.scene import bvh as bvh_mod
from fovtrace.scene import procedural


def _rays(n=500, seed=2, radius=6.0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-radius, radius, (n, 3)).astype(np.float32)
    ro[:, 1] = np.abs(ro[:, 1])
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


class TestBVHBuild:
    def test_leaves_cover_all_triangles(self):
        scene = procedural.earth_scene()
        valid = np.asarray(scene.mat_id) >= 0
        flat = bvh_mod.build_bvh(np.asarray(scene.v0), np.asarray(scene.e1),
                                 np.asarray(scene.e2), valid)
        covered = flat.order[flat.order >= 0]
        assert sorted(covered) == sorted(np.nonzero(valid)[0].tolist())

    def test_node_bounds_contain_children(self):
        scene = procedural.box_scene()
        valid = np.asarray(scene.mat_id) >= 0
        flat = bvh_mod.build_bvh(np.asarray(scene.v0), np.asarray(scene.e1),
                                 np.asarray(scene.e2), valid)
        for i in range(flat.num_nodes):
            if flat.nodes_leaf[i]:
                continue
            l, r = flat.nodes_left[i], flat.nodes_right[i]
            for c in (l, r):
                assert (flat.nodes_min[i] <= flat.nodes_min[c] + 1e-5).all()
                assert (flat.nodes_max[i] >= flat.nodes_max[c] - 1e-5).all()


@pytest.mark.parametrize("scene_name", ["box", "earth", "multi"])
def test_bvh_matches_brute(scene_name):
    scene = procedural.SCENES[scene_name]()
    scene_b = scene.with_bvh()
    ro, rd = _rays()
    brute = isect.intersect_brute(scene_b, ro, rd, 1e-3, 1e30)
    bvh = bvh_traverse.intersect_bvh(scene_b, ro, rd, 1e-3, 1e30, packet=128)
    # same t (the same triangle may appear under a different id only if
    # duplicated; with the same reordered scene ids must agree)
    np.testing.assert_allclose(np.asarray(bvh.t), np.asarray(brute.t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bvh.tri), np.asarray(brute.tri))


def test_bvh_occlusion_blocks_opaque():
    scene = procedural.box_scene().with_bvh()
    att = bvh_traverse.occlusion_bvh(
        scene, jnp.asarray([[0.0, 3.0, 0.0], [0.0, 3.0, 0.0]]),
        jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]]), 1e-3, 10.0,
        packet=2)
    a = np.asarray(att)
    np.testing.assert_allclose(a[0], 0.0, atol=1e-6)   # down through the box
    np.testing.assert_allclose(a[1], 1.0, atol=1e-6)   # up to the sky
