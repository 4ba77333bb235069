"""Pallas cluster-intersection kernel vs brute force (interpret mode on
CPU; the same kernel compiles on TPU). SURVEY.md §4: every kernel gets a
reference-implementation parity test."""

import numpy as np
import jax.numpy as jnp
import pytest

from fovtrace import Camera
from fovtrace.core import vec
from fovtrace.kernels import intersect as isect
from fovtrace.kernels import pallas_isect
from fovtrace.scene import procedural


def _v(rows):
    return vec.from_rows(jnp.asarray(rows))


@pytest.mark.parametrize("scene_name", ["box", "earth", "multi"])
def test_closest_hit_matches_brute(scene_name):
    scene = procedural.SCENES[scene_name]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    ro, rd = cam.primary_rays(32, 32)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hb = isect.intersect_brute(scene, ro, rd, 1e-3, isect.BIG_T)
    hp = pallas_isect.intersect_pallas(scene, _v(ro), _v(rd), 1e-3,
                                       isect.BIG_T)
    tb = np.asarray(hb.tri)
    tp = np.asarray(hp.tri)
    # bf16 candidate selection may flip the winner ID exactly on shared
    # triangle edges — legal iff the refined hit is at the same depth.
    # hit<->miss flips (silhouette changes) are NOT allowed.
    assert ((tb >= 0) == (tp >= 0)).all()
    # kernel t is a bf16-matmul selection value; exact t/u/v come from
    # refine_hit on the winning id (what intersect() returns)
    hr = isect.refine_hit(scene, ro, rd, hp)
    hit = tb >= 0
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hr.t)[hit],
                               rtol=1e-3, atol=1e-4)
    same = hit & (tb == tp)
    assert same.sum() >= hit.sum() * 0.995, "edge-tie flips must be rare"
    np.testing.assert_allclose(np.asarray(hb.u)[same], np.asarray(hr.u)[same],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("scene_name", ["box", "earth"])
def test_occlusion_matches_brute(scene_name):
    scene = procedural.SCENES[scene_name]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    ro, rd = cam.primary_rays(16, 16)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)
    hit = isect.intersect_brute(scene, ro, rd, 1e-3, isect.BIG_T)
    surf = isect.hit_surface(scene, ro, rd, hit)
    light = scene.light
    lp = light.corner + 0.3 * light.v1 + 0.6 * light.v2
    to_l = lp - surf["point"]
    ld = jnp.linalg.norm(to_l, axis=-1)
    l = to_l / ld[:, None]
    o = surf["point"] + surf["gnormal"] * 1e-3
    ab = isect.occlusion_brute(scene, o, l, 1e-3, ld - 1e-3)
    ap = vec.to_rows(pallas_isect.occlusion_pallas(scene, _v(o), _v(l),
                                                   1e-3, ld - 1e-3))
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ap),
                               rtol=1e-4, atol=1e-4)


def test_pack_shapes():
    scene = procedural.SCENES["earth"]()
    assert scene.isect_coef is not None, "with_bvh should precompute the pack"
    coef, aux, cl = scene.isect_coef, scene.isect_aux, scene.cluster_aabb
    nc = cl.shape[0]
    assert coef.shape[0] == nc and coef.shape[1] == 16
    c = coef.shape[2] // 4            # adaptive cluster width
    assert c % pallas_isect.CLUSTER == 0
    assert nc <= pallas_isect.MAX_CLUSTERS
    assert aux.shape == (nc, 8, c)
    assert cl.shape == (nc, 8)
    # cluster AABBs contain their (valid) triangles
    valid = np.asarray(scene.mat_id) >= 0
    v0 = np.asarray(scene.v0)[valid]
    assert (v0.min(0) >= np.asarray(cl[:, 0:3]).min(0) - 1e-5).all()
    assert (v0.max(0) <= np.asarray(cl[:, 3:6]).max(0) + 1e-5).all()


def test_ragged_ray_count():
    """N not a multiple of RAY_BLOCK pads/unpads correctly."""
    scene = procedural.SCENES["box"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    ro, rd = cam.primary_rays(16, 16)
    ro = ro.reshape(-1, 3)[:100]
    rd = rd.reshape(-1, 3)[:100]
    hb = isect.intersect_brute(scene, ro, rd, 1e-3, isect.BIG_T)
    hp = pallas_isect.intersect_pallas(scene, _v(ro), _v(rd), 1e-3,
                                       isect.BIG_T)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hp.tri))


@pytest.mark.parametrize("scene_name", ["earth", "multi"])
def test_streaming_kernel_matches_resident(scene_name, monkeypatch):
    """The HBM-streaming double-buffered kernel path (large packs) must
    produce identical winners/attenuation to the VMEM-resident path —
    forced here by zeroing the residency budget on a small scene."""
    scene = procedural.SCENES[scene_name]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    ro, rd = cam.primary_rays(24, 24)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)

    hp = pallas_isect.intersect_pallas(scene, _v(ro), _v(rd), 1e-3,
                                       isect.BIG_T)
    op = pallas_isect.occlusion_pallas(scene, _v(ro), _v(rd), 1e-3,
                                       isect.BIG_T)
    monkeypatch.setattr(pallas_isect, "_COEF_RESIDENT_BYTES", 0)
    # clear the jit caches that captured the static branch
    pallas_isect._closest_call_pre.clear_cache()
    pallas_isect._occlusion_call_pre.clear_cache()
    try:
        hs = pallas_isect.intersect_pallas(scene, _v(ro), _v(rd), 1e-3,
                                           isect.BIG_T)
        os_ = pallas_isect.occlusion_pallas(scene, _v(ro), _v(rd), 1e-3,
                                            isect.BIG_T)
    finally:
        pallas_isect._closest_call_pre.clear_cache()
        pallas_isect._occlusion_call_pre.clear_cache()

    np.testing.assert_array_equal(np.asarray(hp.tri), np.asarray(hs.tri))
    np.testing.assert_allclose(np.asarray(hp.t), np.asarray(hs.t),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(op, os_):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_supercluster_members_match_flat(monkeypatch):
    """The two-level schedule (M > 1 member clusters per supercluster,
    bitmask skipping — the big-scene path) must match the flat M == 1
    result — forced on a small scene by shrinking MAX_SCHED so
    pick_members returns M = 8."""
    scene = procedural.SCENES["multi"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    ro, rd = cam.primary_rays(24, 24)
    ro = ro.reshape(-1, 3)
    rd = rd.reshape(-1, 3)

    hb = isect.intersect_brute(scene, ro, rd, 1e-3, isect.BIG_T)
    ob = isect.occlusion_brute(scene, ro, rd, 1e-3, isect.BIG_T)

    monkeypatch.setattr(pallas_isect, "MAX_SCHED", 4)
    monkeypatch.setattr(pallas_isect, "_COEF_RESIDENT_BYTES", 0)
    pallas_isect._closest_call_pre.clear_cache()
    pallas_isect._occlusion_call_pre.clear_cache()
    try:
        scene2 = scene.with_pack()       # repack under the new grouping
        assert pallas_isect.pick_members(scene2.cluster_aabb.shape[0]) > 1
        hs = pallas_isect.intersect_pallas(scene2, _v(ro), _v(rd), 1e-3,
                                           isect.BIG_T)
        os_ = pallas_isect.occlusion_pallas(scene2, _v(ro), _v(rd), 1e-3,
                                            isect.BIG_T)
    finally:
        pallas_isect._closest_call_pre.clear_cache()
        pallas_isect._occlusion_call_pre.clear_cache()

    tb, ts = np.asarray(hb.tri), np.asarray(hs.tri)
    assert ((tb >= 0) == (ts >= 0)).all()
    same = (tb >= 0) & (tb == ts)
    assert same.sum() >= (tb >= 0).sum() * 0.995
    np.testing.assert_allclose(np.asarray(ob), np.asarray(vec.to_rows(os_)),
                               rtol=1e-4, atol=1e-4)
