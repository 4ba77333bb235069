"""Allclose parity between the JAX wavefront shader and the independent
numpy reference renderer (BASELINE config 1 requirement)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fovtrace import RenderConfig, Camera
from fovtrace.core import rng
from fovtrace.render import shade
from fovtrace.scene import procedural

import reference_renderer as refnp


def _rays(scene_cam, w=32, h=32):
    ro, rd = scene_cam.primary_rays(w, h)
    return np.asarray(ro).reshape(-1, 3), np.asarray(rd).reshape(-1, 3)


@pytest.mark.parametrize("scene_name,max_depth", [
    ("box", 2),
    ("earth", 4),
    ("bunny", 4),
    ("multi", 4),
])
def test_shade_matches_numpy(scene_name, max_depth):
    scene = procedural.SCENES[scene_name]()
    config = RenderConfig(width=32, height=32, max_depth=max_depth,
                          diffuse_max_depth=2)
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.6, 0.0))
    ro, rd = _rays(cam)
    seeds_np = refnp.tea(np.arange(len(ro), dtype=np.uint32), np.uint32(0))
    seeds = rng.pixel_seed(jnp.arange(len(ro)), 0)
    np.testing.assert_array_equal(np.asarray(seeds), seeds_np)

    got, _ = shade.shade(scene, jnp.asarray(ro), jnp.asarray(rd), seeds, config)
    want = refnp.shade_np(scene, ro, rd, seeds_np, config)

    got = np.asarray(got)
    assert np.isfinite(got).all()
    # Identical algorithm & rng -> tight f32 tolerance on nearly all
    # elements. A fraction of a percent of pixels sit on discrete hit /
    # TIR decision boundaries where numpy's silent f64 promotion flips
    # the branch vs pure-f32 JAX; those legitimately diverge after
    # multiple specular bounces, so require >= 99.5% agreement instead
    # of 100%.
    close = np.isclose(got, want, rtol=2e-3, atol=2e-3)
    frac = close.mean()
    assert frac >= 0.995, f"only {frac:.4f} of elements within tolerance"
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=5e-3, atol=5e-3)


def test_envmap_lookup_matches():
    scene = procedural.box_scene()
    rngnp = np.random.default_rng(0)
    dirs = rngnp.normal(size=(500, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    got = np.asarray(shade.envmap_lookup(scene.envmap, jnp.asarray(dirs)))
    want = refnp.envmap_lookup(np.asarray(scene.envmap), dirs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_diffuse_gi_adds_energy():
    """More GI bounces -> more (or equal) energy on a diffuse scene."""
    scene = procedural.box_scene()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.6, 0.0))
    ro, rd = _rays(cam, 16, 16)
    seeds = rng.pixel_seed(jnp.arange(len(ro)), 0)
    c1 = RenderConfig(width=16, height=16, diffuse_max_depth=1, max_depth=3)
    c3 = RenderConfig(width=16, height=16, diffuse_max_depth=3, max_depth=3)
    r1, _ = shade.shade(scene, jnp.asarray(ro), jnp.asarray(rd), seeds, c1)
    r3, _ = shade.shade(scene, jnp.asarray(ro), jnp.asarray(rd), seeds, c3)
    assert float(r3.sum()) >= float(r1.sum()) - 1e-3
