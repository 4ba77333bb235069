"""Multi-device tests on the 8-CPU virtual mesh (SURVEY.md §4):
single-chip vs N-chip pixel parity, halo-exchange reconstruction parity,
and temporal-state equivalence across frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fovtrace import Camera, RenderConfig
from fovtrace.dist import sharding as shd
from fovtrace.render import pipeline
from fovtrace.scene import procedural

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(recon="atrous", h=64, w=64, frac=1.0):
    # budget frac 1.0: no compaction drops on either path -> exact parity
    config = RenderConfig(
        width=w, height=h, reconstruction=recon, max_depth=3,
        diffuse_max_depth=1, ray_budget_frac=frac,
        sharded_budget_factor=8.0,
    )
    scene = procedural.SCENES["multi"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    return config, scene, cam


@pytest.mark.parametrize("recon", ["atrous", "none"])
def test_sharded_matches_single_chip(recon):
    """The north-star parity requirement: 8-tile sharded render ==
    single-chip render, pixel for pixel, INCLUDING the temporal path
    (frame 2 consumes frame 1's history through reverse reprojection)."""
    config, scene, cam = _setup(recon)
    mesh = shd.make_mesh(8)
    gaze = (jnp.asarray(30), jnp.asarray(33))

    state1 = pipeline.FrameState.initial(cam, config)
    stateN = shd.initial_state_sharded(cam, config, mesh)

    render1 = jax.jit(lambda s, c, g, st: pipeline.render_frame(
        s, c, g, st, config))
    renderN = jax.jit(lambda s, c, g, st: shd.render_sharded(
        s, c, g, st, config, mesh))

    cam2 = cam.replace(eye=jnp.asarray([3.1, 2.4, 3.9]))
    for frame_cam in (cam, cam2):  # frame 2 moves the camera: real reproj
        out1, state1 = render1(scene, frame_cam, gaze, state1)
        outN, stateN = renderN(scene, frame_cam, gaze, stateN)

        np.testing.assert_array_equal(np.asarray(out1["mask"]),
                                      np.asarray(outN["mask"]))
        assert int(outN["rays_dropped"]) == 0
        assert int(out1["ray_count"]) == int(outN["ray_count"])
        np.testing.assert_allclose(
            np.asarray(out1["shading"]), np.asarray(outN["shading"]),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out1["image"]), np.asarray(outN["image"]),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(state1.history), np.asarray(stateN.history),
            rtol=2e-4, atol=2e-5)


def test_sharded_logpolar_mask_matches():
    """Sharded log-polar sampling evaluates the SAME global pattern per
    row block (VERDICT r03 weak #6)."""
    config, scene, cam = _setup("none")
    config = config.replace(sampling_mode="logpolar")
    mesh = shd.make_mesh(8)
    gaze = (jnp.asarray(30), jnp.asarray(33))

    state1 = pipeline.FrameState.initial(cam, config)
    stateN = shd.initial_state_sharded(cam, config, mesh)
    out1, _ = jax.jit(lambda s, c, g, st: pipeline.render_frame(
        s, c, g, st, config))(scene, cam, gaze, state1)
    outN, _ = jax.jit(lambda s, c, g, st: shd.render_sharded(
        s, c, g, st, config, mesh))(scene, cam, gaze, stateN)

    np.testing.assert_array_equal(np.asarray(out1["mask"]),
                                  np.asarray(outN["mask"]))
    assert int(outN["rays_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(out1["shading"]), np.asarray(outN["shading"]),
        rtol=2e-4, atol=2e-5)


def test_sharded_pullpush_matches():
    """Halo-exchange pull-push == single-chip pull-push on the gathered
    sparse buffer."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from fovtrace.dist import recon as recon_mod
    from fovtrace.kernels import pullpush

    mesh = shd.make_mesh(8)
    rng = np.random.default_rng(3)
    h, w = 128, 64
    sparse = rng.uniform(size=(h, w, 4)).astype(np.float32)
    sparse[..., 3] = (rng.uniform(size=(h, w)) < 0.2).astype(np.float32)
    sparse[..., :3] *= sparse[..., 3:4]
    sparse = jnp.asarray(sparse)

    want = pullpush.pull_push(sparse)

    def body(sp):
        from fovtrace.core import vec

        rgb, a = recon_mod.pull_push_sharded(
            vec.from_rows(sp[..., :3]), sp[..., 3], axis_name=shd.AXIS)
        return jnp.concatenate([vec.to_rows(rgb), a[..., None]], axis=-1)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(shd.AXIS), out_specs=P(shd.AXIS),
    ))
    got = f(sparse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharded_atrous_matches():
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from fovtrace.dist import recon as recon_mod
    from fovtrace.kernels import atrous

    mesh = shd.make_mesh(8)
    rng = np.random.default_rng(5)
    h, w = 64, 48
    color = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    nrm = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))

    for iters in (1, 2):
        want = atrous.atrous_denoise(color, pos, nrm, iters, 1.0, 0.5, 0.5)

        def body(c, p, n):
            from fovtrace.core import vec

            tile = jax.lax.axis_index(shd.AXIS)
            y0 = tile * (h // 8)
            out = recon_mod.atrous_sharded(
                vec.from_rows(c), vec.from_rows(p), vec.from_rows(n),
                iters, 1.0, 0.5, 0.5, shd.AXIS, y0, h)
            return vec.to_rows(out)

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(shd.AXIS), P(shd.AXIS), P(shd.AXIS)),
            out_specs=P(shd.AXIS),
        ))
        got = f(color, pos, nrm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6, err_msg=f"iters={iters}")


def test_tile_budget_drops_accounting():
    """With a starved budget, the sharded path reports dropped rays
    instead of silently losing them."""
    config, scene, cam = _setup("none", h=128, w=128, frac=0.05)
    # full sampling: every tile wants 16*128 = 2048 rays against a
    # 1024-slot budget -> guaranteed overflow
    config = config.replace(sharded_budget_factor=1.0, sampling_mode="full")
    mesh = shd.make_mesh(8)
    state = shd.initial_state_sharded(cam, config, mesh)
    out, _ = jax.jit(lambda s, c, g, st: shd.render_sharded(
        s, c, g, st, config, mesh))(
            scene, cam, jnp.asarray([32, 32]), state)
    assert int(out["rays_dropped"]) > 0
    assert int(out["ray_count"]) > int(out["rays_dropped"])
