"""Differentiability: finite-difference checks on smooth parameters
(SURVEY.md §7 step 6 — camera/light/material/envmap gradients; discrete
hit ids and the sample mask are stop-gradiented)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovtrace import RenderConfig, Camera
from fovtrace.core import rng
from fovtrace.render import pipeline, shade
from fovtrace.scene import procedural


def _loss_through_shade(scene, config, cam):
    ro, rd = cam.primary_rays(16, 16)
    seeds = rng.pixel_seed(jnp.arange(256), 0)
    radiance, _ = shade.shade(scene, ro.reshape(-1, 3), rd.reshape(-1, 3),
                              seeds, config)
    return jnp.mean(radiance)


def _fd_check(f, x, eps, rtol, atol=1e-6):
    fj = jax.jit(f)
    g = jax.jit(jax.grad(f))(x)
    g = np.asarray(g).ravel()
    x_flat = np.asarray(x, np.float64).ravel()
    fd = np.zeros_like(x_flat)
    for i in range(len(x_flat)):
        xp = x_flat.copy(); xp[i] += eps
        xm = x_flat.copy(); xm[i] -= eps
        shape = np.asarray(x).shape
        fd[i] = (float(fj(jnp.asarray(xp.reshape(shape), jnp.float32)))
                 - float(fj(jnp.asarray(xm.reshape(shape), jnp.float32)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=rtol, atol=atol)
    assert np.abs(g).sum() > 0


@pytest.fixture(scope="module")
def env():
    scene = procedural.box_scene()
    config = RenderConfig(width=16, height=16, max_depth=2, diffuse_max_depth=1)
    cam = Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))
    return scene, config, cam


def test_light_emission_grad(env):
    scene, config, cam = env

    def f(emission):
        s = scene.replace(light=scene.light.replace(emission=emission))
        return _loss_through_shade(s, config, cam)

    _fd_check(f, scene.light.emission, eps=1.0, rtol=5e-2)


def test_albedo_grad(env):
    scene, config, cam = env

    def f(kd):
        s = scene.replace(materials=scene.materials.replace(kd=kd))
        return _loss_through_shade(s, config, cam)

    _fd_check(f, scene.materials.kd, eps=1e-3, rtol=5e-2, atol=1e-4)


def test_envmap_grad(env):
    scene, config, cam = env

    def f(scale):
        s = scene.replace(envmap=scene.envmap * scale)
        return _loss_through_shade(s, config, cam)

    _fd_check(f, jnp.asarray(1.0), eps=1e-3, rtol=5e-2)


def test_camera_eye_grad(env):
    scene, config, cam = env

    def f(eye):
        return _loss_through_shade(scene, config, cam.replace(eye=eye))

    g = jax.grad(f)(cam.eye)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_full_pipeline_grad(env):
    """Gradient flows through the whole frame (mask stop-gradiented)."""
    scene, config, cam = env
    cfg = RenderConfig(width=32, height=32, max_depth=2,
                       reconstruction="pullpush", ray_budget_frac=0.8)
    state = pipeline.FrameState.initial(cam, cfg)
    gaze = (jnp.asarray(16), jnp.asarray(16))

    def f(emission):
        s = scene.replace(light=scene.light.replace(emission=emission))
        out, _ = pipeline.render_frame(s, cam, gaze, state, cfg)
        return jnp.mean(out["image"])

    g = jax.grad(f)(scene.light.emission)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.slow
def test_gaze_optimization_step(env):
    """The config-5 demo primitive: optimize camera eye against a target
    image with optax — loss must decrease."""
    import optax

    scene, config, cam = env
    target_cam = cam
    start_cam = cam.replace(eye=cam.eye + jnp.asarray([0.3, -0.2, 0.25]))

    def render(c):
        ro, rd = c.primary_rays(16, 16)
        seeds = rng.pixel_seed(jnp.arange(256), 0)
        r, _ = shade.shade(scene, ro.reshape(-1, 3), rd.reshape(-1, 3),
                           seeds, config)
        return r

    target = jax.lax.stop_gradient(render(target_cam))

    def loss_fn(eye):
        return jnp.mean((render(start_cam.replace(eye=eye)) - target) ** 2)

    opt = optax.adam(3e-2)
    eye = start_cam.eye
    opt_state = opt.init(eye)
    l0 = float(loss_fn(eye))
    step = jax.jit(lambda e, s: _step(e, s, loss_fn, opt))
    for _ in range(12):
        eye, opt_state = step(eye, opt_state)
    l1 = float(loss_fn(eye))
    assert l1 < l0 * 0.7


def _step(eye, opt_state, loss_fn, opt):
    g = jax.grad(loss_fn)(eye)
    updates, opt_state = opt.update(g, opt_state)
    import optax
    return optax.apply_updates(eye, updates), opt_state


# --------------------------------------------------------- gaze gradients
def _gaze_loss(scene, cam, config, gaze_uv, target, soft):
    """Foveated-reconstruction MSE as a function of the gaze field
    (dist.train.render_rows_foveated, single tile = whole frame)."""
    from fovtrace.dist import train

    params = train.init_params(scene, cam)._replace(gaze_uv=gaze_uv)
    img = train.render_rows_foveated(scene, cam, params, 0, config.height,
                                     config, jnp.asarray(0, jnp.int32),
                                     soft=soft)
    return jnp.mean((img - target) ** 2)


@pytest.fixture(scope="module")
def gaze_env():
    scene = procedural.box_scene()
    config = RenderConfig(width=32, height=32, max_depth=2,
                          diffuse_max_depth=1, aperture=0.2, p_min=0.05)
    cam = Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))
    from fovtrace.dist import train

    true_gaze = jnp.asarray([0.62, 0.41], jnp.float32)
    params = train.init_params(scene, cam)._replace(gaze_uv=true_gaze)
    target = jax.lax.stop_gradient(train.render_rows_foveated(
        scene, cam, params, 0, config.height, config,
        jnp.asarray(0, jnp.int32), soft=True))
    return scene, config, cam, true_gaze, target


def test_gaze_grad_fd(gaze_env):
    """North-star 'gradients w.r.t. gaze field': the soft (expected-
    coverage) foveated loss is smooth in gaze_uv — FD must match."""
    scene, config, cam, true_gaze, target = gaze_env
    start = jnp.asarray([0.45, 0.55], jnp.float32)
    f = lambda g: _gaze_loss(scene, cam, config, g, target, soft=True)
    _fd_check(f, start, eps=1e-3, rtol=8e-2, atol=1e-7)


@pytest.mark.slow
def test_gaze_optimization_recovers_gaze(gaze_env):
    """Optimize gaze_uv to match a target rendered at the true gaze: the
    gaze error must shrink (the expected-reconstruction surrogate is the
    optimizer loss; its gradient is what the straight-through hard
    estimator approximates in expectation)."""
    import optax

    scene, config, cam, true_gaze, target = gaze_env
    f = jax.jit(jax.value_and_grad(
        lambda g: _gaze_loss(scene, cam, config, g, target, soft=True)))
    gaze = jnp.asarray([0.45, 0.55], jnp.float32)
    err0 = float(jnp.linalg.norm(gaze - true_gaze))
    opt = optax.adam(3e-2)
    st = opt.init(gaze)
    for _ in range(30):
        _, g = f(gaze)
        up, st = opt.update(g, st)
        gaze = optax.apply_updates(gaze, up)
        gaze = jnp.clip(gaze, 0.0, 1.0)
    err1 = float(jnp.linalg.norm(gaze - true_gaze))
    assert err1 < err0 * 0.5, (err0, err1)


def test_gaze_hard_straight_through_grad(gaze_env):
    """The production (hard-mask) estimator's straight-through gaze
    gradient is finite, nonzero, and points downhill at the start."""
    scene, config, cam, true_gaze, target = gaze_env
    start = jnp.asarray([0.45, 0.55], jnp.float32)
    g = jax.jit(jax.grad(
        lambda gz: _gaze_loss(scene, cam, config, gz, target,
                              soft=False)))(start)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    # descent direction correlates with the soft (expected) gradient
    gs = np.asarray(jax.jit(jax.grad(
        lambda gz: _gaze_loss(scene, cam, config, gz, target,
                              soft=True)))(start))
    assert float(np.dot(g, gs)) > 0.0


# ----------------------------------------------------- geometry gradients
def test_vertex_translation_grad_fd(env):
    """North-star 'gradients w.r.t. geometry': differentiate radiance
    w.r.t. a rigid vertex translation through refine_hit + shading (hit
    ids stop-gradiented; brute backend reads scene.v0 directly so the
    moved geometry is really re-intersected)."""
    scene, config, cam = env
    cfg = config.replace(intersect_backend="brute")

    def f(delta):
        s = scene.replace(v0=scene.v0 + delta)
        return _loss_through_shade(s, cfg, cam)

    _fd_check(f, jnp.zeros(3, jnp.float32), eps=2e-3, rtol=1e-1, atol=1e-4)


@pytest.mark.slow
def test_vertex_recovery_demo(env):
    """Toy inverse-geometry demo: recover a vertical object offset from
    image differences by gradient descent on the translation."""
    import optax

    scene, config, cam = env
    cfg = config.replace(intersect_backend="brute")

    def render(delta):
        s = scene.replace(v0=scene.v0 + delta)
        ro, rd = cam.primary_rays(16, 16)
        seeds = rng.pixel_seed(jnp.arange(256), 0)
        r, _ = shade.shade(s, ro.reshape(-1, 3), rd.reshape(-1, 3), seeds,
                           cfg)
        return r

    true_delta = jnp.asarray([0.0, 0.12, 0.0], jnp.float32)
    target = jax.lax.stop_gradient(render(true_delta))
    loss = lambda d: jnp.mean((render(d) - target) ** 2)
    f = jax.jit(jax.value_and_grad(loss))
    delta = jnp.zeros(3, jnp.float32)
    err0 = float(jnp.linalg.norm(delta - true_delta))
    opt = optax.adam(3e-2)
    st = opt.init(delta)
    for _ in range(40):
        _, g = f(delta)
        up, st = opt.update(g, st)
        delta = optax.apply_updates(delta, up)
    err1 = float(jnp.linalg.norm(delta - true_delta))
    assert err1 < err0 * 0.6, (err0, err1)
