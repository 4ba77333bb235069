"""Differentiable-rendering training step over the device mesh.

The BASELINE config-5 requirement: differentiable gaze/camera optimization
with rays/tiles sharded across N devices/hosts, parameter gradients
all-reduced. Parameters (camera pose, gaze, light, materials, envmap) are
replicated; pixels are row-sharded; the loss is a mean over sharded
pixels, so `jax.grad` through `shard_map` inserts the `psum`
automatically in the transpose (overlapping with backward under XLA's
latency-hiding scheduler).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fovtrace.config import RenderConfig
from fovtrace.core import color as colorx
from fovtrace.core import rng
from fovtrace.core.camera import Camera
from fovtrace.dist import sharding as shd
from fovtrace.render import shade as shade_mod


class TrainParams(NamedTuple):
    """The differentiable parameter pytree."""

    eye: jnp.ndarray          # [3] camera position
    target: jnp.ndarray       # [3] camera look-at
    gaze_uv: jnp.ndarray      # [2] normalized gaze position in [0,1]
    light_emission: jnp.ndarray  # [3]
    kd: jnp.ndarray           # [M,3] material albedos
    envmap: jnp.ndarray       # [He,We,3] lat-long environment radiance
    #                           (gradients flow through the bilinear miss
    #                           lookup, shade.envmap_lookup_v)


def init_params(scene, camera: Camera) -> TrainParams:
    return TrainParams(
        eye=camera.eye,
        target=camera.target,
        gaze_uv=jnp.asarray([0.5, 0.5], jnp.float32),
        light_emission=scene.light.emission,
        kd=scene.materials.kd,
        envmap=scene.envmap,
    )


def _apply_params(scene, camera: Camera, params: TrainParams):
    cam = camera.replace(eye=params.eye, target=params.target)
    sc = scene.replace(
        light=scene.light.replace(emission=params.light_emission),
        materials=scene.materials.replace(kd=params.kd),
        envmap=params.envmap,
    )
    return sc, cam


def render_rows_dense(scene, camera, params: TrainParams, y0, block_h: int,
                      config: RenderConfig, frame):
    """Dense differentiable render of one row block (full sampling; the
    training loss needs every pixel defined). Pure function of params."""
    h, w = config.height, config.width
    ro, rd = camera.primary_rays_block(w, h, y0, block_h)
    seeds = rng.pixel_seed(
        jnp.arange(block_h * w, dtype=jnp.uint32)
        + jnp.asarray(y0, jnp.uint32) * jnp.uint32(w),
        frame,
    )
    radiance, _ = shade_mod.shade(
        scene, ro.reshape(-1, 3), rd.reshape(-1, 3), seeds, config
    )
    img = colorx.uncharted2_tonemap(radiance, config.exposure_bias)
    return img.reshape(block_h, w, 3)


def render_rows_foveated(scene, camera, params: TrainParams, y0,
                         block_h: int, config: RenderConfig, frame,
                         soft: bool = False):
    """DIFFERENTIABLE foveated render of one row block: the gaze field
    (params.gaze_uv, normalized [0,1]^2) drives a Weier sampling-rate
    falloff (samplingStep.cu:150-156); sampled radiance is reconstructed
    by the alpha-weighted pull-push pyramid. Gradients reach gaze_uv
    through the sample weights (SURVEY.md §7 hard part 3):

      - soft=True: the EXPECTED reconstruction — rate-blend of the sharp
        image with its neighborhood average,
            E[recon] ~ rate*img + (1-rate)*blur(img)
        (a hole interpolates its neighbors; a sampled pixel keeps its
        value). Smooth in gaze everywhere — used for FD checks and as a
        well-behaved surrogate loss.
      - soft=False: one hard Bernoulli mask realization + the real
        pull-push reconstruction, with a STRAIGHT-THROUGH alpha
        (value = hard, dL/dalpha flows as if soft). Gradient signal
        comes from hole pixels, whose fill is an alpha-weighted
        neighbor average (pullFS/pushFS weights) — the production
        estimator of the soft surrogate above.

    Returns [block_h, w, 3] reconstructed rows.
    """
    from fovtrace.core import vec
    from fovtrace.kernels import pullpush, sampling

    h, w = config.height, config.width
    img = render_rows_dense(scene, camera, params, y0, block_h, config,
                            frame)

    gy = params.gaze_uv[1] * (h - 1)
    gx = params.gaze_uv[0] * (w - 1)
    py = (jnp.arange(block_h, dtype=jnp.float32)[:, None]
          + jnp.asarray(y0, jnp.float32))
    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    gdist = jnp.sqrt((px - gx) ** 2 + (py - gy) ** 2) / jnp.sqrt(
        float(w) ** 2 + float(h) ** 2)
    rate = sampling.weier_sample_rate(gdist, config.aperture, config.p_min)

    rgb = vec.Vec3(img[..., 0], img[..., 1], img[..., 2])
    if soft:
        ones = jnp.ones_like(rate)
        blur_rgb, _ = pullpush._blur3_v(rgb, ones)
        out = rgb * rate + blur_rgb * (1.0 - rate)
    else:
        gidx = (jnp.arange(block_h)[:, None]
                + jnp.asarray(y0, jnp.int32)) * w + jnp.arange(w)[None, :]
        u01 = rng.rnd(rng.pixel_seed(gidx, frame + 7919))[0]
        hard = (u01 < rate).astype(jnp.float32)
        alpha = hard + rate - jax.lax.stop_gradient(rate)  # straight-through
        # rgb UN-premultiplied: pull computes sum(rgb*alpha)/sum(alpha),
        # push alpha-gates its taps -> fractional alphas weight correctly
        out, _ = pullpush.pull_push_v(rgb, alpha)
    return jnp.stack([out.x, out.y, out.z], axis=-1)


def make_train_step(scene, camera: Camera, config: RenderConfig, mesh: Mesh,
                    optimizer=None, foveated: bool = False,
                    soft_mask: bool = False):
    """Build a jitted sharded train step:
      (params, opt_state, target_rows [H,W,3] row-sharded, frame)
        -> (params, opt_state, loss)

    With foveated=True the render is the gaze-driven foveated
    reconstruction (render_rows_foveated) — gradients flow to
    params.gaze_uv through the sample-weight field; soft_mask selects
    the smooth expected-coverage estimator (for FD checks) over the
    straight-through hard mask.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    n_tiles = mesh.devices.size
    assert config.height % n_tiles == 0
    block_h = config.height // n_tiles
    render_rows = (
        functools.partial(render_rows_foveated, soft=soft_mask)
        if foveated else render_rows_dense)

    def loss_fn(params, target_rows, frame):
        sc, cam = _apply_params(scene, camera, params)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(shd.AXIS), P()),
            out_specs=P(),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
        def sharded_loss(p, tgt_rows, fr):
            tile = jax.lax.axis_index(shd.AXIS)
            y0 = tile * block_h
            sc_i, cam_i = _apply_params(scene, camera, p)
            img = render_rows(sc_i, cam_i, p, y0, block_h, config, fr)
            local = jnp.sum((img - tgt_rows) ** 2)
            return jax.lax.psum(local, shd.AXIS) / (
                config.height * config.width * 3
            )

        return sharded_loss(params, target_rows, frame)

    @jax.jit
    def train_step(params, opt_state, target_rows, frame):
        loss, grads = jax.value_and_grad(loss_fn)(params, target_rows, frame)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer
