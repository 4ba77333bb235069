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


def init_params(scene, camera: Camera) -> TrainParams:
    return TrainParams(
        eye=camera.eye,
        target=camera.target,
        gaze_uv=jnp.asarray([0.5, 0.5], jnp.float32),
        light_emission=scene.light.emission,
        kd=scene.materials.kd,
    )


def _apply_params(scene, camera: Camera, params: TrainParams):
    cam = camera.replace(eye=params.eye, target=params.target)
    sc = scene.replace(
        light=scene.light.replace(emission=params.light_emission),
        materials=scene.materials.replace(kd=params.kd),
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


def make_train_step(scene, camera: Camera, config: RenderConfig, mesh: Mesh,
                    optimizer=None):
    """Build a jitted sharded train step:
      (params, opt_state, target_rows [H,W,3] row-sharded, frame)
        -> (params, opt_state, loss)
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    n_tiles = mesh.devices.size
    assert config.height % n_tiles == 0
    block_h = config.height // n_tiles

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
            img = render_rows_dense(sc_i, cam_i, p, y0, block_h, config, fr)
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
