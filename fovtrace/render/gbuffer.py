"""Full-resolution primary-ray G-buffer pass.

TPU-native counterpart of OptiX entry point 0
(`g_buffer_trace_camera.cu:84-151` raygen + `g_diffuse.cu:67-144`
closest-hit): one primary ray per pixel, writing

  position [H,W,3]  world hit point (prd.origin)
  normal   [H,W,3]  geometric normal (unpacked; the reference stores
                    n*0.5+0.5 for display — we keep raw [-1,1])
  shadow   [H,W]    binary light visibility (normal_buffer.w = prd.radiance.x)
  depth    [H,W]    view distance ||hit - eye|| (depth_buffer.x)
  albedo   [H,W,3]  Kd-modulated result (diffuse_buffer)
  reproject_uv [H,W,2]  prev-frame pixel uv via prev camera MVP
                    (g_diffuse.cu:95 compute_reprojection), -1 on miss

All buffers come from ONE intersection pass — the reference re-traces;
we reuse the hit record for every channel.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from fovtrace.core import mathx
from fovtrace.kernels import intersect as isect


def _can_swizzle(height: int, width: int, tile: int = 16) -> bool:
    return height % tile == 0 and width % tile == 0


def swizzle_to_tiles(x, height: int, width: int, tile: int = 16):
    """Scanline-flat [H*W, C?] -> tile-major flat, as reshape+transpose
    (a regular permutation — far cheaper on TPU than a gather). Tile
    order makes each 256-ray kernel block a compact screen tile, so the
    intersection kernel's bundle frustums are tight (better cluster
    culling)."""
    ch = x.shape[1:]
    x = x.reshape((height // tile, tile, width // tile, tile) + ch)
    x = x.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(ch))))
    return x.reshape((height * width,) + ch)


def unswizzle_from_tiles(x, height: int, width: int, tile: int = 16):
    """Inverse of swizzle_to_tiles."""
    ch = x.shape[1:]
    x = x.reshape((height // tile, width // tile, tile, tile) + ch)
    x = x.transpose((0, 2, 1, 3) + tuple(range(4, 4 + len(ch))))
    return x.reshape((height * width,) + ch)


def trace_gbuffer(scene, camera, prev_camera, width: int, height: int, config,
                  y0: int | None = None, block_h: int | None = None):
    """Returns dict of G-buffers.

    With y0/block_h set, traces only rows [y0, y0+block_h) — the
    row-sharded path's per-device body (dist.sharding); y0 may be traced
    as a dynamic value (tile * block_h)."""
    if block_h is None:
        ro, rd = camera.primary_rays(width, height)
        bh = height
    else:
        ro, rd = camera.primary_rays_block(width, height, y0, block_h)
        bh = block_h
    ro_f = ro.reshape(-1, 3)
    rd_f = rd.reshape(-1, 3)

    sw = block_h is None and _can_swizzle(height, width)
    if sw:
        ro_f = swizzle_to_tiles(ro_f, height, width)
        rd_f = swizzle_to_tiles(rd_f, height, width)

    hit = isect.intersect(scene, ro_f, rd_f, config.scene_epsilon,
                                isect.BIG_T)
    surf = isect.hit_surface(scene, ro_f, rd_f, hit)
    valid = hit.valid

    point = jnp.where(valid[:, None], surf["point"], 0.0)
    gnormal = jnp.where(valid[:, None], surf["gnormal"], 0.0)
    depth = jnp.where(valid, mathx.length(point - camera.eye), 0.0)

    # one-sample binary shadow term toward the light's far corner
    # (g_diffuse.cu:110-137: light_pos = corner + v1 + v2, inShadow flag)
    light = scene.light
    light_pos = light.corner + light.v1 + light.v2
    to_l = light_pos - point
    ldist = mathx.length(to_l)
    l = to_l / jnp.maximum(ldist[:, None], 1e-20)
    n_ff = mathx.faceforward(surf["normal"], -rd_f, surf["gnormal"])
    ndl = jnp.sum(n_ff * l, axis=-1)
    lndl = jnp.sum(light.normal * l, axis=-1)
    shadow_relevant = valid & (ndl > 0.0) & (lndl > 0.0)
    atten = isect.occlusion(
        scene, point + n_ff * config.scene_epsilon, l,
        config.scene_epsilon,
        # misses / backfacing pixels: t_max=-1 -> culled in the kernel
        jnp.where(shadow_relevant, ldist - config.scene_epsilon, -1.0),
    )
    lit = jnp.max(atten, axis=-1) > 0.0
    shadow_term = jnp.where(shadow_relevant, lit.astype(jnp.float32), 0.0)

    albedo = jnp.where(valid[:, None], surf["kd"], 0.0)

    # reverse reprojection into the previous frame's screen
    reproject = prev_camera.world_to_screen(point, width, height)
    reproject = jnp.where(valid[:, None], reproject, -1.0)

    if sw:
        unsw = lambda a: unswizzle_from_tiles(a, height, width)
        point, gnormal, shadow_term, depth, albedo, reproject, valid = (
            unsw(point), unsw(gnormal), unsw(shadow_term), unsw(depth),
            unsw(albedo), unsw(reproject), unsw(valid),
        )

    shp = (bh, width)
    return {
        "position": point.reshape(shp + (3,)),
        "normal": gnormal.reshape(shp + (3,)),
        "shadow": shadow_term.reshape(shp),
        "depth": depth.reshape(shp),
        "albedo": albedo.reshape(shp + (3,)),
        "reproject_uv": reproject.reshape(shp + (2,)),
        "hit_valid": valid.reshape(shp),
        # primary rays + issued shadow rays (bench accounting)
        "rays_traced": (
            jnp.asarray(bh * width, jnp.int32)
            + jnp.sum(shadow_relevant.astype(jnp.int32))
        ),
    }
