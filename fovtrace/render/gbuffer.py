"""Full-resolution primary-ray G-buffer pass.

TPU-native counterpart of OptiX entry point 0
(`g_buffer_trace_camera.cu:84-151` raygen + `g_diffuse.cu:67-144`
closest-hit): one primary ray per pixel, writing PLANAR buffers (round-3
layout — [H,W] planes / SoA Vec3, never [H,W,3]: the T(8,128) tiling
pads a 3-wide minor axis to 128 lanes, 42.7x):

  position     Vec3 of [H,W]  world hit point (prd.origin)
  normal       Vec3 of [H,W]  geometric normal (the reference stores
                              n*0.5+0.5 for display — we keep raw [-1,1])
  shadow       [H,W]          binary light visibility (normal_buffer.w)
  depth        [H,W]          view distance ||hit - eye|| (depth_buffer.x)
  albedo       Vec3 of [H,W]  Kd-modulated result (diffuse_buffer)
  reproject_u/v [H,W]         prev-frame pixel uv via prev camera MVP
                              (g_diffuse.cu:95 compute_reprojection), -1 on miss

All buffers come from ONE intersection pass — the reference re-traces;
we reuse the hit record for every channel.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from fovtrace.core import vec
from fovtrace.core.vec import Vec3
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
    """Returns dict of PLANAR G-buffers (see module docstring).

    With y0/block_h set, traces only rows [y0, y0+block_h) — the
    row-sharded path's per-device body (dist.sharding); y0 may be traced
    as a dynamic value (tile * block_h)."""
    bh = height if block_h is None else block_h
    ro, rd = camera.primary_rays_v(width, height,
                                   y0=0.0 if y0 is None else y0,
                                   block_h=bh)
    flat = lambda a: a.reshape(-1)
    ro_f = ro.map(flat)
    rd_f = rd.map(flat)

    sw = block_h is None and _can_swizzle(height, width)
    if sw:
        swz = lambda a: swizzle_to_tiles(a, height, width)
        ro_f = ro_f.map(swz)
        rd_f = rd_f.map(swz)

    # fused closest-hit + refine + surface fetch: one row gather where
    # the split calls pay two (~20 ms each at 2.1M rays)
    hit, surf = isect.intersect_surface_v(
        scene, ro_f, rd_f, config.scene_epsilon, isect.BIG_T,
        backend=config.intersect_backend)
    valid = hit.valid

    point = vec.where(valid, surf["point"], 0.0)
    gnormal = vec.where(valid, surf["gnormal"], 0.0)
    depth = jnp.where(valid, vec.length(point - vec.of(camera.eye)), 0.0)

    # one-sample binary shadow term toward the light's far corner
    # (g_diffuse.cu:110-137: light_pos = corner + v1 + v2, inShadow flag)
    light = scene.light
    light_pos = vec.of(light.corner + light.v1 + light.v2)
    to_l = light_pos - point
    ldist = vec.length(to_l)
    l = to_l * (1.0 / jnp.maximum(ldist, 1e-20))
    n_ff = vec.faceforward(surf["normal"], -rd_f, surf["gnormal"])
    ndl = vec.dot(n_ff, l)
    ln = vec.of(light.normal)
    lndl = ln.x * l.x + ln.y * l.y + ln.z * l.z
    shadow_relevant = valid & (ndl > 0.0) & (lndl > 0.0)
    atten = isect.occlusion_v(
        scene, point + n_ff * config.scene_epsilon, l,
        config.scene_epsilon,
        # misses / backfacing pixels: t_max=-1 -> culled in the kernel
        jnp.where(shadow_relevant, ldist - config.scene_epsilon, -1.0),
        backend=config.intersect_backend,
    )
    lit = vec.max3(atten) > 0.0
    shadow_term = jnp.where(shadow_relevant, lit.astype(jnp.float32), 0.0)

    albedo = vec.where(valid, surf["kd"], 0.0)

    # reverse reprojection into the previous frame's screen
    ru, rv = prev_camera.world_to_screen_v(point, width, height)
    ru = jnp.where(valid, ru, -1.0)
    rv = jnp.where(valid, rv, -1.0)

    if sw:
        unsw = lambda a: unswizzle_from_tiles(a, height, width)
        point, gnormal, albedo = (point.map(unsw), gnormal.map(unsw),
                                  albedo.map(unsw))
        shadow_term, depth, ru, rv, valid = (
            unsw(shadow_term), unsw(depth), unsw(ru), unsw(rv), unsw(valid))

    shp = (bh, width)
    r2 = lambda a: a.reshape(shp)
    return {
        "position": point.map(r2),
        "normal": gnormal.map(r2),
        "shadow": r2(shadow_term),
        "depth": r2(depth),
        "albedo": albedo.map(r2),
        "reproject_u": r2(ru),
        "reproject_v": r2(rv),
        "hit_valid": r2(valid),
        # primary rays + issued shadow rays (bench accounting)
        "rays_traced": (
            jnp.asarray(bh * width, jnp.int32)
            + jnp.sum(shadow_relevant.astype(jnp.int32))
        ),
    }


def gbuffer_rows(gbuf):
    """Planar G-buffer -> round-2 row layout ([H,W,3] / [H,W,2]) for
    display dumps, goldens, and the CLI switchboard — boundary use only
    (materializes lane-padded buffers on TPU)."""
    return {
        "position": vec.to_rows(gbuf["position"]),
        "normal": vec.to_rows(gbuf["normal"]),
        "shadow": gbuf["shadow"],
        "depth": gbuf["depth"],
        "albedo": vec.to_rows(gbuf["albedo"]),
        "reproject_uv": jnp.stack([gbuf["reproject_u"],
                                   gbuf["reproject_v"]], axis=-1),
        "hit_valid": gbuf["hit_valid"],
        "rays_traced": gbuf["rays_traced"],
    }
