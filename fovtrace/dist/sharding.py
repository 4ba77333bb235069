"""Screen-tile sharding across a TPU device mesh.

The reference is single-process single-GPU (SURVEY.md §2.6) — this module
is new design, not a port. The only scale axis in the problem is pixels/
rays, so we shard horizontal ROW BLOCKS of the screen across a 1-D
`jax.sharding.Mesh("tiles")`:

  - scene/BVH/materials/camera: replicated (small)
  - G-buffer trace + saliency + sampling + shading: embarrassingly
    parallel per row block, expressed with `shard_map` — zero comms
  - per-tile ray compaction: each device argsorts ITS OWN mask with an
    equal per-tile budget — the multi-chip analog of warp compaction,
    with no cross-device traffic
  - reconstruction (JFA / pull-push / A-Trous): cross-tile footprints;
    the image at this point is small (HxWx4 floats), so round 1 gathers
    it (`all_gather` over tiles) and reconstructs replicated; halo-based
    sharded reconstruction is the planned optimization
  - gradients of replicated parameters are `psum`'d across tiles by the
    shard_map transpose automatically

Intra-slice these collectives ride ICI; multi-host runs use the standard
JAX multi-controller runtime (`jax.distributed.initialize`).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fovtrace.config import RenderConfig
from fovtrace.core import color as colorx
from fovtrace.core import rng
from fovtrace.kernels import atrous, jfa, pullpush, sampling, saliency
from fovtrace.render import shade as shade_mod

AXIS = "tiles"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """[H, W, ...] arrays sharded by rows across the tile axis."""
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def render_tile(scene, camera, gaze_px, frame, config: RenderConfig,
                y0, block_h: int):
    """Render one row block densely up to the sparse shading buffer.

    This is the per-device body: G-buffer + saliency + mask + per-tile
    compacted foveated shading. Temporal reuse is omitted inside the
    sharded path for round 1 (history handling stays in the single-chip
    pipeline). Returns the sparse accumulated shading rows [block_h,W,4]
    plus aux row buffers.
    """
    h, w = config.height, config.width
    ro, rd = camera.primary_rays_block(w, h, y0, block_h)
    ro_f = ro.reshape(-1, 3)
    rd_f = rd.reshape(-1, 3)

    from fovtrace.kernels import intersect as isect

    hit = isect.intersect(scene, ro_f, rd_f, config.scene_epsilon,
                                isect.BIG_T)
    surf = isect.hit_surface(scene, ro_f, rd_f, hit)
    valid = hit.valid
    point = jnp.where(valid[:, None], surf["point"], 0.0)
    depth = jnp.where(valid, jnp.linalg.norm(point - camera.eye, axis=-1), 0.0)
    albedo = jnp.where(valid[:, None], surf["kd"], 0.0)
    gnormal = jnp.where(valid[:, None], surf["gnormal"], 0.0)

    shp = (block_h, w)
    gbuf_rows = {
        "position": point.reshape(shp + (3,)),
        "normal": gnormal.reshape(shp + (3,)),
        "depth": depth.reshape(shp),
        "albedo": albedo.reshape(shp + (3,)),
        # no temporal reproject in the sharded path (round 1)
        "reproject_uv": jnp.full(shp + (2,), -1.0),
        "shadow": jnp.ones(shp),
    }

    # gaze-relative saliency + mask for THIS block (tile-local sobel;
    # boundary taps clamp at tile edges — documented approximation)
    gy = gaze_px[0] - y0  # gaze row in tile coords (may be off-tile)
    gy_c = jnp.clip(gy, 0, block_h - 1)
    bbox_diag = jnp.linalg.norm(scene.bbox_max - scene.bbox_min)
    sal = saliency.compute_saliency(gbuf_rows, (gy_c, gaze_px[1]), bbox_diag,
                                    config.saliency_block)

    py = jnp.arange(block_h, dtype=jnp.float32)[:, None] + jnp.asarray(y0, jnp.float32)
    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    gdist = jnp.sqrt((px - gaze_px[1]) ** 2 + (py - gaze_px[0]) ** 2) / jnp.sqrt(
        float(w) ** 2 + float(h) ** 2
    )
    if config.sampling_mode == "full":
        mask = jnp.ones((block_h, w), bool)
    else:
        mask = sampling.masked_sampling(block_h, w, gdist, sal,
                                        config.aperture,
                                        config.extra_sample_rate)

    # per-tile compaction: equal budget per tile (capped by the tile size)
    budget = max(1024, config.ray_budget // max(1, config.height // block_h))
    budget = min(budget, block_h * w)
    idx, active = sampling.compact_rays(mask, budget)

    flat_idx_global = idx + 0  # tile-local flat index into [block_h*w]
    seeds = rng.pixel_seed(
        flat_idx_global
        + (jnp.asarray(y0, jnp.int32) * w),
        frame,
    )
    j1, seeds = rng.rnd(seeds)
    j2, seeds = rng.rnd(seeds)
    ry = (idx // w).astype(jnp.float32) + jnp.asarray(y0, jnp.float32)
    rx = (idx % w).astype(jnp.float32)
    ndc_x = (rx + j1 - 0.5) / w * 2.0 - 1.0
    ndc_y = (ry + j2 - 0.5) / h * 2.0 - 1.0
    d4 = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, -1.0),
                    jnp.ones_like(ndc_x)], axis=-1)
    inv = camera.inv_mvp(float(w) / float(h))
    world = jnp.einsum("ij,nj->ni", inv, d4)
    near = world[:, :3] / world[:, 3:4]
    from fovtrace.core import mathx

    dirs = mathx.normalize(near - camera.eye)
    origins = jnp.broadcast_to(camera.eye, dirs.shape)

    radiance, _ = shade_mod.shade(scene, origins, dirs, seeds, config)
    tonemapped = colorx.uncharted2_tonemap(radiance, config.exposure_bias)
    sample = jnp.concatenate([tonemapped, jnp.ones((budget, 1))], axis=-1)
    sparse = sampling.scatter_rays(
        jnp.where(active[:, None], sample, 0.0), idx, active, block_h * w
    ).reshape(block_h, w, 4)
    return sparse, gbuf_rows, mask


def render_sharded(scene, camera, gaze_px, frame, config: RenderConfig,
                   mesh: Mesh):
    """Full sharded frame: tiles render independently, reconstruction runs
    on the gathered (replicated) sparse buffer.

    Returns dict(image [H,W,3], shading [H,W,4], ray_count scalar).
    """
    n_tiles = mesh.devices.size
    assert config.height % n_tiles == 0, "height must divide the mesh"
    block_h = config.height // n_tiles

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        check_vma=False,  # pallas_call outputs carry no vma annotations
    )
    def tile_body(scene_, camera_, gaze_, frame_):
        tile = jax.lax.axis_index(AXIS)
        y0 = tile * block_h
        sparse, gbuf_rows, mask = render_tile(
            scene_, camera_, gaze_, frame_, config, y0, block_h
        )
        rc = jax.lax.psum(jnp.sum(mask.astype(jnp.int32)), AXIS)
        return sparse, gbuf_rows["position"], gbuf_rows["normal"], rc

    sparse, position, normal, ray_count = tile_body(
        scene, camera, jnp.asarray(gaze_px), jnp.asarray(frame, jnp.int32)
    )

    # reconstruction on the gathered image (replicated; small buffer)
    if config.reconstruction == "none":
        image = colorx.accumulate_to_color(sparse)[..., :3]
    elif config.reconstruction == "jfa":
        _, col = jfa.jump_flood(sparse)
        image = col[..., :3]
    else:
        pp = pullpush.pull_push(sparse)
        if config.reconstruction == "atrous":
            image = atrous.atrous_denoise(
                pp[..., :3], position, normal,
                config.atrous_iterations, config.atrous_c_phi,
                config.atrous_n_phi, config.atrous_p_phi,
            )
        else:
            image = pp[..., :3]
    return {"image": image, "shading": sparse, "ray_count": ray_count}
