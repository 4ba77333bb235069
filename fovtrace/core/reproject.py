"""Temporal reprojection & cache validation.

Counterpart of the reference's reverse-reprojection loop:
  - `compute_reprojection` world->prev-screen (shared_helper_funcs.h:179-188),
  - depth-based cache validation `isCacheHit` (shared_helper_funcs.h:60-64,
    samplingStep.cu:102-141),
  - history fetch + accumulate (fov_path_trace_camera.cu:83-107,167-175).

All functions are pure; the frame-to-frame state (history/depth caches)
is threaded by the caller instead of double-buffered GL textures
(`PathTracer::swapBuffer` PathTracer.cpp:226-238).
"""

from __future__ import annotations

import jax.numpy as jnp


def validate_cache(reproject_uv, position, depth_cache, prev_eye, width, height,
                   epsilon):
    """Per-pixel cache validity (samplingStep.cu:94-141).

    reproject_uv: [H,W,2] pixel-space uv into the previous frame (-1 = miss)
    position:     [H,W,3] current world hit position
    depth_cache:  [H,W]   previous frame view depths
    prev_eye:     [3]     previous camera position

    Returns (is_valid [H,W] float, q_uv [H,W,2] int32 clamped indices).
    """
    in_range = (
        (reproject_uv[..., 0] > -1.0)
        & (reproject_uv[..., 1] > -1.0)
        & (reproject_uv[..., 0] >= 0.0)
        & (reproject_uv[..., 0] < width - 0.5)
        & (reproject_uv[..., 1] >= 0.0)
        & (reproject_uv[..., 1] < height - 0.5)
    )
    qx = jnp.clip(jnp.round(reproject_uv[..., 0]), 0, width - 1).astype(jnp.int32)
    qy = jnp.clip(jnp.round(reproject_uv[..., 1]), 0, height - 1).astype(jnp.int32)
    prev_depth = depth_cache[qy, qx]
    cur_depth = jnp.linalg.norm(position - prev_eye, axis=-1)
    hit = jnp.abs(prev_depth - cur_depth) < epsilon
    is_valid = jnp.where(in_range & hit, 1.0, 0.0)
    return is_valid, jnp.stack([qy, qx], axis=-1)


def fetch_history(history_cache, q_uv, is_valid):
    """History lookup for cache-valid pixels (fov_path_trace_camera.cu:86-93).

    history_cache: [H,W,4] accumulated color (w = sample count)
    q_uv:          [H,W,2] (y, x) integer indices into the previous frame
    is_valid:      [H,W]   1.0 where the reprojected cache entry is usable
    """
    hist = history_cache[q_uv[..., 0], q_uv[..., 1]]
    return jnp.where(is_valid[..., None] > 0.0, hist, jnp.zeros_like(hist))
