"""Temporal reprojection & cache validation.

Counterpart of the reference's reverse-reprojection loop:
  - `compute_reprojection` world->prev-screen (shared_helper_funcs.h:179-188),
  - depth-based cache validation `isCacheHit` (shared_helper_funcs.h:60-64,
    samplingStep.cu:102-141),
  - history fetch + accumulate (fov_path_trace_camera.cu:83-107,167-175).

All functions are pure; the frame-to-frame state (history/depth caches)
is threaded by the caller instead of double-buffered GL textures
(`PathTracer::swapBuffer` PathTracer.cpp:226-238).

Round-3 layout: planar — reprojection uv as separate [H,W] planes, hit
positions as SoA Vec3, the history cache as ONE [4,H,W] channel-major
array (an [H,W,4] array tiles T(8,128) on TPU, padding the 4-wide minor
axis to 128 lanes = 32x memory/traffic).
"""

from __future__ import annotations

import jax.numpy as jnp

from fovtrace.core import vec
from fovtrace.core.vec import Vec3


def validate_cache(ru, rv, position: Vec3, depth_cache, prev_eye,
                   width, height, epsilon):
    """Per-pixel cache validity (samplingStep.cu:94-141).

    ru, rv:       [H,W] pixel-space uv into the previous frame (-1 = miss)
    position:     Vec3 of [H,W] current world hit position
    depth_cache:  [H,W]   previous frame view depths
    prev_eye:     [3]     previous camera position

    Returns (is_valid [H,W] float, qy [H,W] i32, qx [H,W] i32).
    """
    in_range = (
        (ru > -1.0) & (rv > -1.0)
        & (ru >= 0.0) & (ru < width - 0.5)
        & (rv >= 0.0) & (rv < height - 0.5)
    )
    qx = jnp.clip(jnp.round(ru), 0, width - 1).astype(jnp.int32)
    qy = jnp.clip(jnp.round(rv), 0, height - 1).astype(jnp.int32)
    prev_depth = depth_cache[qy, qx]
    cur_depth = vec.length(position - vec.of(prev_eye))
    hit = jnp.abs(prev_depth - cur_depth) < epsilon
    is_valid = jnp.where(in_range & hit, 1.0, 0.0)
    return is_valid, qy, qx


def fetch_history(history_cache, qy, qx, is_valid):
    """History lookup for cache-valid pixels (fov_path_trace_camera.cu:86-93).

    history_cache: [4,H,W] accumulated color planes (plane 3 = #samples)
    qy, qx:        [H,W] integer indices into the previous frame
    is_valid:      [H,W] 1.0 where the reprojected cache entry is usable

    Returns [4,H,W] (rgb + count planes), zeros where invalid.
    """
    ok = is_valid > 0.0
    g = lambda c: jnp.where(ok, history_cache[c][qy, qx], 0.0)
    return jnp.stack([g(0), g(1), g(2), g(3)], axis=0)
