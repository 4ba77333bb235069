"""Temporal reprojection & cache validation.

Counterpart of the reference's reverse-reprojection loop:
  - `compute_reprojection` world->prev-screen (shared_helper_funcs.h:179-188),
  - depth-based cache validation `isCacheHit` (shared_helper_funcs.h:60-64,
    samplingStep.cu:102-141),
  - history fetch + accumulate (fov_path_trace_camera.cu:83-107,167-175).

All functions are pure; the frame-to-frame state (history/depth caches)
is threaded by the caller instead of double-buffered GL textures
(`PathTracer::swapBuffer` PathTracer.cpp:226-238).

Layout: reprojection uv as [H,W] planes, positions as SoA Vec3, the
history cache as [4,H,W] channel planes for the elementwise/scatter side
— but the per-pixel FETCH goes through ONE [H,W,5] row gather of the
combined (rgb, count, depth) cache: the TPU gather engine moves a row
per index, so one row gather costs what a single scalar gather does
(~23ms at 2M pixels) while five separate gathers cost 5x that.
"""

from __future__ import annotations

import jax.numpy as jnp

from fovtrace.core import vec
from fovtrace.core.vec import Vec3


def reproject_indices(ru, rv, width, height):
    """Clamped integer prev-frame indices + in-range mask
    (samplingStep.cu:94-141 bounds logic).

    ru, rv: [H,W] pixel-space uv into the previous frame (-1 = miss).
    Returns (in_range [H,W] bool, qy [H,W] i32, qx [H,W] i32)."""
    in_range = (
        (ru > -1.0) & (rv > -1.0)
        & (ru >= 0.0) & (ru < width - 0.5)
        & (rv >= 0.0) & (rv < height - 0.5)
    )
    qx = jnp.clip(jnp.round(ru), 0, width - 1).astype(jnp.int32)
    qy = jnp.clip(jnp.round(rv), 0, height - 1).astype(jnp.int32)
    return in_range, qy, qx


def fetch_cache(history, depth_cache, qy, qx):
    """ONE row gather of the combined temporal cache.

    history: [4,H,W] planes; depth_cache: [H,W].
    Returns [H*W, 5] flat rows: r,g,b,count,prev_depth at the
    reprojected pixel. One row gather beats five 1-D gathers 5x over
    (see module docstring). Consumers must NOT column-slice this
    lane-padded buffer repeatedly — transpose once to [5, N] first
    (the transpose is CSE'd across all consumers inside one jit)."""
    cache_rows = jnp.stack(
        [history[0], history[1], history[2], history[3], depth_cache],
        axis=-1)
    return cache_rows[qy, qx].reshape(-1, 5)


def validate_cache(ru, rv, position: Vec3, depth_cache, prev_eye,
                   width, height, epsilon, history=None):
    """Per-pixel cache validity (samplingStep.cu:94-141).

    Returns (is_valid [H,W] float, qy, qx, fetched [H*W,5] | None):
    with `history` given, the combined cache fetch is shared with the
    caller (the shading stage reuses it instead of re-gathering).
    """
    in_range, qy, qx = reproject_indices(ru, rv, width, height)
    if history is not None:
        fetched = fetch_cache(history, depth_cache, qy, qx)
        # one transpose -> dense [5, N] rows (not 5 padded column slices).
        # Reshape with the INPUT raster shape, not (height, width): the
        # sharded path (dist/sharding.py) passes tile-local [bh, w] uv
        # planes while width/height stay global for index math into the
        # all-gathered cache.
        prev_depth = fetched.T[4].reshape(ru.shape)
    else:
        fetched = None
        prev_depth = depth_cache[qy, qx]
    cur_depth = vec.length(position - vec.of(prev_eye))
    hit = jnp.abs(prev_depth - cur_depth) < epsilon
    is_valid = jnp.where(in_range & hit, 1.0, 0.0)
    return is_valid, qy, qx, fetched


def history_from_fetch(fetched, is_valid):
    """[H*W,5] fetched cache rows -> [4,H,W] history planes, zeroed
    where the reprojected entry is invalid
    (fov_path_trace_camera.cu:86-93). One transpose (CSE'd with
    validate_cache's) then dense row slices."""
    h, w = is_valid.shape
    ok = is_valid > 0.0
    planes = fetched.T[:4].reshape(4, h, w)
    return jnp.where(ok[None], planes, 0.0)


def fetch_history(history_cache, qy, qx, is_valid):
    """History-only lookup (compat; prefer the shared validate_cache
    fetch). history_cache: [4,H,W]."""
    ok = is_valid > 0.0
    rows = jnp.stack([history_cache[0], history_cache[1],
                      history_cache[2], history_cache[3]], axis=-1)
    f = rows[qy, qx]
    return jnp.stack([jnp.where(ok, f[..., c], 0.0) for c in range(4)],
                     axis=0)
