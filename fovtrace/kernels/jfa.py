"""Jump-Flooding-Algorithm Voronoi seeding.

Counterpart of the reference's JFA pass (`JumpFlooding.cpp:60-140`,
`cpFS.glsl` seed pass, `jfFS.glsl:12-59` ping-pong step): every pixel
tracks the normalized uv of its nearest sample ("seed") and that seed's
color; log2 rounds with 8-neighbor taps at halving step sizes.

Implemented as shifted-array min-reductions: each round builds 8 shifted
candidate fields with `jnp.roll` + boundary masks and keeps the closer
seed — a handful of fused VPU ops per round, no gather needed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _shift(img, dy, dx, fill=0.0):
    out = jnp.roll(img, shift=(dy, dx), axis=(0, 1))
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = (ys - dy >= 0) & (ys - dy < h) & (xs - dx >= 0) & (xs - dx < w)
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, fill)


def max_step(height: int, width: int) -> int:
    """Smallest power of two >= screen/2 (JumpFlooding.cpp:33-34)."""
    s = 1
    while s < max(height, width) // 2:
        s *= 2
    return s


def jump_flood(sparse_color: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run JFA from a sparse color buffer [H,W,4] (alpha > 0 marks seeds).

    Returns (coord [H,W,4], color [H,W,4]) where coord.xy is the
    normalized uv of the nearest seed and coord.w its validity — the
    same layout as the reference's coordTex/colorTex.
    """
    h, w = sparse_color.shape[0], sparse_color.shape[1]
    screen = jnp.asarray([w, h], jnp.float32)

    ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    frag_uv = jnp.stack(
        [jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w))], axis=-1
    )

    alpha = sparse_color[..., 3:4]
    coord = jnp.concatenate(
        [frag_uv * (alpha > 0.0), jnp.zeros((h, w, 1)), alpha], axis=-1
    )
    color = sparse_color

    step = max_step(h, w)
    while step >= 1:
        dist = jnp.where(
            coord[..., 3] > 0.0,
            jnp.linalg.norm(coord[..., :2] - frag_uv, axis=-1),
            jnp.inf,
        )
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                nc = _shift(coord, dy, dx)
                ncol = _shift(color, dy, dx)
                n_valid = nc[..., 3] >= 1.0
                ndist = jnp.linalg.norm(nc[..., :2] - frag_uv, axis=-1)
                better = n_valid & ((coord[..., 3] < 1.0) | (ndist < dist))
                coord = jnp.where(better[..., None], nc, coord)
                color = jnp.where(better[..., None], ncol, color)
                dist = jnp.where(better, ndist, dist)
        step //= 2
    return coord, color


def voronoi_fill(sparse_color: jnp.ndarray) -> jnp.ndarray:
    """Convenience: JFA then return the nearest-seed color field."""
    _, color = jump_flood(sparse_color)
    return color
