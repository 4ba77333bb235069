"""Sibson (nearest-natural-neighbor) reconstruction.

Counterpart of `sibsonFS.glsl:16-49` ("my method — very fast"): for each
pixel, the radius is its distance to the nearest seed (from the JFA coord
buffer); the output is the average of the JFA color field over all pixels
inside that disc; pixels with an empty disc fall back to the nearest
seed's color.

The reference's per-pixel loop has a data-dependent footprint; for static
TPU shapes we bound the disc radius (`max_radius` px, config
`sibson_max_radius`) and scan over the (2R+1)^2 window with dynamic
slices of a padded image — every offset is one fused VPU pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sibson_interpolate(coord: jnp.ndarray, color: jnp.ndarray,
                       max_radius: int = 16) -> jnp.ndarray:
    """coord/color: [H,W,4] JFA outputs. Returns [H,W,4]."""
    h, w = color.shape[0], color.shape[1]
    r = max_radius

    ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    frag_uv = jnp.stack(
        [jnp.broadcast_to(xs, (h, w)), jnp.broadcast_to(ys, (h, w))], axis=-1
    )
    # per-pixel disc radius in normalized uv (distance to nearest seed)
    dist_to_closest = jnp.linalg.norm(coord[..., :2] - frag_uv, axis=-1)
    dist_to_closest = jnp.minimum(
        dist_to_closest, jnp.float32(r) / jnp.float32(min(h, w))
    )

    padded = jnp.pad(color, ((r, r), (r, r), (0, 0)))
    pad_valid = jnp.pad(jnp.ones((h, w)), ((r, r), (r, r)))

    offsets = jnp.asarray(
        [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
        jnp.int32,
    )
    inv_screen = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)

    def body(carry, off):
        acc, cnt = carry
        dy, dx = off[0], off[1]
        win = jax.lax.dynamic_slice(padded, (r + dy, r + dx, 0), (h, w, 3 + 1))
        val = jax.lax.dynamic_slice(pad_valid, (r + dy, r + dx), (h, w))
        off_uv = jnp.stack([dx.astype(jnp.float32), dy.astype(jnp.float32)])
        radius = jnp.linalg.norm(off_uv * inv_screen)
        inside = (radius <= dist_to_closest) & (val > 0.0)
        acc = acc + jnp.where(inside[..., None], win[..., :3], 0.0)
        cnt = cnt + inside.astype(jnp.float32)
        return (acc, cnt), None

    init = (jnp.zeros((h, w, 3)), jnp.zeros((h, w)))
    (acc, cnt), _ = jax.lax.scan(body, init, offsets)

    nearest = color[..., :3]
    rgb = jnp.where(cnt[..., None] > 0.0, acc / jnp.maximum(cnt[..., None], 1.0),
                    nearest)
    return jnp.concatenate([rgb, jnp.ones((h, w, 1))], axis=-1)
