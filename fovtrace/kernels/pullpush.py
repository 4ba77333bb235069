"""Pull-push pyramid hole filling.

Counterpart of `PullPushInterpolation.cpp:48-238` + `pullFS.glsl:48-78`
(pull: 2x2 average of valid samples per level) + `pushFS.glsl:60-101`
(push: fill holes from the coarser level, keep valid fine samples) +
`pullpushFinal.glsl`. The reference packs the mip chain into one wide
1.5W x H atlas driven by GLSL compute with manual memory barriers; here
each level is its own array and the level-to-level dependency is plain
dataflow (SURVEY.md §5: this eliminates that barrier bug class).

Push uses the reference's 3x3 B-spline-ish kernel on the upsampled
coarser level; valid fine samples pass through unchanged.

Round-3 layout: the core is PLANAR — (Vec3 rgb, alpha) of [H,W] planes
(an [H,W,4] buffer tiles T(8,128) on TPU: 4 -> 128 lanes, 32x padding).
The [H,W,4] API remains as a wrapper.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from fovtrace.core import mathx, vec
from fovtrace.core.vec import Vec3

_PUSH_W = [
    [1 / 16, 1 / 8, 1 / 16],
    [1 / 8, 1 / 4, 1 / 8],
    [1 / 16, 1 / 8, 1 / 16],
]


def _pull_level_v(rgb: Vec3, a) -> Tuple[Vec3, jnp.ndarray]:
    """One pull: [H,W] planes -> [H/2,W/2]; RGB premultiplied-by-alpha
    average over the valid samples of each 2x2 quad (pullFS.glsl:60-76:
    sum then divide by summed alpha; alpha_out = any valid)."""
    h, w = a.shape
    q = lambda p: (p * a).reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    sa = a.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    inv = mathx.safe_inv_pos(sa)   # NaN-free backward at sa == 0
    out = Vec3(q(rgb.x) * inv, q(rgb.y) * inv, q(rgb.z) * inv)
    return out, (sa > 0.0).astype(jnp.float32)


def _upsample2(p):
    return jnp.repeat(jnp.repeat(p, 2, axis=0), 2, axis=1)


def _blur3_v(rgb: Vec3, a) -> Tuple[Vec3, jnp.ndarray]:
    """3x3 normalized blur over valid samples (push_filter, pushFS.glsl)."""
    h, w = a.shape
    ax = jnp.zeros((h, w))
    ay = jnp.zeros((h, w))
    az = jnp.zeros((h, w))
    wacc = jnp.zeros((h, w))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    for j in range(3):
        for i in range(3):
            dy, dx = j - 1, i - 1
            sh = lambda p: jnp.roll(p, shift=(-dy, -dx), axis=(0, 1))
            valid_shift = (
                (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)
            )
            wgt = _PUSH_W[j][i] * jnp.where(valid_shift, sh(a), 0.0)
            ax = ax + sh(rgb.x) * wgt
            ay = ay + sh(rgb.y) * wgt
            az = az + sh(rgb.z) * wgt
            wacc = wacc + wgt
    inv = mathx.safe_inv_pos(wacc)
    return Vec3(ax * inv, ay * inv, az * inv), (wacc > 0.0).astype(jnp.float32)


def _fill_from_v(fine_rgb: Vec3, fine_a, fb_rgb: Vec3, fb_a):
    """Keep valid fine samples; fill holes from the fallback
    (pushFS.glsl:77-101)."""
    valid = fine_a > 0.0
    rgb = vec.where(valid, fine_rgb, fb_rgb)
    return rgb, jnp.maximum(fine_a, fb_a)


def max_levels(h: int, w: int) -> int:
    lv = 0
    while (h % (2 ** (lv + 1)) == 0 and w % (2 ** (lv + 1)) == 0
           and min(h, w) // (2 ** (lv + 1)) >= 1):
        lv += 1
    return lv


def pull_push_v(rgb: Vec3, alpha, levels: int | None = None
                ) -> Tuple[Vec3, jnp.ndarray]:
    """Fill holes in sparse planar (rgb, alpha) buffers (alpha = valid).

    Returns dense planar (rgb, alpha) with alpha 1 everywhere reachable.
    H and W must be divisible by 2**levels (auto-capped).
    """
    h, w = alpha.shape
    max_lv = max_levels(h, w)
    if levels is None:
        levels = max_lv
    levels = min(levels, max_lv)

    pyramid: List[Tuple[Vec3, jnp.ndarray]] = [(rgb, alpha)]
    for _ in range(levels):
        pyramid.append(_pull_level_v(*pyramid[-1]))

    c_rgb, c_a = pyramid[-1]
    # top level: blur-fill whatever holes remain at the coarsest scale
    c_rgb, c_a = _fill_from_v(c_rgb, c_a, *_blur3_v(c_rgb, c_a))
    for lv in range(levels - 1, -1, -1):
        f_rgb, f_a = pyramid[lv]
        fh, fw = f_a.shape
        up_rgb = c_rgb.map(lambda p: _upsample2(p)[:fh, :fw])
        up_a = _upsample2(c_a)[:fh, :fw]
        fill_rgb, fill_a = _blur3_v(up_rgb, up_a)
        c_rgb, c_a = _fill_from_v(f_rgb, f_a, fill_rgb, fill_a)
    return c_rgb, c_a


def pull_push(sparse: jnp.ndarray, levels: int | None = None) -> jnp.ndarray:
    """[H,W,4] row-API wrapper over pull_push_v."""
    rgb, a = pull_push_v(vec.from_rows(sparse[..., :3]), sparse[..., 3],
                         levels)
    return jnp.concatenate([vec.to_rows(rgb), a[..., None]], axis=-1)
