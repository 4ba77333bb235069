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
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

_PUSH_W = jnp.asarray(
    [
        [1 / 16, 1 / 8, 1 / 16],
        [1 / 8, 1 / 4, 1 / 8],
        [1 / 16, 1 / 8, 1 / 16],
    ],
    jnp.float32,
)


def _pull_level(img: jnp.ndarray) -> jnp.ndarray:
    """One pull: [H,W,4] -> [H/2,W/2,4]; RGB premultiplied-by-alpha
    average over the valid samples of each 2x2 quad (pullFS.glsl:60-76:
    sum then divide by summed alpha; alpha_out = any valid)."""
    h, w = img.shape[0], img.shape[1]
    q = img.reshape(h // 2, 2, w // 2, 2, 4)
    s = q.sum(axis=(1, 3))
    a = s[..., 3:4]
    rgb = jnp.where(a > 0.0, s[..., :3] / jnp.maximum(a, 1e-20), 0.0)
    valid = (a > 0.0).astype(jnp.float32)
    return jnp.concatenate([rgb, valid], axis=-1)


def _upsample2(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)


def _blur3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 normalized blur over valid samples (push_filter, pushFS.glsl)."""
    h, w = img.shape[0], img.shape[1]
    acc = jnp.zeros((h, w, 3))
    wacc = jnp.zeros((h, w, 1))
    for j in range(3):
        for i in range(3):
            dy, dx = j - 1, i - 1
            tap = jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))
            ys = jnp.arange(h)[:, None]
            xs = jnp.arange(w)[None, :]
            valid_shift = (
                (ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)
            )[..., None]
            tap = jnp.where(valid_shift, tap, 0.0)
            wgt = _PUSH_W[j, i] * tap[..., 3:4]
            acc = acc + tap[..., :3] * wgt
            wacc = wacc + wgt
    rgb = jnp.where(wacc > 0.0, acc / jnp.maximum(wacc, 1e-20), 0.0)
    return jnp.concatenate([rgb, (wacc > 0.0).astype(jnp.float32)], axis=-1)


def pull_push(sparse: jnp.ndarray, levels: int | None = None) -> jnp.ndarray:
    """Fill holes in a sparse [H,W,4] buffer (alpha = valid).

    Returns a dense [H,W,4] buffer with alpha 1 everywhere reachable.
    H and W must be divisible by 2**levels (auto-capped).
    """
    h, w = sparse.shape[0], sparse.shape[1]
    max_lv = 0
    while (h % (2 ** (max_lv + 1)) == 0 and w % (2 ** (max_lv + 1)) == 0
           and min(h, w) // (2 ** (max_lv + 1)) >= 1):
        max_lv += 1
    if levels is None:
        levels = max_lv
    levels = min(levels, max_lv)

    pyramid: List[jnp.ndarray] = [sparse]
    for _ in range(levels):
        pyramid.append(_pull_level(pyramid[-1]))

    coarse = pyramid[-1]
    # top level: blur-fill whatever holes remain at the coarsest scale
    coarse = _fill_from(coarse, _blur3(coarse))
    for lv in range(levels - 1, -1, -1):
        fine = pyramid[lv]
        up = _upsample2(coarse)[: fine.shape[0], : fine.shape[1]]
        filled = _blur3(up)
        coarse = _fill_from(fine, filled)
    return coarse


def _fill_from(fine: jnp.ndarray, fallback: jnp.ndarray) -> jnp.ndarray:
    """Keep valid fine samples; fill holes from `fallback`
    (pushFS.glsl:77-101)."""
    valid = fine[..., 3:4] > 0.0
    rgb = jnp.where(valid, fine[..., :3], fallback[..., :3])
    a = jnp.maximum(fine[..., 3:4], fallback[..., 3:4])
    return jnp.concatenate([rgb, a], axis=-1)
