"""Edge-aware A-Trous wavelet denoiser (SVGF-style, Dammertz et al.).

Counterpart of `atFS.glsl:40-90` + host loop `ATrous.cpp:90-113`: 25-tap
B3-spline kernel with step-width doubling per iteration; per-tap weight
  c_w = exp(-|dcolor|^2 / c_phi)
  n_w = exp(-(|dnormal|^2 / step^2) / n_phi)
  p_w = exp(-|dposition|^2 / p_phi)
and `n_phi` halves every iteration. Inputs mirror the reference: position
and normal G-buffers guide edges, the pull-push output is the color being
filtered (main.cpp:355).

Round-3 layout: the core is PLANAR (Vec3 of [H,W] planes — [H,W,3]
buffers pad their 3-wide minor axis to 128 lanes on TPU). The [H,W,3]
row API remains as a wrapper.
"""

from __future__ import annotations

import jax.numpy as jnp

from fovtrace.core import vec
from fovtrace.core.vec import Vec3

_KERNEL = [
    [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
    [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
    [3 / 128, 3 / 32, 9 / 64, 3 / 32, 3 / 128],
    [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
    [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
]


def _shift_valid(h, w, dy, dx):
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return ((ys - dy >= 0) & (ys - dy < h) & (xs - dx >= 0) & (xs - dx < w))


def atrous_step_v(color: Vec3, position: Vec3, normal: Vec3,
                  c_phi, n_phi, p_phi, step: int, row_valid=None) -> Vec3:
    """One 25-tap filtering pass at the given step width (planar).

    row_valid: optional [H] bool — rows that are real screen rows.
    Sharded tiles pass halo-padded arrays whose edge halos are zero fill
    for out-of-screen rows; masking those taps out reproduces the
    single-chip out-of-bounds behavior exactly (dist.recon)."""
    h, w = color.x.shape
    acc = vec.zeros((h, w))
    cum_w = jnp.zeros((h, w))
    for j in range(5):
        for i in range(5):
            dy = (j - 2) * step
            dx = (i - 2) * step
            roll = lambda p: jnp.roll(p, shift=(dy, dx), axis=(0, 1))
            valid = _shift_valid(h, w, dy, dx)
            if row_valid is not None:
                valid = valid & jnp.roll(row_valid, dy)[:, None]
            ctap = color.map(roll)
            dc = color - ctap
            c_w = jnp.minimum(jnp.exp(-vec.dot(dc, dc) / c_phi), 1.0)
            dn = normal - normal.map(roll)
            n_w = jnp.minimum(
                jnp.exp(-(vec.dot(dn, dn) / (step * step)) / n_phi), 1.0)
            dp = position - position.map(roll)
            p_w = jnp.minimum(jnp.exp(-vec.dot(dp, dp) / p_phi), 1.0)
            weight = jnp.where(valid, c_w * n_w * p_w * _KERNEL[j][i], 0.0)
            acc = acc + ctap * weight
            cum_w = cum_w + weight
    return acc * (1.0 / jnp.maximum(cum_w, 1e-20))


def atrous_denoise_v(color: Vec3, position: Vec3, normal: Vec3,
                     iterations: int = 1, c_phi: float = 1.0,
                     n_phi: float = 0.5, p_phi: float = 0.5) -> Vec3:
    """Iterated A-Trous (ATrous.cpp:90-113): step doubles, n_phi halves."""
    out = color
    step = 1
    nphi = n_phi
    for _ in range(iterations):
        out = atrous_step_v(out, position, normal, c_phi, nphi, p_phi, step)
        step *= 2
        nphi *= 0.5
    return out


# ------------------------------------------------------- row-API wrappers
def atrous_step(color, position, normal, c_phi, n_phi, p_phi, step: int,
                row_valid=None):
    out = atrous_step_v(
        vec.from_rows(color), vec.from_rows(position), vec.from_rows(normal),
        c_phi, n_phi, p_phi, step, row_valid)
    return vec.to_rows(out)


def atrous_denoise(color, position, normal, iterations: int = 1,
                   c_phi: float = 1.0, n_phi: float = 0.5,
                   p_phi: float = 0.5):
    out = atrous_denoise_v(
        vec.from_rows(color), vec.from_rows(position), vec.from_rows(normal),
        iterations, c_phi, n_phi, p_phi)
    return vec.to_rows(out)
