"""Edge-aware A-Trous wavelet denoiser (SVGF-style, Dammertz et al.).

Counterpart of `atFS.glsl:40-90` + host loop `ATrous.cpp:90-113`: 25-tap
B3-spline kernel with step-width doubling per iteration; per-tap weight
  c_w = exp(-|dcolor|^2 / c_phi)
  n_w = exp(-(|dnormal|^2 / step^2) / n_phi)
  p_w = exp(-|dposition|^2 / p_phi)
and `n_phi` halves every iteration. Inputs mirror the reference: position
and normal G-buffers guide edges, the pull-push output is the color being
filtered (main.cpp:355).
"""

from __future__ import annotations

import jax.numpy as jnp

_KERNEL = jnp.asarray(
    [
        [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
        [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
        [3 / 128, 3 / 32, 9 / 64, 3 / 32, 3 / 128],
        [1 / 64, 1 / 16, 3 / 32, 1 / 16, 1 / 64],
        [1 / 256, 1 / 64, 3 / 128, 1 / 64, 1 / 256],
    ],
    jnp.float32,
)


def _shift(img, dy, dx):
    out = jnp.roll(img, shift=(dy, dx), axis=(0, 1))
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = ((ys - dy >= 0) & (ys - dy < h) & (xs - dx >= 0) & (xs - dx < w))
    return out, valid


def atrous_step(color, position, normal, c_phi, n_phi, p_phi, step: int,
                row_valid=None):
    """One 25-tap filtering pass at the given step width.

    row_valid: optional [H] bool — rows that are real screen rows.
    Sharded tiles pass halo-padded arrays whose edge halos are zero fill
    for out-of-screen rows; masking those taps out reproduces the
    single-chip out-of-bounds behavior exactly (dist.recon)."""
    h, w = color.shape[0], color.shape[1]
    acc = jnp.zeros((h, w, color.shape[2]))
    cum_w = jnp.zeros((h, w, 1))
    for j in range(5):
        for i in range(5):
            dy = (j - 2) * step
            dx = (i - 2) * step
            ctap, valid = _shift(color, -dy, -dx)
            if row_valid is not None:
                valid = valid & jnp.roll(row_valid, -dy)[:, None]
            ptap, _ = _shift(position, -dy, -dx)
            ntap, _ = _shift(normal, -dy, -dx)

            dc = color - ctap
            c_w = jnp.minimum(
                jnp.exp(-jnp.sum(dc * dc, axis=-1, keepdims=True) / c_phi), 1.0
            )
            dn = normal - ntap
            n_w = jnp.minimum(
                jnp.exp(
                    -(jnp.sum(dn * dn, axis=-1, keepdims=True) / (step * step))
                    / n_phi
                ),
                1.0,
            )
            dp = position - ptap
            p_w = jnp.minimum(
                jnp.exp(-jnp.sum(dp * dp, axis=-1, keepdims=True) / p_phi), 1.0
            )
            weight = c_w * n_w * p_w * _KERNEL[j, i]
            weight = jnp.where(valid[..., None], weight, 0.0)
            acc = acc + ctap * weight
            cum_w = cum_w + weight
    return acc / jnp.maximum(cum_w, 1e-20)


def atrous_denoise(color, position, normal, iterations: int = 1,
                   c_phi: float = 1.0, n_phi: float = 0.5, p_phi: float = 0.5):
    """Iterated A-Trous (ATrous.cpp:90-113): step doubles, n_phi halves."""
    out = color
    step = 1
    nphi = n_phi
    for _ in range(iterations):
        out = atrous_step(out, position, normal, c_phi, nphi, p_phi, step)
        step *= 2
        nphi *= 0.5
    return out
