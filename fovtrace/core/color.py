"""Tone mapping, accumulation, and visualization color maps.

Behavioral counterpart of `REF/cuda/device_include/shared_helper_funcs.h`:
Uncharted2 filmic tone map (:354-373), running-average accumulation
(`color_to_accumulated` :341-351), cool2warm / heatmap saliency viz
(:221-234).
"""

from __future__ import annotations

import jax.numpy as jnp

from fovtrace.core import mathx


def _uncharted2_curve(x):
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def uncharted2_tonemap(color, exposure_bias: float = 2.0, gamma: float = 2.2):
    """Uncharted2ToneMapping (shared_helper_funcs.h:365-373).

    Note the reference raises to the power `oo_gamma = 2.2` (not 1/2.2) —
    we reproduce that exact behavior for parity.
    """
    result = _uncharted2_curve(exposure_bias * color)
    white_scale = 1.0 / _uncharted2_curve(jnp.float32(11.2))
    result = result * white_scale
    return jnp.power(jnp.maximum(result, 0.0), gamma)


def accumulate_to_color(accum):
    """color_to_accumulated: divide RGB by sample-count in alpha (w > 0)."""
    w = accum[..., 3:4]
    rgb = jnp.where(w > 0.0,
                    accum[..., :3] * mathx.safe_inv_pos(w),
                    accum[..., :3])
    a = jnp.where(w[..., 0] > 0.0, 1.0, accum[..., 3])
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def cool2warm(intensity):
    """cool2warm saliency viz (shared_helper_funcs.h:221-228)."""
    i = jnp.asarray(intensity)
    lo = jnp.stack([jnp.zeros_like(i), i * 2.0, 1.0 - i * 2.0], axis=-1)
    hi = jnp.stack([(i - 0.5) * 2.0, (1.0 - i) * 2.0, jnp.zeros_like(i)], axis=-1)
    return jnp.where(i[..., None] <= 0.5, lo, hi)


def heatmap(intensity):
    """heatmap viz (shared_helper_funcs.h:231-234)."""
    i = jnp.asarray(intensity)
    half_pi = jnp.pi / 2.0
    return jnp.stack(
        [
            jnp.cos(i * half_pi - half_pi),
            jnp.sin(i * jnp.pi) * 1.5,
            jnp.cos(i * half_pi),
        ],
        axis=-1,
    )


def linearize_depth(d, near, far):
    """linearize_depth (shared_helper_funcs.h:214-218)."""
    depth_sample = 2.0 * d - 1.0
    return 2.0 * near * far / (far + near - depth_sample * (far - near))
