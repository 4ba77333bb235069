"""Log-polar foveated transform (forward + inverse).

Counterpart of `shared_helper_funcs.h:376-412` (FowardLogPolar /
InverseLogPolar, rho-exponent 4) and the GL compute shaders
`logPolarCPFS.glsl` / `ilogPolarCPFS.glsl` (built but disabled in the
reference's frame loop, main.cpp:360-365). The kernel-space buffer is
0.25x the screen (Log_Polar_Transform.cpp:7-8).

L = log(max corner distance from gaze). Forward maps (x,y) ->
(rho, theta) with rho warped by (log r / L)^4; inverse maps back.
Coordinate functions are differentiable; the resampling uses gather with
nearest indices (stop-gradient on indices).
"""

from __future__ import annotations

import jax.numpy as jnp


def _log_max_corner(gx, gy, width, height):
    l1 = jnp.sqrt(gx**2 + gy**2)
    l2 = jnp.sqrt((width - gx) ** 2 + (height - gy) ** 2)
    l3 = jnp.sqrt(gx**2 + (height - gy) ** 2)
    l4 = jnp.sqrt((width - gx) ** 2 + gy**2)
    return jnp.log(jnp.maximum(jnp.maximum(l1, l2), jnp.maximum(l3, l4)))


def forward_coords(x, y, gx, gy, buf_w, buf_h):
    """(x, y) screen -> (u, v) log-polar buffer coords (float)."""
    xp = x - gx
    yp = y - gy
    L = _log_max_corner(gx, gy, buf_w, buf_h)
    r = jnp.sqrt(xp**2 + yp**2)
    u = ((jnp.log(jnp.maximum(r, 1e-6)) / L) ** 4) * buf_w
    ang = jnp.arctan2(yp, xp)
    ang = ang + jnp.where(yp < 0.0, 2.0 * jnp.pi, 0.0)
    v = ang * (buf_h / (2.0 * jnp.pi))
    return u, v


def inverse_coords(u, v, gx, gy, buf_w, buf_h):
    """(u, v) log-polar buffer -> (x, y) screen coords (float)."""
    L = _log_max_corner(gx, gy, buf_w, buf_h)
    B = (2.0 * jnp.pi) / buf_h
    K = jnp.maximum(u / buf_w, 0.0) ** 0.25
    r = jnp.exp(L * K)
    x = r * jnp.cos(B * v) + gx
    y = r * jnp.sin(B * v) + gy
    return x, y


def forward_transform(img: jnp.ndarray, gaze_px, scale: float = 0.25):
    """Resample screen image [H,W,C] into log-polar space
    [H*scale, W*scale, C] (logPolarCPFS.glsl)."""
    h, w = img.shape[0], img.shape[1]
    bh, bw = int(h * scale), int(w * scale)
    gy, gx = gaze_px
    vu = jnp.arange(bh, dtype=jnp.float32)[:, None] * jnp.ones((1, bw))
    uu = jnp.arange(bw, dtype=jnp.float32)[None, :] * jnp.ones((bh, 1))
    x, y = inverse_coords(uu, vu, jnp.float32(gx), jnp.float32(gy), bw, bh)
    xi = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
    return img[yi, xi]


def inverse_transform(lp_img: jnp.ndarray, out_shape, gaze_px):
    """Resample log-polar image back to screen space [H,W,C]
    (ilogPolarCPFS.glsl)."""
    h, w = out_shape
    bh, bw = lp_img.shape[0], lp_img.shape[1]
    gy, gx = gaze_px
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    u, v = forward_coords(xx, yy, jnp.float32(gx), jnp.float32(gy), bw, bh)
    ui = jnp.clip(jnp.round(u), 0, bw - 1).astype(jnp.int32)
    vi = jnp.clip(jnp.round(v), 0, bh - 1).astype(jnp.int32)
    return lp_img[vi, ui]
