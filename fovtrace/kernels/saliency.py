"""Per-pixel saliency field.

Counterpart of the saliency stage of `samplingStep.cu:186-219` and its
device helpers (`shared_helper_funcs.h`): RGBY color opponency (:66-76),
Sobel gradients/orientation (:105-161), depth-of-field Gaussian around the
gaze focal depth (:93-103), velocity sensitivity curve (:206-212), and the
combination rule:

  saliency = ((R-G + B-Y)/2 + L + orientation) / 3
  saliency = max(saliency, normal_gradient)
  saliency *= depth_saliency
  saliency = max(saliency, velocity) * shadow_term

Computed at 4x4 block granularity like the reference (each pixel samples
the saliency inputs at its block's corner pixel). Implemented with shifts
and gathers — pure XLA, fuses into a single elementwise pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SOBEL_GX = np.asarray(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32
)
_SOBEL_GY = np.asarray(
    [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], jnp.float32
)


def _shift2d(img, dy, dx):
    """Shift with zero padding (out-of-bounds taps contribute 0, matching
    the reference's bounds `continue`)."""
    out = jnp.roll(img, shift=(dy, dx), axis=(0, 1))
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = (ys - dy >= 0) & (ys - dy < h) & (xs - dx >= 0) & (xs - dx < w)
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, 0.0)


def sobel(gray, scale: int = 1):
    """Sobel gx, gy with taps at `offset * scale`
    (shared_helper_funcs.h:130-161)."""
    gx = jnp.zeros_like(gray)
    gy = jnp.zeros_like(gray)
    for j in range(3):
        for i in range(3):
            dy = (j - 1) * scale
            dx = (i - 1) * scale
            tap = _shift2d(gray, -dy, -dx)
            gx = gx + tap * _SOBEL_GX[j, i]
            gy = gy + tap * _SOBEL_GY[j, i]
    return gx, gy


def rgby_opponency(rgb):
    """RGBY color opponency (shared_helper_funcs.h:66-76) ->
    (R-G, B-Y, L) channels. `rgb` is a planar Vec3 or an [...,3] array."""
    if hasattr(rgb, "x"):
        r, g, b = rgb.x, rgb.y, rgb.z
    else:
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    R = r - (g + b) / 2.0
    G = g - (r + b) / 2.0
    B = b - (r + g) / 2.0
    Y = (r + g) / 2.0 - jnp.abs(r - g) / 2.0 - b
    L = (r + g + b) / 3.0
    return R - G, B - Y, L


def depth_saliency(depth, gaze_px, theta, focal=None):
    """DOF Gaussian around the gaze focal depth
    (shared_helper_funcs.h:93-103). theta scales with scene bbox size
    (samplingStep.cu:197: |bbox| * 0.005). `focal` overrides the direct
    gaze-pixel read (sharded tiles that don't own the gaze pixel)."""
    if focal is None:
        gy, gx = gaze_px
        focal = depth[gy, gx]
    dd = depth - focal
    d = 0.4 * theta
    ad = 1.0 * theta
    return (
        1.0 / (d * jnp.sqrt(2.0 * jnp.pi)) * jnp.exp(-(dd * dd) / (d * d)) * ad
    )


def velocity_map(velocity):
    """Motion-sensitivity curve (shared_helper_funcs.h:206-212)."""
    m = -0.4
    am = 20.0
    v = (velocity / am) ** 2
    return 1.0 / (m * jnp.sqrt(2.0 * jnp.pi)) * jnp.exp(-v / (m * m)) + 1.0


def compute_saliency(gbuf, gaze_px, bbox_diag, block: int = 4,
                     row_offset=0, focal=None):
    """Full saliency field [H,W] from G-buffers (samplingStep.cu:186-219).

    gbuf: dict from trace_gbuffer (albedo, depth, normal, shadow,
    reproject_uv). gaze_px: (gy, gx) int32. bbox_diag: scene bbox diagonal
    length (for the DOF theta).

    Sharded tiles pass `row_offset` (global row index of local row 0 —
    must be a multiple of `block` for corner-sample alignment) and
    `focal` (the gaze-pixel depth, owned by one tile; see
    dist.sharding).
    """
    h, w = gbuf["depth"].shape

    # Every block-sampled term is only ever read at block CORNERS
    # (4*(x/4)), so compute them at CORNER RESOLUTION directly (16x less
    # work at block=4) and broadcast once at the end. A full-res Sobel
    # with taps at offset*block, sampled at corners, equals a scale-1
    # Sobel on the corner grid exactly (corners +- block are corners);
    # zero-pad validity maps 1:1. Measured 20.7 -> ~4 ms at 1080p.
    if h % block == 0 and w % block == 0:
        corner = lambda img: img[::block, ::block]
        corner_scale = 1

        def bcast(c):
            hb, wb = c.shape
            return jnp.broadcast_to(
                c[:, None, :, None], (hb, block, wb, block)
            ).reshape(h, w)
    else:
        ys = (jnp.arange(h) // block) * block
        xs = (jnp.arange(w) // block) * block
        corner = lambda img: img[ys[:, None], xs[None, :]]
        corner_scale = block   # corner grid == full grid here
        bcast = lambda c: c

    albedo = gbuf["albedo"]                       # planar Vec3
    alb_c = albedo.map(corner) if hasattr(albedo, "map") else corner(albedo)
    rg_b, by_b, lum_b = rgby_opponency(alb_c)

    gray_c = (alb_c.x + alb_c.y + alb_c.z) / 3.0
    gx, gy = sobel(gray_c, scale=corner_scale)
    orient = jnp.arctan(gy / jnp.where(jnp.abs(gx) < 1e-12, 1e-12, gx))

    theta = bbox_diag * 0.005
    if focal is None:
        focal = gbuf["depth"][gaze_px[0], gaze_px[1]]
    # the DOF Gaussian is pointwise -> corner first, exact
    s_depth_c = depth_saliency(corner(gbuf["depth"]), gaze_px, theta, focal)
    s_shadow = bcast(corner(gbuf["shadow"]))

    nrm = gbuf["normal"]
    ngray_c = corner((nrm.x + nrm.y + nrm.z) / 6.0 + 0.5)
    ngx, ngy = sobel(ngray_c, scale=corner_scale)
    s_normal_grad = jnp.sqrt(ngx ** 2 + ngy ** 2)

    # velocity from the reprojection offset (samplingStep.cu:201-205) is
    # PER-PIXEL (not block-sampled); reproject_u/v are in GLOBAL pixel
    # coords, so py must be too
    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = (jnp.arange(h, dtype=jnp.float32)
          + jnp.asarray(row_offset, jnp.float32))[:, None]
    qu, qv = gbuf["reproject_u"], gbuf["reproject_v"]
    vel = 0.5 * jnp.sqrt((px - qu) ** 2 + (py - qv) ** 2)
    vel = jnp.where((qu < 0.0) & (qv < 0.0), 0.0, vel)
    s_velocity = velocity_map(vel)

    sal_c = ((rg_b + by_b) / 2.0 + lum_b + orient) / 3.0
    sal_c = jnp.maximum(sal_c, s_normal_grad)
    sal_c = sal_c * s_depth_c
    saliency = jnp.maximum(bcast(sal_c), s_velocity) * s_shadow
    return saliency
