"""Sharded reconstruction: halo-exchange pull-push / À-Trous, gathered
JFA / Sibson.

Cross-tile strategy per filter (SURVEY.md §7 hard part 6):
  - pull-push: pull levels are 2x2-local while the tile row count stays
    even; the small remaining pyramid is ALL-GATHERED and finished with
    the single-chip `pull_push_v` (identical depth — exact parity), then
    pushed back down sharded with a 1-row halo per level. The push blur
    weights are alpha-gated, so zero edge halos are exactly the
    single-chip out-of-bounds behavior.
  - À-Trous: per iteration (step s), exchange 2s halo rows of color /
    position / normal and mask out-of-screen rows from the tap weights.
  - JFA / Sibson: the flood's early steps span the whole screen, so the
    sparse buffer is gathered and the single-chip kernels run replicated
    (cheap: one [H,W,4] all_gather; optimizing this is not worth the
    complexity while JFA is not the default reconstruction).

All functions run INSIDE shard_map over a 1-D row mesh, on PLANAR
buffers (Vec3 of [bh,W] planes — fovtrace.core.vec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovtrace.core import vec
from fovtrace.core.vec import Vec3
from fovtrace.dist.halo import crop_rows, halo_pad_rows
from fovtrace.kernels import atrous as atrous_mod
from fovtrace.kernels import jfa as jfa_mod
from fovtrace.kernels import pullpush as pp_mod
from fovtrace.kernels import sibson as sibson_mod


def _my_rows(full, axis_name, bh):
    i = jax.lax.axis_index(axis_name)
    sl = lambda p: jax.lax.dynamic_slice_in_dim(p, i * bh, bh, axis=0)
    return jax.tree.map(sl, full)


def _gather(x, axis_name):
    return jax.tree.map(
        lambda p: jax.lax.all_gather(p, axis_name, tiled=True), x)


def _halo(x, halo, axis_name):
    return jax.tree.map(lambda p: halo_pad_rows(p, halo, axis_name), x)


def pull_push_sharded(rgb: Vec3, alpha, axis_name: str):
    """Row-sharded pull-push, exact vs `pullpush.pull_push_v` on the
    gathered image (tested in tests/test_dist.py). Planar in/out."""
    pyramid = [(rgb, alpha)]
    while (pyramid[-1][1].shape[0] % 2 == 0
           and pyramid[-1][1].shape[0] // 2 >= 8
           and pyramid[-1][1].shape[1] % 2 == 0):
        pyramid.append(pp_mod._pull_level_v(*pyramid[-1]))
    local_levels = len(pyramid) - 1

    # finish the coarse pyramid replicated (it is small)
    full_rgb, full_a = _gather(pyramid[-1], axis_name)
    filled_rgb, filled_a = pp_mod.pull_push_v(full_rgb, full_a)
    c_rgb, c_a = _my_rows((filled_rgb, filled_a), axis_name,
                          pyramid[-1][1].shape[0])

    for lv in range(local_levels - 1, -1, -1):
        f_rgb, f_a = pyramid[lv]
        cpad_rgb, cpad_a = _halo((c_rgb, c_a), 1, axis_name)
        up = lambda p: pp_mod._upsample2(p)
        fill_rgb, fill_a = pp_mod._blur3_v(cpad_rgb.map(up), up(cpad_a))
        crop = lambda p: p[2:-2]
        c_rgb, c_a = pp_mod._fill_from_v(
            f_rgb, f_a, fill_rgb.map(crop), crop(fill_a))
    return c_rgb, c_a


def atrous_sharded(color: Vec3, pos: Vec3, norm: Vec3, iterations, c_phi,
                   n_phi, p_phi, axis_name: str, y0, height: int) -> Vec3:
    """Row-sharded À-Trous; halo = 2*step rows per iteration. Falls back
    to gather-filter-slice when the halo would exceed the tile height
    (more than one neighbor hop). Planar in/out."""
    bh = color.x.shape[0]
    out = color
    step = 1
    nphi = n_phi
    for _ in range(iterations):
        halo = 2 * step
        if halo > bh:  # multi-hop halo: gather instead
            full_c = _gather(out, axis_name)
            full_p = _gather(pos, axis_name)
            full_n = _gather(norm, axis_name)
            filt = atrous_mod.atrous_step_v(full_c, full_p, full_n,
                                            c_phi, nphi, p_phi, step)
            out = _my_rows(filt, axis_name, bh)
        else:
            cpad = _halo(out, halo, axis_name)
            ppad = _halo(pos, halo, axis_name)
            npad = _halo(norm, halo, axis_name)
            grow = (jnp.arange(bh + 2 * halo) - halo
                    + jnp.asarray(y0, jnp.int32))
            row_valid = (grow >= 0) & (grow < height)
            filt = atrous_mod.atrous_step_v(cpad, ppad, npad, c_phi, nphi,
                                            p_phi, step, row_valid=row_valid)
            out = filt.map(lambda p: crop_rows(p, halo))
        step *= 2
        nphi *= 0.5
    return out


def jfa_sharded(shading_rows, axis_name: str):
    """Gathered JFA on the packed [bh,W,4] buffer: returns
    (coord_rows, color_rows) for this tile."""
    bh = shading_rows.shape[0]
    full = jax.lax.all_gather(shading_rows, axis_name, tiled=True)
    coord, color = jfa_mod.jump_flood(full)
    return _my_rows(coord, axis_name, bh), _my_rows(color, axis_name, bh)


def sibson_sharded(shading_rows, axis_name: str, max_radius: int):
    bh = shading_rows.shape[0]
    full = jax.lax.all_gather(shading_rows, axis_name, tiled=True)
    coord, color = jfa_mod.jump_flood(full)
    si = sibson_mod.sibson_interpolate(coord, color, max_radius)
    return _my_rows(si, axis_name, bh)
