"""Sharded reconstruction: halo-exchange pull-push / À-Trous, gathered
JFA / Sibson.

Cross-tile strategy per filter (SURVEY.md §7 hard part 6):
  - pull-push: pull levels are 2x2-local while the tile row count stays
    even; the small remaining pyramid is ALL-GATHERED and finished with
    the single-chip `pull_push` (identical depth — exact parity), then
    pushed back down sharded with a 1-row halo per level. The push blur
    weights are alpha-gated, so zero edge halos are exactly the
    single-chip out-of-bounds behavior.
  - À-Trous: per iteration (step s), exchange 2s halo rows of color /
    position / normal and mask out-of-screen rows from the tap weights.
  - JFA / Sibson: the flood's early steps span the whole screen, so the
    sparse buffer is gathered and the single-chip kernels run replicated
    (cheap: one [H,W,4] all_gather; optimizing this is not worth the
    complexity while JFA is not the default reconstruction).

All functions run INSIDE shard_map over a 1-D row mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fovtrace.dist.halo import crop_rows, halo_pad_rows
from fovtrace.kernels import atrous as atrous_mod
from fovtrace.kernels import jfa as jfa_mod
from fovtrace.kernels import pullpush as pp_mod
from fovtrace.kernels import sibson as sibson_mod


def _my_rows(full, axis_name, bh):
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(full, i * bh, bh, axis=0)


def pull_push_sharded(sparse_rows: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Row-sharded pull-push, exact vs `pullpush.pull_push` on the
    gathered image (tested in tests/test_dist.py)."""
    bh = sparse_rows.shape[0]

    pyramid = [sparse_rows]
    while pyramid[-1].shape[0] % 2 == 0 and pyramid[-1].shape[0] // 2 >= 8 \
            and pyramid[-1].shape[1] % 2 == 0:
        pyramid.append(pp_mod._pull_level(pyramid[-1]))
    local_levels = len(pyramid) - 1

    # finish the coarse pyramid replicated (it is small)
    full_coarse = jax.lax.all_gather(pyramid[-1], axis_name, tiled=True)
    filled_full = pp_mod.pull_push(full_coarse)
    coarse = _my_rows(filled_full, axis_name, pyramid[-1].shape[0])

    for lv in range(local_levels - 1, -1, -1):
        fine = pyramid[lv]
        cpad = halo_pad_rows(coarse, 1, axis_name)      # [bh_c+2, w_c, 4]
        up = pp_mod._upsample2(cpad)                    # [(bh_c+2)*2, w, 4]
        filled = pp_mod._blur3(up)[2:-2]                # crop halo*2 rows
        coarse = pp_mod._fill_from(fine, filled)
    return coarse


def atrous_sharded(color_rows, pos_rows, norm_rows, iterations, c_phi,
                   n_phi, p_phi, axis_name: str, y0, height: int):
    """Row-sharded À-Trous; halo = 2*step rows per iteration. Falls back
    to gather-filter-slice when the halo would exceed the tile height
    (more than one neighbor hop)."""
    bh = color_rows.shape[0]
    out = color_rows
    step = 1
    nphi = n_phi
    for _ in range(iterations):
        halo = 2 * step
        if halo > bh:  # multi-hop halo: gather instead
            full_c = jax.lax.all_gather(out, axis_name, tiled=True)
            full_p = jax.lax.all_gather(pos_rows, axis_name, tiled=True)
            full_n = jax.lax.all_gather(norm_rows, axis_name, tiled=True)
            filt = atrous_mod.atrous_step(full_c, full_p, full_n,
                                          c_phi, nphi, p_phi, step)
            out = _my_rows(filt, axis_name, bh)
        else:
            cpad = halo_pad_rows(out, halo, axis_name)
            ppad = halo_pad_rows(pos_rows, halo, axis_name)
            npad = halo_pad_rows(norm_rows, halo, axis_name)
            grow = (jnp.arange(bh + 2 * halo) - halo
                    + jnp.asarray(y0, jnp.int32))
            row_valid = (grow >= 0) & (grow < height)
            filt = atrous_mod.atrous_step(cpad, ppad, npad, c_phi, nphi,
                                          p_phi, step, row_valid=row_valid)
            out = crop_rows(filt, halo)
        step *= 2
        nphi *= 0.5
    return out


def jfa_sharded(shading_rows, axis_name: str):
    """Gathered JFA: returns (coord_rows, color_rows) for this tile."""
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
