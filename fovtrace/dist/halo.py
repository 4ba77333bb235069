"""Row-halo exchange across a 1-D device mesh via ppermute.

The reconstruction filters (Sobel saliency, pull-push blur, À-Trous) have
cross-row footprints; when the screen is row-sharded, each device needs a
few rows owned by its neighbors. `ppermute` shifts ride the ICI ring —
this is the renderer's analog of sequence-parallel halo exchange
(SURVEY.md §2.6, §5 long-context analog). No reference counterpart: the
reference is single-GPU (SURVEY.md §2.6).

Convention: arrays are the device-local row block [bh, W, ...]; halos at
true screen edges are ZERO-filled, matching the single-chip kernels'
zero-pad out-of-bounds semantics, so sharded filters are bit-comparable
to their single-chip counterparts (tests/test_dist.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _n_axis(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def halo_pad_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """[bh, ...] -> [bh + 2*halo, ...] with neighbor rows (zeros at the
    screen edges). Must be called inside shard_map over `axis_name`."""
    n = _n_axis(axis_name)
    top = x[:halo]          # my top rows -> previous device's bottom halo
    bot = x[-halo:]         # my bottom rows -> next device's top halo
    # receive from next device (i+1 -> i): their TOP rows are my bottom halo
    from_next = jax.lax.ppermute(
        top, axis_name, perm=[(i + 1, i) for i in range(n - 1)])
    # receive from previous device (i-1 -> i): their BOTTOM rows are my top halo
    from_prev = jax.lax.ppermute(
        bot, axis_name, perm=[(i, i + 1) for i in range(n - 1)])
    # ppermute leaves devices with no source as ZEROS — exactly the
    # zero-pad we want at the first/last tile
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def crop_rows(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Inverse of halo_pad_rows: drop the halo rows."""
    return x[halo:x.shape[0] - halo]
