"""Foveated sample-mask generation + TPU-friendly ray compaction.

Counterpart of `samplingStep.cu:143-236` (gaze falloff models + dither
`masked_sampling`, shared_helper_funcs.h:237-300) and of the entire
`warpSort.cu` compaction pass (:67-222). The reference compacts the mask
with serial per-row/per-column loops for warp coherence — that concept
doesn't exist on TPU. Instead we compact with a single `argsort` over the
mask (descending), yielding a static-size ray list (`ray_budget`) that
keeps shapes jit-stable; or callers can use the mask densely.

The reference's quirk: the Weier falloff radii read `g_apectureSize`
(a typo'd, never-set variable — effectively 0), while `masked_sampling`
uses its own hard-coded r0=0.07. We implement the *intended* behavior:
all radii derive from config.aperture (SURVEY.md §7 hard part #7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Gather-adjoint compaction primitives.
#
# A stable compaction is a bijection between the selected source lanes and
# the first `total` compacted slots, so BOTH directions of the data
# movement (and both adjoints) can be row GATHERS. Plain AD would emit a
# scatter-add for each gather's backward — measured 27 ms for 627k rows /
# ~90 ms for 2.1M rows on TPU, where the equivalent gather runs 8.6 ms
# (the scatter engine serializes per index). The index maps ride as f32
# (exact below 2^24) so custom_vjp sees only float primals.
# --------------------------------------------------------------------------
@jax.custom_vjp
def expand_by_rank(rows, rank_f, gate_f, idx_f, active_f):
    """Scatter compacted rows [B, C] back to source lanes [N, C] as a
    gather: out[p] = rows[rank[p]] * gate[p]. (rank, gate) is the
    inverse of (idx, active) — see compact_mask_rank."""
    return rows[rank_f.astype(jnp.int32)] * gate_f[:, None]


def _expand_fwd(rows, rank_f, gate_f, idx_f, active_f):
    out = expand_by_rank(rows, rank_f, gate_f, idx_f, active_f)
    return out, (rank_f, gate_f, idx_f, active_f)


def _expand_bwd(res, ct):
    rank_f, gate_f, idx_f, active_f = res
    # adjoint w.r.t. rows: slot j's cotangent is the cotangent of the
    # one pixel it landed on — a row gather at idx
    rows_bar = ct[idx_f.astype(jnp.int32)] * active_f[:, None]
    return (rows_bar, jnp.zeros_like(rank_f), jnp.zeros_like(gate_f),
            jnp.zeros_like(idx_f), jnp.zeros_like(active_f))


expand_by_rank.defvjp(_expand_fwd, _expand_bwd)


@jax.custom_vjp
def compact_gather(rows, idx_f, rank_f, gate_f):
    """Gather source rows [N, C] into compacted slots [B, C]:
    out[j] = rows[idx[j]]; adjoint is the inverse gather
    rows_bar[p] = ct[rank[p]] * gate[p] instead of AD's scatter-add."""
    return rows[idx_f.astype(jnp.int32)]


def _cgather_fwd(rows, idx_f, rank_f, gate_f):
    return compact_gather(rows, idx_f, rank_f, gate_f), (idx_f, rank_f,
                                                         gate_f)


def _cgather_bwd(res, ct):
    idx_f, rank_f, gate_f = res
    rows_bar = ct[rank_f.astype(jnp.int32)] * gate_f[:, None]
    return (rows_bar, jnp.zeros_like(idx_f), jnp.zeros_like(rank_f),
            jnp.zeros_like(gate_f))


compact_gather.defvjp(_cgather_fwd, _cgather_bwd)

# 4x4 dither masks (shared_helper_funcs.h:242-263). 1 = sample.
# numpy (not jnp): module-level device constants would initialize the
# XLA backend at import time, which breaks jax.distributed.initialize
# in multi-controller runs (it must run before any backend init).
import numpy as _np

MASK_25 = _np.asarray(
    [[1, 1, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1], [1, 1, 1, 1]], bool
)
MASK_50 = _np.asarray(
    [[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1], [0, 0, 1, 1]], bool
)
MASK_75 = _np.asarray(
    [[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]], bool
)


def gaze_distance(height: int, width: int, gaze_px) -> jnp.ndarray:
    """Normalized distance-to-gaze field: |px - gaze| / |screen|
    (samplingStep.cu:145)."""
    gy, gx = gaze_px
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    d = jnp.sqrt((px - gx) ** 2 + (py - gy) ** 2)
    return d / jnp.sqrt(float(width) ** 2 + float(height) ** 2)


def weier_sample_rate(gaze_dist, aperture: float, p_min: float = 0.05):
    """Weier et al. linear falloff (samplingStep.cu:150-156):
    1 inside r0, p_min beyond r1=2*r0, linear ramp between."""
    r0 = aperture
    r1 = aperture * 2.0
    ramp = 1.0 - (1.0 - p_min) * ((gaze_dist - r0) / (r1 - r0))
    return jnp.where(gaze_dist < r0, 1.0, jnp.where(gaze_dist > r1, p_min, ramp))


def author_sample_rate(gaze_dist, aperture: float):
    """The author's rational falloff (samplingStep.cu:145-147)."""
    alpha = ((1.0 / 0.8) - 1.0) / (aperture**2)
    return jnp.clip(1.0 / (alpha * (2.0 * gaze_dist) ** 2 + 1.0), 0.0, 1.0)


def masked_sampling(height: int, width: int, gaze_dist, saliency,
                    aperture: float = 0.07, extra_sample_rate: int = 8):
    """Binary dither-mask decision (shared_helper_funcs.h:265-300).

    Distance bands: full inside r0; 25-mask to 1.5*r0; 50-mask to 2*r0.
    Saliency bands OR in extra samples; a sparse 1/extra^2 grid floors the
    periphery where saliency <= g0. Returns bool [H,W].

    NOTE (parity): the mask tables index [x % 4][y % 4] in the reference
    (column-major); we follow that exact convention.
    """
    r0 = aperture
    r1 = r0 * 1.5
    r2 = r0 * 2.0

    # static dither patterns, tiled in numpy at trace time (a runtime
    # [H,W] gather from the 4x4 tables is scalar-unit-bound on TPU)
    import numpy as _np

    ys = _np.arange(height)[:, None] % 4
    xs = _np.arange(width)[None, :] % 4
    m25 = jnp.asarray(_np.asarray(MASK_25)[xs, ys])
    m50 = jnp.asarray(_np.asarray(MASK_50)[xs, ys])
    m75 = jnp.asarray(_np.asarray(MASK_75)[xs, ys])

    sample = jnp.where(
        gaze_dist < r0,
        True,
        jnp.where(
            gaze_dist <= r1, m25, jnp.where(gaze_dist <= r2, m50, False)
        ),
    )

    g0, g1, g2 = 0.01, 0.4, 0.6
    s = saliency
    sal_extra = jnp.where(
        (s > g0) & (s < g1),
        m75,
        jnp.where((s >= g1) & (s < g2), m50, jnp.where(s >= g2, m25, False)),
    )
    sparse_floor = (
        (jnp.arange(height)[:, None] % extra_sample_rate == 0)
        & (jnp.arange(width)[None, :] % extra_sample_rate == 0)
    )
    sal_extra = jnp.where(s <= g0, sparse_floor, sal_extra)
    return sample | sal_extra


def logpolar_sampling(height: int, width: int, gaze_px,
                      kernel_scale: float = 0.25, row_offset=0,
                      block_h: int | None = None):
    """Log-polar sampling pattern (samplingStep.cu:179-182, commented
    alternative): a pixel is sampled iff it round-trips through the
    quarter-res log-polar buffer to within ~1.1px.

    Per-pixel independent, so the sharded path computes its row block
    directly: `row_offset`/`block_h` select rows [row_offset,
    row_offset+block_h) of the SAME global pattern (height/width stay
    the full-frame dims for the log-polar kernel size)."""
    from fovtrace.kernels import logpolar

    gy, gx = gaze_px
    kh = int(height * kernel_scale)
    kw = int(width * kernel_scale)
    bh = height if block_h is None else block_h
    py = (jnp.arange(bh, dtype=jnp.float32)[:, None]
          + jnp.asarray(row_offset, jnp.float32)) * jnp.ones((1, width))
    px = jnp.arange(width, dtype=jnp.float32)[None, :] * jnp.ones((bh, 1))
    u, v = logpolar.forward_coords(px, py, gx, gy, kw, kh)
    # QUANTIZE to the quarter-res buffer's texel grid before inverting —
    # the pixel must be recoverable from the discrete log-polar BUFFER
    # (round 5 fix: the analytic round trip is the identity, which made
    # the mask all-true, i.e. no foveation at all)
    u = jnp.round(u)
    v = jnp.round(v)
    x2, y2 = logpolar.inverse_coords(u, v, gx, gy, kw, kh)
    d = jnp.sqrt((px - x2) ** 2 + (py - y2) ** 2)
    return d < jnp.sqrt(jnp.sqrt(2.0) * 1.5)


def compact_mask(mask: jnp.ndarray, budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(N) stable stream compaction of a flat bool mask via cumsum +
    scatter (no sort). Returns (idx [budget] int32 positions of the set
    bits in order, active [budget] bool). Excess set bits beyond
    `budget` are dropped."""
    idx, active, _, _ = compact_mask_rank(mask, budget)
    return idx, active


def compact_mask_rank(mask: jnp.ndarray, budget: int):
    """compact_mask plus the INVERSE map: (idx, active, rank [N] i32,
    gate [N] bool) with rank[p] = the compacted slot of set pixel p and
    gate[p] = it landed inside the budget. The inverse map lets callers
    scatter per-ray results back to pixels as a row GATHER
    (`rows[rank] * gate`) — a 627k-row scatter-add measured 27 ms on
    TPU where the equivalent 2.1M-index row gather runs 8.6 ms (the
    scatter engine serializes per index)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (pos < budget), pos, budget)
    idx = jnp.full((budget,), 0, jnp.int32)
    idx = idx.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    total = jnp.sum(mask.astype(jnp.int32))
    active = jnp.arange(budget) < total
    gate = mask & (pos < budget)
    rank = jnp.where(gate, pos, 0)
    return idx, active, rank, gate


def compact_mask_keyed(mask: jnp.ndarray, key: jnp.ndarray, nkeys: int,
                       budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable KEY-MAJOR stream compaction: set lanes are packed bucket
    0 first, then bucket 1, ..., preserving original order inside each
    bucket (a counting sort fused into the compaction — nkeys static
    cumsums, no sort network, no extra gathers).

    Used by the wavefront shader to order each bounce's survivors by
    direction OCTANT: a 256-ray kernel block mixing all 8 octants gives
    the bundle interval test a direction interval that straddles zero in
    every component (no slab constraint -> every cluster live); octant-
    major packing measured 21.7 -> 9.3 mean live clusters and 2.1x on
    the bounce traversal at 1080p bench config. The stable within-bucket
    order preserves the previous bounce's screen-tile origin coherence.

    Returns (idx [budget] i32 source positions, active [budget] bool).
    Overflow beyond `budget` drops from the TAIL buckets first.
    """
    idx, active, _, _ = compact_mask_keyed_rank(mask, key, nkeys, budget)
    return idx, active


def compact_mask_keyed_rank(mask: jnp.ndarray, key: jnp.ndarray, nkeys: int,
                            budget: int):
    """compact_mask_keyed plus the inverse map (rank [N] i32, gate [N]
    bool) — rank[p] = the compacted slot of selected lane p — enabling
    gather-form adjoints (see compact_gather)."""
    n = mask.shape[0]
    dest = jnp.full((n,), budget, jnp.int32)
    offset = jnp.zeros((), jnp.int32)
    for k in range(nkeys):
        sel = mask & (key == k)
        seli = sel.astype(jnp.int32)
        r = offset + jnp.cumsum(seli) - 1
        dest = jnp.where(sel & (r < budget), r, dest)
        offset = offset + jnp.sum(seli)
    idx = jnp.zeros((budget,), jnp.int32)
    idx = idx.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    active = jnp.arange(budget) < offset
    gate = dest < budget
    rank = jnp.where(gate, dest, 0)
    return idx, active, rank, gate


def direction_octant(d) -> jnp.ndarray:
    """[N] i32 in [0,8): sign octant of an SoA direction Vec3."""
    return ((d.x < 0.0).astype(jnp.int32) * 4
            + (d.y < 0.0).astype(jnp.int32) * 2
            + (d.z < 0.0).astype(jnp.int32))


def compact_rays(mask: jnp.ndarray, budget: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-size stream compaction of a [H,W] bool mask.

    Replaces warpSort.cu's serial row/column compaction with an O(N)
    cumsum+scatter (stable: compacted rays stay in scanline order ->
    memory-coherent gathers, the TPU analog of warp coherence). Returns
    (indices [budget] int32 into the flat pixel array, active [budget]
    bool). If the mask has more than `budget` set pixels the excess is
    dropped (callers choose budget >= expected max).
    """
    return compact_mask(mask.reshape(-1), budget)


def scatter_rays(values: jnp.ndarray, idx: jnp.ndarray, active: jnp.ndarray,
                 n_pixels: int) -> jnp.ndarray:
    """Scatter compacted per-ray values back to the flat pixel grid."""
    out = jnp.zeros((n_pixels,) + values.shape[1:], values.dtype)
    safe_idx = jnp.where(active, idx, n_pixels)  # OOB drops
    return out.at[safe_idx].set(jnp.where(
        active.reshape((-1,) + (1,) * (values.ndim - 1)), values, 0.0
    ), mode="drop")
