"""BVH construction (host-side, numpy) + flattened array layout.

TPU-native replacement for OptiX's opaque Trbvh acceleration builder
(`PathTracer.cpp:641,648`): a binned-SAH BVH2 built on the host and
flattened into struct-of-array buffers that the traversal kernels consume
directly. Triangles are REORDERED so every leaf is a contiguous range,
padded to `leaf_align` so leaf intersection runs in fixed-size vector
blocks.

Layout (all numpy, converted to jnp by the caller):
  nodes_min   [Nn,3] f32   AABB lower corner
  nodes_max   [Nn,3] f32   AABB upper corner
  nodes_left  [Nn]  i32    inner: left child index;  leaf: tri start
  nodes_right [Nn]  i32    inner: right child index; leaf: tri count
  nodes_leaf  [Nn]  i32    1 = leaf
  order       [T']  i64    reordered (padded) triangle indices into the
                           original arrays; padding repeats a degenerate
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass
class FlatBVH:
    nodes_min: np.ndarray
    nodes_max: np.ndarray
    nodes_left: np.ndarray
    nodes_right: np.ndarray
    nodes_leaf: np.ndarray
    order: np.ndarray
    max_depth: int

    @property
    def num_nodes(self) -> int:
        return len(self.nodes_min)


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              valid: np.ndarray, max_leaf: int = 16, leaf_align: int = 16,
              num_bins: int = 16, use_native: bool = True) -> FlatBVH:
    """Binned-SAH BVH2 over triangles (v0, v0+e1, v0+e2).

    `valid` masks out padding triangles (they never enter the tree).
    Prefers the native C++ builder (native/fovnative.cpp — the host-side
    counterpart of OptiX's Trbvh build); the pure-python path below is
    the fallback and the test oracle (identical flat layout).
    """
    if use_native:
        try:
            from fovtrace import native as _native

            out = _native.build_bvh_native(
                np.asarray(v0, np.float32), np.asarray(e1, np.float32),
                np.asarray(e2, np.float32), np.asarray(valid, np.uint8),
                max_leaf=max_leaf, leaf_align=leaf_align, num_bins=num_bins,
            )
            if out is not None:
                return FlatBVH(
                    nodes_min=out["nodes_min"], nodes_max=out["nodes_max"],
                    nodes_left=out["nodes_left"],
                    nodes_right=out["nodes_right"],
                    nodes_leaf=out["nodes_leaf"], order=out["order"],
                    max_depth=out["max_depth"],
                )
        except Exception:
            pass
    idx_all = np.nonzero(valid)[0]
    t = len(idx_all)
    if t == 0:
        raise ValueError("empty scene")

    p0 = v0[idx_all]
    p1 = p0 + e1[idx_all]
    p2 = p0 + e2[idx_all]
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    centroid = (tri_min + tri_max) * 0.5

    nodes_min, nodes_max = [], []
    nodes_left, nodes_right, nodes_leaf = [], [], []
    order = []
    max_depth_seen = [0]

    def new_node():
        nodes_min.append(np.zeros(3, np.float32))
        nodes_max.append(np.zeros(3, np.float32))
        nodes_left.append(0)
        nodes_right.append(0)
        nodes_leaf.append(0)
        return len(nodes_min) - 1

    def surface(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def build(ids: np.ndarray, depth: int) -> int:
        node = new_node()
        max_depth_seen[0] = max(max_depth_seen[0], depth)
        bmin = tri_min[ids].min(axis=0)
        bmax = tri_max[ids].max(axis=0)
        nodes_min[node] = bmin.astype(np.float32)
        nodes_max[node] = bmax.astype(np.float32)

        if len(ids) <= max_leaf:
            return _make_leaf(node, ids)

        # binned SAH on the widest centroid axis
        cmin = centroid[ids].min(axis=0)
        cmax = centroid[ids].max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] < 1e-12:
            return _make_leaf(node, ids)

        c = centroid[ids][:, axis]
        bins = np.clip(
            ((c - cmin[axis]) / extent[axis] * num_bins).astype(np.int32),
            0, num_bins - 1,
        )
        best_cost, best_split = np.inf, -1
        for split in range(1, num_bins):
            left = bins < split
            nl = left.sum()
            nr = len(ids) - nl
            if nl == 0 or nr == 0:
                continue
            lmin = tri_min[ids[left]].min(axis=0)
            lmax = tri_max[ids[left]].max(axis=0)
            rmin = tri_min[ids[~left]].min(axis=0)
            rmax = tri_max[ids[~left]].max(axis=0)
            cost = surface(lmin, lmax) * nl + surface(rmin, rmax) * nr
            if cost < best_cost:
                best_cost, best_split = cost, split

        if best_split < 0:
            # all centroids in one bin: median split
            med = np.argsort(c)
            half = len(ids) // 2
            lids, rids = ids[med[:half]], ids[med[half:]]
        else:
            left = bins < best_split
            lids, rids = ids[left], ids[~left]

        l = build(lids, depth + 1)
        r = build(rids, depth + 1)
        nodes_left[node] = l
        nodes_right[node] = r
        return node

    def _make_leaf(node: int, ids: np.ndarray) -> int:
        start = len(order)
        order.extend(idx_all[ids].tolist())
        pad = (-len(ids)) % leaf_align
        order.extend([idx_all[ids[0]]] * 0 + [-1] * pad)
        nodes_left[node] = start
        nodes_right[node] = len(ids) + pad
        nodes_leaf[node] = 1
        return node

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        build(np.arange(t), 0)
    finally:
        sys.setrecursionlimit(old_limit)

    order_arr = np.asarray(order, np.int64)
    return FlatBVH(
        nodes_min=np.asarray(nodes_min, np.float32),
        nodes_max=np.asarray(nodes_max, np.float32),
        nodes_left=np.asarray(nodes_left, np.int32),
        nodes_right=np.asarray(nodes_right, np.int32),
        nodes_leaf=np.asarray(nodes_leaf, np.int32),
        order=order_arr,
        max_depth=max_depth_seen[0],
    )


def reorder_scene_arrays(scene_arrays: dict, order: np.ndarray) -> dict:
    """Gather per-triangle arrays into BVH leaf order. order == -1 entries
    become degenerate padding triangles (zero-area, mat_id -1)."""
    out = {}
    safe = np.maximum(order, 0)
    for k, a in scene_arrays.items():
        g = np.asarray(a)[safe]
        if k in ("e1", "e2"):
            g = np.where((order >= 0)[:, None], g, 0.0)  # degenerate
        if k == "mat_id":
            g = np.where(order >= 0, g, -1)
        out[k] = g
    return out
