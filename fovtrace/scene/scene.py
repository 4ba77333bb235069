"""Scene representation: flat triangle soup + struct-of-array materials.

TPU-native replacement for the reference's OptiX scene graph
(`PathTracer::init_geometry` PathTracer.cpp:559-603, `load_obj`
:676-772, `createGeometry` :634-674): instead of a two-level
Group/GeometryGroup with per-model materials, the scene is a single flat,
padded, struct-of-arrays pytree that every kernel consumes directly.
Per-model transforms are baked into world-space vertices at build time
(the scene is static; instancing can re-bake).

Material kinds and parameter defaults mirror PathTracer.cpp:676-772:
  - DIFFUSE:    Kd map, NEE area light, cosine GI bounce
  - REFLECTION: Ks=(1,1,1), reflectivity_n=0.05, phong_exp=88
  - REFRACTION: ior=1.4, fresnel (3.0, 0.1, 1.0), cutoff_color
                (0.34,0.55,0.85), Beer extinction

The area light matches `init_geometry` (PathTracer.cpp:562-567):
corner (343, 548.6, 227), v1 (-130,0,0), v2 (0,0,105), emission 810.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

MATL_DIFFUSE = 0
MATL_REFLECTION = 1
MATL_REFRACTION = 2


def host_built(build_fn):
    """Run a scene-construction thunk with eager ops on the LOCAL CPU
    backend, then push the finished pytree to the default backend in one
    batched host->device transfer.

    Scene construction (BVH build, cluster pack, attribute packing) is
    hundreds of tiny eager ops plus several device->host readbacks for
    the native BVH builder. On a remote-tunnel TPU each first
    device->host copy of a new padded-layout shape costs tens of seconds
    (measured ~62s for one [T,3] f32 readback), so building on-device
    takes minutes; building on CPU and uploading once takes <1s. The
    reference builds its acceleration structures host-side too (OptiX
    Trbvh CPU build, PathTracer.cpp:641)."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return build_fn()
    with jax.default_device(cpu):
        scene = build_fn()
    target = jax.devices()[0]
    if target.platform == "cpu":
        return scene
    return jax.device_put(scene, target)


@struct.dataclass
class ParallelogramLight:
    """Area light (commonStructs.h:57-63)."""

    corner: jnp.ndarray    # [3]
    v1: jnp.ndarray        # [3]
    v2: jnp.ndarray        # [3]
    normal: jnp.ndarray    # [3]
    emission: jnp.ndarray  # [3]

    @classmethod
    def create(cls, corner, v1, v2, emission):
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        corner, v1, v2 = f32(corner), f32(v1), f32(v2)
        n = jnp.cross(v1, v2)
        n = n / jnp.linalg.norm(n)
        return cls(corner=corner, v1=v1, v2=v2, normal=n, emission=f32(emission))

    @classmethod
    def default(cls, power: float = 810.0):
        """Reference cornell-style ceiling light (PathTracer.cpp:562-566)."""
        return cls.create(
            corner=(343.0, 548.6, 227.0),
            v1=(-130.0, 0.0, 0.0),
            v2=(0.0, 0.0, 105.0),
            emission=(power, power, power),
        )

    @property
    def area(self):
        return jnp.linalg.norm(jnp.cross(self.v1, self.v2))


@struct.dataclass
class Materials:
    """Struct-of-arrays material table, indexed by per-triangle mat_id."""

    kind: jnp.ndarray            # [M] int32: 0 diffuse / 1 reflect / 2 refract
    kd: jnp.ndarray              # [M,3] diffuse albedo (flat color; texture below)
    ks: jnp.ndarray              # [M,3] specular for phong
    phong_exp: jnp.ndarray       # [M]
    reflectivity_n: jnp.ndarray  # [M,3] schlick base reflectivity
    ior: jnp.ndarray             # [M] refraction index
    extinction: jnp.ndarray      # [M,3] log-extinction (Beer), 0 = clear
    refraction_color: jnp.ndarray  # [M,3]
    reflection_color: jnp.ndarray  # [M,3]
    fresnel_exponent: jnp.ndarray  # [M]
    fresnel_minimum: jnp.ndarray   # [M]
    fresnel_maximum: jnp.ndarray   # [M]
    shadow_attenuation: jnp.ndarray  # [M,3]
    texture_id: jnp.ndarray      # [M] int32 index into scene.textures (-1 = none)

    @classmethod
    def create(cls, kinds, kds, textures=None, **overrides):
        """Build a material table from per-material kind + albedo lists."""
        m = len(kinds)
        f32 = np.float32

        def arr(name, default, dim=None):
            v = overrides.get(name)
            if v is None:
                if dim is None:
                    return jnp.full((m,), default, dtype=jnp.float32)
                return jnp.tile(jnp.asarray(default, jnp.float32), (m, 1))
            return jnp.asarray(v, dtype=jnp.float32)

        tex = (
            jnp.asarray(textures, jnp.int32)
            if textures is not None
            else jnp.full((m,), -1, jnp.int32)
        )
        return cls(
            kind=jnp.asarray(kinds, jnp.int32),
            kd=jnp.asarray(np.asarray(kds, f32)),
            ks=arr("ks", (1.0, 1.0, 1.0), dim=3),
            phong_exp=arr("phong_exp", 88.0),
            reflectivity_n=arr("reflectivity_n", (0.05, 0.05, 0.05), dim=3),
            ior=arr("ior", 1.4),
            extinction=arr("extinction", (0.0, 0.0, 0.0), dim=3),
            refraction_color=arr("refraction_color", (1.0, 1.0, 1.0), dim=3),
            reflection_color=arr("reflection_color", (1.0, 1.0, 1.0), dim=3),
            fresnel_exponent=arr("fresnel_exponent", 3.0),
            fresnel_minimum=arr("fresnel_minimum", 0.1),
            fresnel_maximum=arr("fresnel_maximum", 1.0),
            shadow_attenuation=arr("shadow_attenuation", (1.0, 1.0, 1.0), dim=3),
            texture_id=tex,
        )


@struct.dataclass
class Scene:
    """Flat world-space triangle soup + materials + light + envmap.

    Triangle count is padded to a multiple of the intersection kernel tile
    (degenerate zero-area triangles, mat_id -1) so that all shapes are
    static under jit.
    """

    v0: jnp.ndarray        # [T,3] triangle vertex 0 (world space)
    e1: jnp.ndarray        # [T,3] v1 - v0
    e2: jnp.ndarray        # [T,3] v2 - v0
    n0: jnp.ndarray        # [T,3] shading normal at v0
    n1: jnp.ndarray        # [T,3]
    n2: jnp.ndarray        # [T,3]
    uv0: jnp.ndarray       # [T,2]
    uv1: jnp.ndarray       # [T,2]
    uv2: jnp.ndarray       # [T,2]
    mat_id: jnp.ndarray    # [T] int32 (-1 = padding)
    materials: Materials
    light: ParallelogramLight
    envmap: jnp.ndarray            # [He,We,3] lat-long HDR (ones if none)
    textures: jnp.ndarray          # [Ntex,Ht,Wt,3] albedo atlas (stacked, same size)
    bbox_min: jnp.ndarray  # [3]
    bbox_max: jnp.ndarray  # [3]

    # flattened BVH (None until with_bvh(); triangles then in leaf order)
    bvh_nodes_min: Optional[jnp.ndarray] = None   # [Nn,3]
    bvh_nodes_max: Optional[jnp.ndarray] = None   # [Nn,3]
    bvh_left: Optional[jnp.ndarray] = None        # [Nn] i32
    bvh_right: Optional[jnp.ndarray] = None       # [Nn] i32
    bvh_leaf: Optional[jnp.ndarray] = None        # [Nn] i32
    bvh_max_stack: int = struct.field(pytree_node=False, default=0)

    # Pallas intersection pack (None until with_pack(); see
    # fovtrace.kernels.pallas_isect — MXU determinant coefficients,
    # occlusion aux rows, cluster AABBs)
    isect_coef: Optional[jnp.ndarray] = None      # [NC, 16, 4c]
    isect_aux: Optional[jnp.ndarray] = None       # [NC, 8, c]
    cluster_aabb: Optional[jnp.ndarray] = None    # [NC, 8]

    # packed per-triangle shading attributes [T, 24]: n0 n1 n2 (9), gn
    # (3), uv0 uv1 uv2 (6), mat_id (1), pad. ROW-major on purpose: the
    # TPU gather engine moves a row per index, so ONE [N,24] row gather
    # costs ~10ms at 2M rays where 19 per-component 1-D gathers cost
    # ~385ms (measured); the padded gather result is consumed fused, so
    # its T(8,128) lane padding never round-trips HBM
    tri_attr: Optional[jnp.ndarray] = None

    @property
    def has_bvh(self) -> bool:
        return self.bvh_nodes_min is not None

    def with_bvh(self, max_leaf: int = 16) -> "Scene":
        """Build the acceleration structure (host-side) and reorder the
        triangle arrays into leaf order. Replaces the OptiX Trbvh build
        (PathTracer.cpp:641,648)."""
        from fovtrace.scene import bvh as bvh_mod

        valid = np.asarray(self.mat_id) >= 0
        flat = bvh_mod.build_bvh(
            np.asarray(self.v0), np.asarray(self.e1), np.asarray(self.e2),
            valid, max_leaf=max_leaf,
        )
        arrays = {
            k: getattr(self, k)
            for k in ("v0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1",
                      "uv2", "mat_id")
        }
        re = bvh_mod.reorder_scene_arrays(arrays, flat.order)
        j = jnp.asarray
        return self.replace(
            **{k: j(v) for k, v in re.items()},
            bvh_nodes_min=j(flat.nodes_min),
            bvh_nodes_max=j(flat.nodes_max),
            bvh_left=j(flat.nodes_left),
            bvh_right=j(flat.nodes_right),
            bvh_leaf=j(flat.nodes_leaf),
            bvh_max_stack=int(flat.max_depth + 2),
        ).with_pack()

    def with_pack(self) -> "Scene":
        """Precompute the Pallas intersection pack (MXU determinant
        coefficients + cluster AABBs) and the packed shading-attribute
        rows. Cheapest when triangles are already in BVH leaf order
        (with_bvh calls this automatically)."""
        from fovtrace.kernels import pallas_isect

        coef, aux, clusters = pallas_isect.compute_pack(self)

        gn = jnp.cross(self.e1, self.e2)
        gn = gn / jnp.maximum(
            jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        attr = jnp.concatenate(
            [self.n0, self.n1, self.n2, gn,
             self.uv0, self.uv1, self.uv2,
             self.mat_id[:, None].astype(jnp.float32),
             jnp.zeros((self.num_triangles, 5), jnp.float32)],
            axis=1,
        )
        return self.replace(isect_coef=coef, isect_aux=aux,
                            cluster_aabb=clusters, tri_attr=attr)

    @property
    def num_triangles(self) -> int:
        return self.v0.shape[0]

    @classmethod
    def build(
        cls,
        vertices: np.ndarray,      # [V,3]
        triangles: np.ndarray,     # [T,3] int
        mat_ids: np.ndarray,       # [T] int
        materials: Materials,
        normals: Optional[np.ndarray] = None,   # [V,3]
        uvs: Optional[np.ndarray] = None,       # [V,2]
        light: Optional[ParallelogramLight] = None,
        envmap: Optional[np.ndarray] = None,
        textures: Optional[np.ndarray] = None,
        pad_to: int = 128,
    ) -> "Scene":
        vertices = np.asarray(vertices, np.float32)
        triangles = np.asarray(triangles, np.int64)
        mat_ids = np.asarray(mat_ids, np.int32)
        t = triangles.shape[0]

        if normals is None:
            # area-weighted vertex normals from face normals
            fv0 = vertices[triangles[:, 0]]
            fn = np.cross(
                vertices[triangles[:, 1]] - fv0, vertices[triangles[:, 2]] - fv0
            )
            normals = np.zeros_like(vertices)
            for k in range(3):
                np.add.at(normals, triangles[:, k], fn)
            lens = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = normals / np.maximum(lens, 1e-12)
        if uvs is None:
            uvs = np.zeros((vertices.shape[0], 2), np.float32)

        pad = (-t) % pad_to
        tv0 = vertices[triangles[:, 0]]
        tv1 = vertices[triangles[:, 1]]
        tv2 = vertices[triangles[:, 2]]

        def padv(a, fill=0.0):
            return np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
            )

        v0 = padv(tv0)
        e1 = padv(tv1 - tv0)
        e2 = padv(tv2 - tv0)
        n0 = padv(normals[triangles[:, 0]].astype(np.float32))
        n1 = padv(normals[triangles[:, 1]].astype(np.float32))
        n2 = padv(normals[triangles[:, 2]].astype(np.float32))
        uv0 = padv(uvs[triangles[:, 0]].astype(np.float32))
        uv1 = padv(uvs[triangles[:, 1]].astype(np.float32))
        uv2 = padv(uvs[triangles[:, 2]].astype(np.float32))
        mid = np.concatenate([mat_ids, np.full((pad,), -1, np.int32)])

        if envmap is None:
            envmap = np.zeros((8, 16, 3), np.float32)
        if textures is None:
            # 1x1 placeholder: statically distinguishable from any real
            # texture atlas (hit_surface skips the texel gather for it)
            textures = np.ones((1, 1, 1, 3), np.float32)
        if light is None:
            light = ParallelogramLight.default()

        bbox_min = vertices.min(axis=0) if len(vertices) else np.zeros(3, np.float32)
        bbox_max = vertices.max(axis=0) if len(vertices) else np.ones(3, np.float32)

        j = jnp.asarray
        return cls(
            v0=j(v0), e1=j(e1), e2=j(e2),
            n0=j(n0), n1=j(n1), n2=j(n2),
            uv0=j(uv0), uv1=j(uv1), uv2=j(uv2),
            mat_id=j(mid),
            materials=materials,
            light=light,
            envmap=j(np.asarray(envmap, np.float32)),
            textures=j(np.asarray(textures, np.float32)),
            bbox_min=j(np.asarray(bbox_min, np.float32)),
            bbox_max=j(np.asarray(bbox_max, np.float32)),
        )


def merge_meshes(meshes):
    """Concatenate (vertices, triangles, mat_id) tuples into one soup.

    `meshes` is a list of dicts with keys: vertices [V,3], triangles [T,3],
    mat_id int, optional normals/uvs. Replaces the reference's
    Group-of-GeometryGroups (PathTracer.cpp:634-674) with host-side baking.
    """
    all_v, all_t, all_m, all_n, all_uv = [], [], [], [], []
    voff = 0
    for m in meshes:
        v = np.asarray(m["vertices"], np.float32)
        t = np.asarray(m["triangles"], np.int64)
        all_v.append(v)
        all_t.append(t + voff)
        all_m.append(np.full((t.shape[0],), m["mat_id"], np.int32))
        n = m.get("normals")
        uv = m.get("uvs")
        all_n.append(n if n is not None else None)
        all_uv.append(uv if uv is not None else None)
        voff += v.shape[0]
    vertices = np.concatenate(all_v, axis=0)
    triangles = np.concatenate(all_t, axis=0)
    mat_ids = np.concatenate(all_m, axis=0)
    normals = None
    if all(n is not None for n in all_n):
        normals = np.concatenate(all_n, axis=0)
    uvs = None
    if all(u is not None for u in all_uv):
        uvs = np.concatenate(all_uv, axis=0)
    return vertices, triangles, mat_ids, normals, uvs


def transform_vertices(vertices, matrix):
    """Apply a 4x4 transform to [V,3] vertices (host-side bake)."""
    v = np.asarray(vertices, np.float32)
    m = np.asarray(matrix, np.float32)
    vh = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    out = vh @ m.T
    return out[:, :3] / out[:, 3:4]
