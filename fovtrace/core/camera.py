"""Differentiable camera.

TPU-native counterpart of `REF/Camera.{h,cpp}`: perspective projection
(`getPMat` Camera.cpp:153-181), lookAt (:73-83), world/screen transforms
(:204-213), and previous-frame state for temporal reprojection
(`setPrevState` :234-241, `getPrevMVP` :248).

The camera is a JAX pytree, so camera pose is a first-class differentiable
parameter (gradients flow through ray generation and reprojection).
Matrices are built functionally each frame — there is no mutable MVP cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fovtrace.core import mathx


PM_PERSPECTIVE = "perspective"
PM_ORTHO = "ortho"                # square extent, aspect-padded
PM_ORTHO_WIDTH = "ortho_width"    # m_value = world width
PM_ORTHO_HEIGHT = "ortho_height"  # m_value = world height


@struct.dataclass
class Camera:
    eye: jnp.ndarray        # [3]
    target: jnp.ndarray     # [3]
    up: jnp.ndarray         # [3]
    fov_y: jnp.ndarray      # scalar: degrees (perspective) or world
    #                         extent (ortho modes — REF Camera 'm_value')
    near: jnp.ndarray       # scalar
    far: jnp.ndarray        # scalar
    # projection mode (Camera.cpp:153-181); static so mvp() stays traceable
    mode: str = struct.field(pytree_node=False, default=PM_PERSPECTIVE)

    @classmethod
    def create(cls, eye, target, up=(0.0, 1.0, 0.0), fov_y=45.0, near=0.1,
               far=1000.0, mode=PM_PERSPECTIVE):
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(eye=f32(eye), target=f32(target), up=f32(up),
                   fov_y=f32(fov_y), near=f32(near), far=f32(far), mode=mode)

    # --- matrices -------------------------------------------------------
    def view_matrix(self) -> jnp.ndarray:
        """Right-handed lookAt (Camera.cpp:73-83 / glm::lookAt)."""
        f = mathx.normalize(self.target - self.eye)
        s = mathx.normalize(jnp.cross(f, mathx.normalize(self.up)))
        u = jnp.cross(s, f)
        rot = jnp.stack([s, u, -f], axis=0)           # [3,3]
        trans = -rot @ self.eye
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(rot).at[:3, 3].set(trans)
        return m

    def proj_matrix(self, aspect) -> jnp.ndarray:
        """Projection matrix: perspective (glm::perspective) or one of the
        reference's 3 ortho modes (`getPMat` Camera.cpp:153-181:
        Ortho_Height = value is world height, Ortho_Width = world width,
        Ortho = square extent padded along the larger aspect axis)."""
        n, fr = self.near, self.far
        if self.mode != PM_PERSPECTIVE:
            v = self.fov_y * 0.5
            if self.mode == PM_ORTHO_HEIGHT:
                y = v
                x = y * aspect
            elif self.mode == PM_ORTHO_WIDTH:
                x = v
                y = x / aspect
            else:  # PM_ORTHO
                x = jnp.where(aspect > 1.0, v * aspect, v)
                y = jnp.where(aspect > 1.0, v, v / aspect)
            m = jnp.zeros((4, 4), dtype=jnp.float32)
            m = m.at[0, 0].set(1.0 / x)
            m = m.at[1, 1].set(1.0 / y)
            m = m.at[2, 2].set(-2.0 / (fr - n))
            m = m.at[2, 3].set(-(fr + n) / (fr - n))
            m = m.at[3, 3].set(1.0)
            return m
        fov_rad = self.fov_y * (jnp.pi / 180.0)
        f = 1.0 / jnp.tan(fov_rad / 2.0)
        m = jnp.zeros((4, 4), dtype=jnp.float32)
        m = m.at[0, 0].set(f / aspect)
        m = m.at[1, 1].set(f)
        m = m.at[2, 2].set((fr + n) / (n - fr))
        m = m.at[2, 3].set(2.0 * fr * n / (n - fr))
        m = m.at[3, 2].set(-1.0)
        return m

    def mvp(self, aspect) -> jnp.ndarray:
        return self.proj_matrix(aspect) @ self.view_matrix()

    def inv_mvp(self, aspect) -> jnp.ndarray:
        return jnp.linalg.inv(self.mvp(aspect))

    # --- ray generation -------------------------------------------------
    def primary_rays(self, width: int, height: int, jitter=None, aspect=None):
        """Full-resolution primary rays via inverse-MVP unprojection.

        Matches `g_buffer_trace` (g_buffer_trace_camera.cu:95-100): pixel ->
        NDC in [-1,1], unproject (d, -1) to a near-plane point, ray from eye
        through it. `jitter` is an optional [H,W,2] sub-pixel offset in
        pixel units (fov_path_trace_camera.cu:129-133).

        Returns (origins [H,W,3], directions [H,W,3]).
        """
        if aspect is None:
            aspect = float(width) / float(height)
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.0)
        ys = (jnp.arange(height, dtype=jnp.float32) + 0.0)
        px, py = jnp.meshgrid(xs, ys, indexing="xy")    # [H,W]
        if jitter is not None:
            px = px + jitter[..., 0]
            py = py + jitter[..., 1]
        ndc_x = px / width * 2.0 - 1.0
        ndc_y = py / height * 2.0 - 1.0
        d = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, -1.0),
                       jnp.ones_like(ndc_x)], axis=-1)  # [H,W,4]
        inv = self.inv_mvp(aspect)
        world = jnp.einsum("ij,hwj->hwi", inv, d)
        near_pos = world[..., :3] / world[..., 3:4]
        if self.mode != PM_PERSPECTIVE:
            # ortho: parallel rays from the near plane toward the far plane
            dfar = d.at[..., 2].set(1.0)
            wfar = jnp.einsum("ij,hwj->hwi", inv, dfar)
            far_pos = wfar[..., :3] / wfar[..., 3:4]
            return near_pos, mathx.normalize(far_pos - near_pos)
        dirs = mathx.normalize(near_pos - self.eye)
        origins = jnp.broadcast_to(self.eye, dirs.shape)
        return origins, dirs

    # --- interactive-control counterparts (Camera.cpp:43-71) -------------
    def translate(self, delta) -> "Camera":
        d = jnp.asarray(delta, jnp.float32)
        return self.replace(eye=self.eye + d, target=self.target + d)

    def rotate(self, angle, axis) -> "Camera":
        """Rotate the view direction about the eye (Camera.cpp:48-58)."""
        q = mathx.quat_from_axis_angle(axis, angle)
        return self.replace(
            target=mathx.quat_rotate(q, self.target - self.eye) + self.eye,
            up=mathx.quat_rotate(q, self.up),
        )

    def rotate_around(self, center, angle, axis) -> "Camera":
        """Orbit the eye about `center` (Camera.cpp:60-71)."""
        c = jnp.asarray(center, jnp.float32)
        q = mathx.quat_from_axis_angle(axis, angle)
        return self.replace(
            eye=mathx.quat_rotate(q, self.eye - c) + c,
            up=mathx.quat_rotate(q, self.up),
        )

    # --- thin-lens depth of field ----------------------------------------
    def basis(self):
        """(view, right, up_ortho) camera frame (createPinHoleCam,
        shared_helper_funcs.h:304-308)."""
        view = mathx.normalize(self.target - self.eye)
        right = mathx.normalize(jnp.cross(view, mathx.normalize(self.up)))
        up = mathx.normalize(jnp.cross(right, view))
        return view, right, up

    def thin_lens_perturb(self, dirs, focus_dist, lens_radius, u1, u2):
        """Turn pinhole rays (from the eye, directions `dirs` [N,3]) into
        thin-lens rays focused at `focus_dist` along the view axis
        (createPinHoleCam, shared_helper_funcs.h:302-338).

        Deviations from the reference's dead code (intended behavior,
        SURVEY.md §7 hard part 7): the lens point samples a DISC of
        radius `lens_radius` (r*sqrt(u2); the reference comments out the
        sqrt, leaving a ring), and the radius is its own parameter
        instead of aliasing the foveal `aperture`.

        u1, u2: [N] uniforms. Returns (origins [N,3], dirs [N,3]).
        """
        view, right, up = self.basis()
        # focal PLANE at distance f: eye + dir * (f / dot(dir, view))
        # (identical to the reference's unnormalized-offset scaling)
        denom = jnp.maximum(jnp.sum(dirs * view, axis=-1, keepdims=True),
                            1e-6)
        focus_pt = self.eye + dirs * (focus_dist / denom)
        ang = 2.0 * jnp.pi * u1
        rad = lens_radius * jnp.sqrt(u2)
        lens = (self.eye
                + right * (jnp.cos(ang) * rad)[:, None]
                + up * (jnp.sin(ang) * rad)[:, None])
        new_dirs = mathx.normalize(focus_pt - lens)
        return lens, new_dirs

    def primary_rays_block(self, width: int, height: int, y0, block_h: int,
                           aspect=None):
        """Primary rays for a horizontal row block [y0, y0+block_h) of the
        full W x H grid — the unit of screen-tile sharding (each device in
        the mesh traces its own block). y0 may be a traced value
        (jax.lax.axis_index * block_h under shard_map)."""
        if aspect is None:
            aspect = float(width) / float(height)
        xs = jnp.arange(width, dtype=jnp.float32)
        ys = jnp.arange(block_h, dtype=jnp.float32) + jnp.asarray(y0, jnp.float32)
        px, py = jnp.meshgrid(xs, ys, indexing="xy")
        ndc_x = px / width * 2.0 - 1.0
        ndc_y = py / height * 2.0 - 1.0
        d = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, -1.0),
                       jnp.ones_like(ndc_x)], axis=-1)
        inv = self.inv_mvp(aspect)
        world = jnp.einsum("ij,hwj->hwi", inv, d)
        near_pos = world[..., :3] / world[..., 3:4]
        dirs = mathx.normalize(near_pos - self.eye)
        origins = jnp.broadcast_to(self.eye, dirs.shape)
        return origins, dirs

    # --- SoA ray generation (round-3 dense layout; fovtrace.core.vec) ---
    def unproject_v(self, ndc_x, ndc_y, aspect):
        """NDC components ([N] or [H,W]) -> world ray directions as Vec3.

        Pure scalar-x-array FMAs through the inverse MVP — no lane-padded
        [...,4] homogeneous temporaries (the SoA twin of primary_rays'
        einsum)."""
        from fovtrace.core import vec as vecm

        inv = self.inv_mvp(aspect)
        # world = inv @ [ndc_x, ndc_y, -1, 1]
        col = lambda r: (inv[r, 0] * ndc_x + inv[r, 1] * ndc_y
                         - inv[r, 2] + inv[r, 3])
        w = col(3)
        near = vecm.Vec3(col(0), col(1), col(2)) * (1.0 / w)
        if self.mode != PM_PERSPECTIVE:
            colf = lambda r: (inv[r, 0] * ndc_x + inv[r, 1] * ndc_y
                              + inv[r, 2] + inv[r, 3])
            wf = colf(3)
            far = vecm.Vec3(colf(0), colf(1), colf(2)) * (1.0 / wf)
            return near, vecm.normalize(far - near)
        dirs = vecm.normalize(near - vecm.of(self.eye))
        return None, dirs

    def primary_rays_v(self, width: int, height: int, y0=0.0,
                       block_h: int = None, aspect=None):
        """SoA primary rays for rows [y0, y0+block_h) (full frame when
        block_h is None). Returns (origins Vec3 | None for pinhole,
        dirs Vec3) with [bh, W] components. y0 may be traced (sharded
        tiles)."""
        from fovtrace.core import vec as vecm

        if aspect is None:
            aspect = float(width) / float(height)
        bh = height if block_h is None else block_h
        xs = jnp.arange(width, dtype=jnp.float32)[None, :]
        ys = (jnp.arange(bh, dtype=jnp.float32)
              + jnp.asarray(y0, jnp.float32))[:, None]
        ndc_x = jnp.broadcast_to(xs / width * 2.0 - 1.0, (bh, width))
        ndc_y = jnp.broadcast_to(ys / height * 2.0 - 1.0, (bh, width))
        near, dirs = self.unproject_v(ndc_x, ndc_y, aspect)
        if near is None:
            near = vecm.splat(self.eye, (bh, width))
        return near, dirs

    def world_to_screen_v(self, p, width: int, height: int, aspect=None):
        """SoA reprojection: world Vec3 -> (u, v) pixel planes, matching
        `compute_reprojection` (shared_helper_funcs.h:179-188)."""
        from fovtrace.core import vec as vecm

        if aspect is None:
            aspect = float(width) / float(height)
        m = self.mvp(aspect)
        (cx, cy, _), cw = vecm.matvec(m, p)
        safe_w = jnp.where(jnp.abs(cw) < 1e-20, 1e-20, cw)
        u = (cx / safe_w * width + width) * 0.5
        v = (cy / safe_w * height + height) * 0.5
        return u, v

    def thin_lens_perturb_v(self, dirs, focus_dist, lens_radius, u1, u2):
        """SoA twin of thin_lens_perturb: Vec3 dirs in, (Vec3 origins,
        Vec3 dirs) out."""
        from fovtrace.core import vec as vecm

        view, right, up = self.basis()
        viewv, rightv, upv = vecm.of(view), vecm.of(right), vecm.of(up)
        eye = vecm.of(self.eye)
        denom = jnp.maximum(vecm.dot(dirs, viewv), 1e-6)
        focus_pt = eye + dirs * (focus_dist / denom)
        ang = 2.0 * jnp.pi * u1
        rad = lens_radius * jnp.sqrt(u2)
        lens = eye + rightv * (jnp.cos(ang) * rad) + upv * (jnp.sin(ang) * rad)
        new_dirs = vecm.normalize(focus_pt - lens)
        return lens, new_dirs

    # --- reprojection helpers ------------------------------------------
    def world_to_screen(self, p, width: int, height: int, aspect=None):
        """World position -> pixel uv, matching `compute_reprojection`
        (shared_helper_funcs.h:179-188): q_uv = (ndc*screen + screen)/2."""
        if aspect is None:
            aspect = float(width) / float(height)
        mvp = self.mvp(aspect)
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        cs = jnp.einsum("ij,...j->...i", mvp, ph)
        d = cs[..., :2] / jnp.where(jnp.abs(cs[..., 3:4]) < 1e-20, 1e-20, cs[..., 3:4])
        screen = jnp.asarray([width, height], dtype=jnp.float32)
        return (d * screen + screen) * 0.5
