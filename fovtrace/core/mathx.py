"""Vector math for shading: ONB, Fresnel, sampling, refraction.

TPU-native counterpart of the reference's header-only device math library
(`REF/cuda/device_include/helpers.h` — ONB construction :96-121, phong lobe
sampling :45-93; `shared_helper_math.h` — Schlick fresnel :9-37). Everything
operates on trailing-axis-3 float arrays and is fully batched/vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_inv_pos(x):
    """1/x where x > 0, else 0 — NaN-free in the BACKWARD pass too.

    The naive `where(x > 0, 1/maximum(x, eps), 0)` still NaNs under
    `grad` when x == 0: the untaken branch's derivative -1/eps^2
    overflows to inf and the where-transpose multiplies it by a zero
    cotangent (0 * inf = NaN). The double-where trick evaluates the
    derivative at a SAFE denominator instead."""
    pos = x > 0.0
    safe = jnp.where(pos, x, 1.0)
    return jnp.where(pos, 1.0 / safe, 0.0)


def dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def norm(v, eps: float = 1e-20):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def normalize(v, eps: float = 1e-20):
    return v / norm(v, eps)


def length(v, eps: float = 0.0):
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """Mirror direction of incident `i` about normal `n` (GLSL convention)."""
    return i - 2.0 * dot(i, n) * n


def faceforward(n, i, nref):
    """Flip `n` to face against incident direction: matches optix::faceforward
    usage `faceforward(shading_normal, -ray.direction, geometric_normal)`."""
    return jnp.where(dot(nref, i) < 0.0, -n, n)


def refract(i, n, eta_ratio):
    """Snell refraction of direction `i` at normal `n`.

    `eta_ratio` is the relative index of refraction (n2/n1 when entering,
    matching optix::refract(t, i, n, ior) semantics where the function
    internally handles entering/exiting by the sign of dot(i, n)).

    Returns (t, total_internal_reflection_mask). The refracted direction is
    zero where TIR occurs.
    """
    cosi = dot(i, n)
    entering = cosi < 0.0
    # flip so that we always refract against the facing normal
    nn = jnp.where(entering, n, -n)
    eta = jnp.where(entering, 1.0 / eta_ratio, eta_ratio)
    ci = jnp.abs(cosi)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = k <= 0.0
    # sqrt'(0) = inf: substitute k=1 on TIR lanes BEFORE sqrt so the masked
    # branch stays NaN-free in the backward pass (0 * inf = NaN otherwise).
    k_safe = jnp.where(tir, 1.0, k)
    t = eta * i + (eta * ci - jnp.sqrt(k_safe)) * nn
    return jnp.where(tir, 0.0, normalize(t)), tir[..., 0]


def schlick_rgb(cos_theta, reflectivity_n):
    """RGB Schlick approximation, `shared_helper_math.h` `schlick(t, n)`:
    r = n + (1 - n) * (1 - cos)^5."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return reflectivity_n + (1.0 - reflectivity_n) * (c**5)


def fresnel_schlick(cos_theta, exponent, minimum, maximum):
    """Scalar fresnel_schlick(cos, exp, min, max) as used by refraction.cu:
    min + (max - min) * (1 - cos)^exponent."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    return jnp.clip(minimum + (maximum - minimum) * (c**exponent), 0.0, 1.0)


def onb(n):
    """Orthonormal basis around normal `n` -> (tangent, bitangent).

    Branchless Frisvad-style construction (replaces helpers.h:96-121's
    if-chain, which is hostile to vector lanes)."""
    s = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t = jnp.concatenate(
        [1.0 + s * n[..., 0:1] ** 2 * a, s * b, -s * n[..., 0:1]], axis=-1
    )
    bt = jnp.concatenate([b, s + n[..., 1:2] ** 2 * a, -n[..., 1:2]], axis=-1)
    return t, bt


def cosine_sample_hemisphere(z1, z2):
    """optix::cosine_sample_hemisphere — local +Z hemisphere cosine sample."""
    r = jnp.sqrt(z1)
    phi = 2.0 * jnp.pi * z2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - z1))
    return jnp.stack([x, y, z], axis=-1)


def to_world(local_dir, n):
    """Transform a local (+Z = normal) direction into world space around n."""
    t, b = onb(n)
    return (
        local_dir[..., 0:1] * t + local_dir[..., 1:2] * b + local_dir[..., 2:3] * n
    )


def luminance(rgb):
    """optix::luminance — Rec.601-ish weights used for importance cutoffs."""
    w = jnp.asarray([0.30, 0.59, 0.11], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


# --- quaternions (REF/Camera.cpp:48-71 rotate/rotateAround use glm::quat)
def quat_from_axis_angle(axis, angle):
    """Unit quaternion [w,x,y,z] for a rotation of `angle` radians about
    `axis` (glm::angleAxis)."""
    axis = normalize(jnp.asarray(axis, jnp.float32))
    half = jnp.asarray(angle, jnp.float32) * 0.5
    return jnp.concatenate([jnp.sin(half) * axis, jnp.cos(half)[None]])[
        jnp.asarray([3, 0, 1, 2])]


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_rotate(q, v):
    """Rotate vector(s) v [..., 3] by unit quaternion q [w,x,y,z]."""
    qv = q[1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[0] * t + jnp.cross(qv, t)
