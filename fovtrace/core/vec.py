"""Structure-of-arrays 3-vectors: the TPU-native wavefront layout.

Why this exists: a `f32[N,3]` array on TPU is tiled T(8,128) — the
width-3 minor axis pads to 128 lanes, a 42.7x expansion in BOTH memory
and VPU work. The round-2 benchmark OOM'd exactly on such `[N,3]` jvp
residuals (153MB each for a 3.6MB logical array). Storing each component
as its own dense `[N]` (or `[H,W]`) array removes the padding entirely:
elementwise math runs at full lane utilization and backward-pass
residuals shrink 42x.

`Vec3` is a NamedTuple (hence a JAX pytree) of three same-shaped arrays.
It is used for wavefront ray state (origins, directions, throughput,
radiance — components shaped [N]) AND for planar images (position,
normal, albedo buffers — components shaped [H,W]).

This is the TPU counterpart of the reference's float3/float4 device math
(`REF/cuda/device_include/shared_helper_math.h`, `helpers.h:96-121` ONB);
CUDA's float3 is register-resident so AoS is free there — on TPU the
vector unit is 8x128 lanes, so SoA is the only dense layout.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Scalar = Union[float, int, jnp.ndarray]


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (Vec3 op Vec3 is componentwise; Vec3 op array/scalar
    #    broadcasts the operand over all three components) --------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return Vec3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    @property
    def shape(self):
        return jnp.shape(self.x)

    @property
    def dtype(self):
        return jnp.result_type(self.x)

    def astype(self, dt):
        return Vec3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))

    def reshape(self, *shape):
        return Vec3(self.x.reshape(*shape), self.y.reshape(*shape),
                    self.z.reshape(*shape))

    def map(self, fn):
        return Vec3(fn(self.x), fn(self.y), fn(self.z))

    def gather(self, idx):
        """Component-wise take — three dense 1-D gathers instead of one
        padded [N,3] row gather."""
        return Vec3(self.x[idx], self.y[idx], self.z[idx])


# ------------------------------------------------------------ constructors
def vec3(x, y, z) -> Vec3:
    x, y, z = jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)
    shp = jnp.broadcast_shapes(x.shape, y.shape, z.shape)
    b = lambda a: jnp.broadcast_to(a.astype(jnp.float32), shp)
    return Vec3(b(x), b(y), b(z))


def of(v) -> Vec3:
    """Length-3 constant (e.g. camera eye, light corner) -> Vec3 of
    scalars; broadcasts against [N]-component Vec3s in arithmetic."""
    v = jnp.asarray(v)
    return Vec3(v[..., 0], v[..., 1], v[..., 2])


def splat(v, shape=()) -> Vec3:
    """Broadcast a length-3 constant (e.g. camera eye, light normal) to a
    Vec3 of `shape`-shaped components."""
    v = jnp.asarray(v)
    b = lambda c: jnp.broadcast_to(c, shape)
    return Vec3(b(v[..., 0]), b(v[..., 1]), b(v[..., 2]))


def from_rows(a: jnp.ndarray) -> Vec3:
    """[..., 3] row array -> Vec3 (one strided read per component; pay it
    once at an API boundary, never inside a loop)."""
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


def to_rows(v: Vec3) -> jnp.ndarray:
    """Vec3 -> [..., 3] (materializes a padded array on TPU — boundary
    use only)."""
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def zeros(shape=()) -> Vec3:
    z = jnp.zeros(shape, jnp.float32)
    return Vec3(z, z, z)


def full(shape, value) -> Vec3:
    f = jnp.full(shape, value, jnp.float32)
    return Vec3(f, f, f)


# ------------------------------------------------------------------ algebra
def dot(a: Vec3, b: Vec3) -> jnp.ndarray:
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(v: Vec3, eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(dot(v, v) + eps)


def norm(v: Vec3, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), eps))


def normalize(v: Vec3, eps: float = 1e-20) -> Vec3:
    inv = 1.0 / norm(v, eps)
    return v * inv


def where(m: jnp.ndarray, a, b) -> Vec3:
    """Componentwise select; `a`/`b` may be Vec3 or broadcastable scalars."""
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, Vec3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, Vec3) else (b, b, b)
    return Vec3(jnp.where(m, ax, bx), jnp.where(m, ay, by),
                jnp.where(m, az, bz))


def maximum(a: Vec3, b) -> Vec3:
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, Vec3) else (b, b, b)
    return Vec3(jnp.maximum(a.x, bx), jnp.maximum(a.y, by),
                jnp.maximum(a.z, bz))


def abs_(v: Vec3) -> Vec3:
    return Vec3(jnp.abs(v.x), jnp.abs(v.y), jnp.abs(v.z))


def exp(v: Vec3) -> Vec3:
    return Vec3(jnp.exp(v.x), jnp.exp(v.y), jnp.exp(v.z))


def sum3(v: Vec3) -> jnp.ndarray:
    return v.x + v.y + v.z


def max3(v: Vec3) -> jnp.ndarray:
    return jnp.maximum(jnp.maximum(v.x, v.y), v.z)


def mean_reduce(v: Vec3) -> jnp.ndarray:
    """Scalar mean over all components and elements."""
    return (jnp.mean(v.x) + jnp.mean(v.y) + jnp.mean(v.z)) / 3.0


# ------------------------------------------------------------- shading math
def reflect(i: Vec3, n: Vec3) -> Vec3:
    """GLSL-convention mirror (mathx.reflect SoA twin)."""
    return i - n * (2.0 * dot(i, n))


def faceforward(n: Vec3, i: Vec3, nref: Vec3) -> Vec3:
    return where(dot(nref, i) < 0.0, -n, n)


def refract(i: Vec3, n: Vec3, eta_ratio: jnp.ndarray):
    """Snell refraction (mathx.refract SoA twin).

    Returns (t Vec3, tir mask). TIR lanes get a zero direction; the sqrt
    argument is clamped on those lanes so the backward pass stays
    NaN-free (0 * inf = NaN otherwise)."""
    cosi = dot(i, n)
    entering = cosi < 0.0
    nn = where(entering, n, -n)
    eta = jnp.where(entering, 1.0 / eta_ratio, eta_ratio)
    ci = jnp.abs(cosi)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = k <= 0.0
    k_safe = jnp.where(tir, 1.0, k)
    t = i * eta + nn * (eta * ci - jnp.sqrt(k_safe))
    return where(tir, zeros(t.shape), normalize(t)), tir


def schlick_rgb(cos_theta: jnp.ndarray, reflectivity_n: Vec3) -> Vec3:
    """RGB Schlick (shared_helper_math.h): r = n + (1-n)(1-cos)^5."""
    c = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    c5 = c * c
    c5 = c5 * c5 * c
    return reflectivity_n + (1.0 - reflectivity_n) * c5


def onb(n: Vec3):
    """Branchless Frisvad ONB (mathx.onb SoA twin) -> (t, b)."""
    s = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n.z)
    b = n.x * n.y * a
    t = Vec3(1.0 + s * n.x * n.x * a, s * b, -s * n.x)
    bt = Vec3(b, s + n.y * n.y * a, -n.y)
    return t, bt


def to_world(lx, ly, lz, n: Vec3) -> Vec3:
    """Local (+Z = n) direction components -> world."""
    t, b = onb(n)
    return t * lx + b * ly + n * lz


def cosine_sample_hemisphere(z1, z2):
    """Returns local-frame components (x, y, z) — combine with to_world."""
    r = jnp.sqrt(z1)
    phi = (2.0 * jnp.pi) * z2
    return r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(
        jnp.maximum(0.0, 1.0 - z1))


def luminance(v: Vec3) -> jnp.ndarray:
    return 0.30 * v.x + 0.59 * v.y + 0.11 * v.z


def matvec(m: jnp.ndarray, v: Vec3, w=None):
    """Apply a 4x4 (or 3x3) matrix to SoA points: returns Vec3 (+ w' if
    m is 4x4 and w given/implied 1). Pure scalar*array FMAs — no [N,4]
    temporaries."""
    ox = m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z
    oy = m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z
    oz = m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z
    if m.shape[0] == 3:
        return Vec3(ox, oy, oz)
    if w is None:
        w = 1.0
    ox = ox + m[0, 3] * w
    oy = oy + m[1, 3] * w
    oz = oz + m[2, 3] * w
    ow = m[3, 0] * v.x + m[3, 1] * v.y + m[3, 2] * v.z + m[3, 3] * w
    return Vec3(ox, oy, oz), ow
