"""Unit tests for the SoA Vec3 layer (fovtrace.core.vec): every op must
match the row-based mathx reference bit-for-bit-ish (same formulas on
reassociated layouts -> allclose)."""

import jax
import jax.numpy as jnp
import numpy as np

from fovtrace.core import mathx, vec


def _rand(n=257, seed=0):
    r = np.random.default_rng(seed)
    return r.normal(size=(n, 3)).astype(np.float32)


class TestVecOps:
    def test_roundtrip(self):
        a = _rand()
        v = vec.from_rows(jnp.asarray(a))
        np.testing.assert_array_equal(np.asarray(vec.to_rows(v)), a)

    def test_arithmetic(self):
        a, b = _rand(seed=1), _rand(seed=2)
        va, vb = vec.from_rows(jnp.asarray(a)), vec.from_rows(jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(vec.to_rows(va + vb)), a + b)
        np.testing.assert_allclose(np.asarray(vec.to_rows(va - vb)), a - b)
        np.testing.assert_allclose(np.asarray(vec.to_rows(va * vb)), a * b)
        np.testing.assert_allclose(np.asarray(vec.to_rows(va * 2.0)), a * 2.0)
        np.testing.assert_allclose(np.asarray(vec.to_rows(1.0 - va)), 1.0 - a)
        np.testing.assert_allclose(np.asarray(vec.to_rows(-va)), -a)

    def test_dot_cross_normalize(self):
        a, b = _rand(seed=3), _rand(seed=4)
        va, vb = vec.from_rows(jnp.asarray(a)), vec.from_rows(jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(vec.dot(va, vb)),
                                   (a * b).sum(-1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vec.to_rows(vec.cross(va, vb))),
                                   np.cross(a, b), rtol=1e-5, atol=1e-6)
        got = np.asarray(vec.to_rows(vec.normalize(va)))
        want = np.asarray(mathx.normalize(jnp.asarray(a)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_reflect_faceforward(self):
        i, n = _rand(seed=5), _rand(seed=6)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        vi, vn = vec.from_rows(jnp.asarray(i)), vec.from_rows(jnp.asarray(n))
        np.testing.assert_allclose(
            np.asarray(vec.to_rows(vec.reflect(vi, vn))),
            np.asarray(mathx.reflect(jnp.asarray(i), jnp.asarray(n))),
            rtol=1e-5, atol=1e-6)
        got = vec.to_rows(vec.faceforward(vn, -vi, vn))
        want = mathx.faceforward(jnp.asarray(n), -jnp.asarray(i),
                                 jnp.asarray(n))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_refract_matches_mathx(self):
        i, n = _rand(seed=7), _rand(seed=8)
        i = i / np.linalg.norm(i, axis=-1, keepdims=True)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        ior = np.full((i.shape[0],), 1.4, np.float32)
        t_rows, tir_rows = mathx.refract(jnp.asarray(i), jnp.asarray(n),
                                         jnp.asarray(ior)[:, None])
        t_v, tir_v = vec.refract(vec.from_rows(jnp.asarray(i)),
                                 vec.from_rows(jnp.asarray(n)),
                                 jnp.asarray(ior))
        np.testing.assert_array_equal(np.asarray(tir_rows),
                                      np.asarray(tir_v))
        np.testing.assert_allclose(np.asarray(vec.to_rows(t_v)),
                                   np.asarray(t_rows), rtol=1e-5, atol=1e-6)

    def test_onb_to_world(self):
        n = _rand(seed=9)
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)
        local = _rand(seed=10)
        want = mathx.to_world(jnp.asarray(local), jnp.asarray(n))
        got = vec.to_world(jnp.asarray(local[:, 0]), jnp.asarray(local[:, 1]),
                           jnp.asarray(local[:, 2]),
                           vec.from_rows(jnp.asarray(n)))
        np.testing.assert_allclose(np.asarray(vec.to_rows(got)),
                                   np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_where_gather(self):
        a, b = _rand(seed=11), _rand(seed=12)
        m = np.random.default_rng(13).uniform(size=a.shape[0]) < 0.5
        va, vb = vec.from_rows(jnp.asarray(a)), vec.from_rows(jnp.asarray(b))
        got = vec.to_rows(vec.where(jnp.asarray(m), va, vb))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.where(m[:, None], a, b))
        idx = jnp.asarray([3, 1, 4, 1, 5])
        got = vec.to_rows(va.gather(idx))
        np.testing.assert_array_equal(np.asarray(got), a[[3, 1, 4, 1, 5]])

    def test_matvec_matches_einsum(self):
        m = np.random.default_rng(14).normal(size=(4, 4)).astype(np.float32)
        p = _rand(seed=15)
        ph = np.concatenate([p, np.ones((p.shape[0], 1), np.float32)], -1)
        want = ph @ m.T
        got, w = vec.matvec(jnp.asarray(m), vec.from_rows(jnp.asarray(p)))
        np.testing.assert_allclose(np.asarray(vec.to_rows(got)),
                                   want[:, :3], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w), want[:, 3], rtol=1e-5,
                                   atol=1e-6)

    def test_pytree(self):
        v = vec.from_rows(jnp.asarray(_rand()))
        leaves = jax.tree.leaves(v)
        assert len(leaves) == 3
        doubled = jax.tree.map(lambda x: x * 2, v)
        np.testing.assert_allclose(np.asarray(doubled.x), np.asarray(v.x) * 2)
