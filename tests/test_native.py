"""Native C++ host runtime vs the pure-Python oracle (SURVEY.md §2.5:
the reference's host layer — Trbvh build, sutil OBJ loader — is native;
ours is too, with identical flat layouts)."""

import numpy as np
import pytest

from fovtrace import native
from fovtrace.scene import bvh as bvh_mod
from fovtrace.scene import obj as obj_mod

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_tris(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    v0 = (rng.normal(size=(n, 3)) * 5).astype(np.float32)
    e1 = (rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
    e2 = (rng.normal(size=(n, 3)) * 0.2).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    return v0, e1, e2, valid


def test_bvh_native_matches_python():
    v0, e1, e2, valid = _random_tris()
    fn = bvh_mod.build_bvh(v0, e1, e2, valid, use_native=True)
    fp = bvh_mod.build_bvh(v0, e1, e2, valid, use_native=False)
    np.testing.assert_array_equal(fn.order, fp.order)
    np.testing.assert_array_equal(fn.nodes_left, fp.nodes_left)
    np.testing.assert_array_equal(fn.nodes_right, fp.nodes_right)
    np.testing.assert_array_equal(fn.nodes_leaf, fp.nodes_leaf)
    np.testing.assert_allclose(fn.nodes_min, fp.nodes_min)
    np.testing.assert_allclose(fn.nodes_max, fp.nodes_max)
    assert fn.max_depth == fp.max_depth


def test_obj_native_matches_python(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 1 1\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/1/1\n"
    )
    out = native.load_obj_native(str(p))
    assert out is not None
    pos, tris, norm, uv = out
    pv, pt, pn, puv, _, _ = obj_mod._load_obj_py(str(p))
    np.testing.assert_allclose(pos, pv)
    np.testing.assert_array_equal(tris, pt)
    assert norm is not None and uv is not None
    np.testing.assert_allclose(norm, pn)


def test_obj_negative_indices_and_quads(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f -4 -3 -2 -1\n"   # quad with negative indices -> 2 tris
    )
    out = native.load_obj_native(str(p))
    assert out is not None
    pos, tris, _, _ = out
    assert tris.shape == (2, 3)
    pv, pt, _, _, _, _ = obj_mod._load_obj_py(str(p))
    np.testing.assert_array_equal(tris, pt)
