import os
import numpy as np
import pytest

from fovtrace.scene import image_io, obj, procedural
from fovtrace.scene.scene import Scene, Materials, MATL_DIFFUSE, transform_vertices


class TestImageIO:
    def test_ppm_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).uniform(size=(17, 23, 3)).astype(np.float32)
        p = str(tmp_path / "x.ppm")
        image_io.save_ppm(p, img)
        back = image_io.load_ppm(p)
        np.testing.assert_allclose(back, img, atol=1 / 255.0)

    def test_ppm_p3(self, tmp_path):
        p = str(tmp_path / "x.ppm")
        with open(p, "w") as f:
            f.write("P3\n# comment\n2 1\n255\n255 0 0   0 255 0\n")
        img = image_io.load_ppm(p)
        np.testing.assert_allclose(img[0, 0], [1, 0, 0])
        np.testing.assert_allclose(img[0, 1], [0, 1, 0])

    def test_bmp_roundtrip(self, tmp_path):
        img = np.random.default_rng(1).uniform(size=(10, 14, 3)).astype(np.float32)
        p = str(tmp_path / "x.bmp")
        image_io.save_bmp(p, img)
        back = image_io.load_bmp(p)
        np.testing.assert_allclose(back, img, atol=1 / 255.0)

    def test_hdr_flat(self, tmp_path):
        # write a tiny flat (non-RLE) radiance file by hand
        w, h = 4, 2
        p = str(tmp_path / "x.hdr")
        rgbe = np.zeros((h, w, 4), np.uint8)
        rgbe[..., 0] = 128  # r mantissa
        rgbe[..., 3] = 129  # exponent -> scale 2^(129-136) = 1/128 -> r=1.0
        with open(p, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(b"-Y 2 +X 4\n")
            f.write(rgbe.tobytes())
        img = image_io.load_hdr(p)
        assert img.shape == (2, 4, 3)
        np.testing.assert_allclose(img[..., 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(img[..., 1], 0.0)


class TestObj:
    def test_load_simple(self, tmp_path):
        p = str(tmp_path / "m.obj")
        with open(p, "w") as f:
            f.write("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
f 2/2/1 4/1/1 3/3/1
""")
        v, t, n, uv, fm, mats = obj.load_obj(p)
        assert t.shape == (2, 3)
        assert v.shape[1] == 3
        assert n is not None and np.allclose(np.abs(n[:, 2]), 1)
        assert uv is not None

    def test_quad_triangulation(self, tmp_path):
        p = str(tmp_path / "q.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        v, t, n, uv, fm, mats = obj.load_obj(p)
        assert t.shape == (2, 3)

    def test_negative_indices(self, tmp_path):
        p = str(tmp_path / "n.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        v, t, *_ = obj.load_obj(p)
        assert t.shape == (1, 3)
        np.testing.assert_allclose(v[t[0, 1]], [1, 0, 0])

    def test_mtl(self, tmp_path):
        mp = tmp_path / "m.mtl"
        mp.write_text("newmtl red\nKd 1 0 0\nNs 10\n")
        p = tmp_path / "m.obj"
        p.write_text("mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\nf 1 2 3\n")
        v, t, n, uv, fm, mats = obj.load_obj(str(p))
        assert "red" in mats
        assert mats["red"]["kd"] == (1.0, 0.0, 0.0)
        assert fm[0] == 0


class TestSceneBuild:
    def test_padding_and_bbox(self):
        scene = procedural.box_scene()
        # BVH leaf order aligns to 16-tri blocks; the Pallas pack pads
        # further (to 128-tri clusters) internally.
        assert scene.num_triangles % 16 == 0
        assert (np.asarray(scene.mat_id) >= -1).all()
        assert (np.asarray(scene.bbox_max) >= np.asarray(scene.bbox_min)).all()

    def test_transform_vertices(self):
        v = np.array([[1.0, 0, 0]], np.float32)
        m = np.eye(4); m[0, 3] = 2.0; m[0, 0] = 3.0
        out = transform_vertices(v, m)
        np.testing.assert_allclose(out, [[5.0, 0, 0]])

    def test_auto_normals(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        t = np.array([[0, 1, 2]])
        mats = Materials.create([MATL_DIFFUSE], [[1, 1, 1]])
        scene = Scene.build(v, t, np.zeros(1, np.int32), mats)
        np.testing.assert_allclose(np.asarray(scene.n0[0]), [0, 0, 1], atol=1e-6)

    def test_all_baseline_scenes_build(self):
        for name, fn in procedural.SCENES.items():
            s = fn() if name != "vokselia" else fn(extent=2)
            assert s.num_triangles > 0
