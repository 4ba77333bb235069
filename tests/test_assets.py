"""OBJ+MTL+texture -> Scene -> image pipeline (VERDICT round-2 task #3).

Covers what the reference's sutil loadMesh + load_obj materials path does
(PathTracer.cpp:676-772): per-face MTL materials, map_Kd textures, and
the multi-model scene composition (:582-595).
"""

import json
import os

import numpy as np
import pytest

from fovtrace.scene import assets, image_io
from fovtrace.scene.scene import MATL_DIFFUSE, MATL_REFLECTION, MATL_REFRACTION


def write_textured_obj(tmp_path, name="quad"):
    """Two-material quad: left tri red-textured, right tri flat green."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[..., 0] = 1.0  # pure red texture
    image_io.save_ppm(str(tmp_path / "red.ppm"), tex)
    (tmp_path / f"{name}.mtl").write_text(
        "newmtl texmat\nKd 1 1 1\nmap_Kd red.ppm\n"
        "newmtl flat\nKd 0 1 0\n"
    )
    (tmp_path / f"{name}.obj").write_text(
        f"mtllib {name}.mtl\n"
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 1 0\nvn 0 1 0\nvn 0 1 0\nvn 0 1 0\n"
        "usemtl texmat\nf 1/1/1 2/2/2 3/3/3\n"
        "usemtl flat\nf 1/1/1 3/3/3 4/4/4\n"
    )
    return str(tmp_path / f"{name}.obj")


class TestSceneFromObj:
    def test_materials_and_textures_wired(self, tmp_path):
        path = write_textured_obj(tmp_path)
        sc = assets.scene_from_obj(path)
        mats = sc.materials
        assert mats.kind.shape[0] == 2
        assert int(mats.kind[0]) == MATL_DIFFUSE
        # texture 0 assigned to the first material, none to the second
        assert int(mats.texture_id[0]) == 0
        assert int(mats.texture_id[1]) == -1
        np.testing.assert_allclose(np.asarray(mats.kd[1]), [0, 1, 0])
        # atlas holds the red texture
        assert sc.textures.shape[0] >= 1
        np.testing.assert_allclose(np.asarray(sc.textures[0, 0, 0]), [1, 0, 0])
        # per-face materials survive BVH reorder: both ids present
        mat_ids = np.asarray(sc.mat_id)
        assert set(mat_ids[mat_ids >= 0].tolist()) == {0, 1}

    def test_render_textured(self, tmp_path):
        """Textured faces show the texture color in the albedo G-buffer."""
        from fovtrace import Camera, RenderConfig
        from fovtrace.render import gbuffer

        path = write_textured_obj(tmp_path)
        sc = assets.scene_from_obj(path)
        cam = Camera.create(eye=(0.0, 2.0, 0.01), target=(0.0, 0.0, 0.0))
        config = RenderConfig(width=32, height=32, reconstruction="none",
                              sampling_mode="full")
        gbuf = gbuffer.gbuffer_rows(
            gbuffer.trace_gbuffer(sc, cam, cam, 32, 32, config))
        albedo = np.asarray(gbuf["albedo"])
        hit = np.asarray(gbuf["hit_valid"])
        assert hit.sum() > 100  # quad fills most of the view
        # some pixels red-textured (r>>g), some flat green (g>>r)
        red = (albedo[..., 0] > 0.5) & (albedo[..., 1] < 0.1) & hit
        green = (albedo[..., 1] > 0.5) & (albedo[..., 0] < 0.1) & hit
        assert red.sum() > 10
        assert green.sum() > 10

    def test_missing_mtl_defaults(self, tmp_path):
        (tmp_path / "bare.obj").write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        sc = assets.scene_from_obj(str(tmp_path / "bare.obj"))
        assert int(sc.materials.kind[0]) == MATL_DIFFUSE
        np.testing.assert_allclose(np.asarray(sc.materials.kd[0]),
                                   [0.7, 0.7, 0.7])


REF_RESOURCES = "/root/reference/resource"


@pytest.mark.skipif(not os.path.isdir(REF_RESOURCES),
                    reason="reference assets not present")
class TestReferenceAssets:
    """Render from the reference's ACTUAL shipped assets (VERDICT r02
    missing #5): vokselia_spawn.png (PNG decode), bunny.PPM, grid.ppm,
    CedarCity.hdr."""

    def test_png_decodes_vokselia(self):
        from fovtrace.scene import image_io

        img = image_io.load_png(os.path.join(
            REF_RESOURCES, "vokselia_spawn", "vokselia_spawn.png"))
        assert img.shape == (2048, 2048, 3)
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert 0.3 < img.mean() < 0.7  # a real image, not garbage

    def test_reference_scene_renders(self):
        import jax.numpy as jnp

        from fovtrace import Camera, RenderConfig
        from fovtrace.render import pipeline

        sc = assets.reference_assets_scene(REF_RESOURCES,
                                           vokselia_extent=2)
        # all three real textures landed in the atlas
        assert sc.textures.shape[0] >= 3
        # envmap is the real CedarCity lat-long HDR
        assert sc.envmap.shape == (800, 1600, 3)
        assert float(sc.envmap.max()) > 2.0  # HDR range

        cam = Camera.create(eye=(4.0, 3.0, 5.0), target=(0.0, 0.6, 0.0))
        config = RenderConfig(width=64, height=64, reconstruction="atrous",
                              max_depth=3, ray_budget_frac=0.6)
        state = pipeline.FrameState.initial(cam, config)
        out, _ = pipeline.render_frame_jit(
            sc, cam, (jnp.asarray(32), jnp.asarray(32)), state, config)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        assert 0.05 < img.mean() < 0.95  # lit, not black/blown


class TestMultiModelSpec:
    def test_spec_json(self, tmp_path):
        path = write_textured_obj(tmp_path)
        (tmp_path / "ball.obj").write_text(
            "v 0 1 0\nv 1 1 0\nv 0 2 0\nf 1 2 3\n")
        spec = {
            "models": [
                {"path": "quad.obj", "material": "diffuse"},
                {"path": "ball.obj", "material": "refraction", "scale": 0.5,
                 "translate": [0, 1, 0]},
            ],
            "light_power": 500.0,
        }
        (tmp_path / "scene.json").write_text(json.dumps(spec))
        sc = assets.scene_from_spec(str(tmp_path / "scene.json"))
        kinds = np.asarray(sc.materials.kind)
        assert MATL_DIFFUSE in kinds and MATL_REFRACTION in kinds
        # refraction model's triangle got the refract material
        refr_rows = np.nonzero(kinds == MATL_REFRACTION)[0]
        mat_ids = np.asarray(sc.mat_id)
        assert any(m in refr_rows for m in mat_ids[mat_ids >= 0])
        np.testing.assert_allclose(float(sc.light.emission[0]), 500.0)

    def test_transform_baked(self, tmp_path):
        (tmp_path / "t.obj").write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        sc = assets.scene_from_objs([
            assets.ModelSpec(str(tmp_path / "t.obj"), "reflection",
                             scale=2.0, translate=(10.0, 0.0, 0.0)),
        ])
        # vertex (1,0,0) -> (12, 0, 0)
        assert float(sc.bbox_max[0]) == pytest.approx(12.0)
        assert float(sc.bbox_min[0]) == pytest.approx(10.0)


class TestCliObjPath:
    def test_cli_renders_obj(self, tmp_path):
        """Regression: round-1 CLI .obj path crashed on unpack
        (VERDICT Weak #3)."""
        from fovtrace.app import cli

        path = write_textured_obj(tmp_path)
        out = str(tmp_path / "frames")
        rc = cli.main([
            "--scene", path, "--width", "32", "--height", "32",
            "--frames", "2", "--reconstruction", "none",
            "--eye", "0", "2", "0.01", "--target", "0", "0", "0",
            "--out", out, "--format", "ppm",
        ])
        assert rc == 0
        files = os.listdir(out)
        assert any(f.endswith(".ppm") for f in files)
