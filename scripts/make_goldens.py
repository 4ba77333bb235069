"""Generate golden renders + gradient fingerprints for the 5 BASELINE
configs (SURVEY.md §4 test plan). Run on CPU so CI (which forces CPU via
conftest) compares like for like:

    JAX_PLATFORMS=cpu python scripts/make_goldens.py

Writes tests/golden/<scene>.npz with: image (f16 [H,W,3]), grad
fingerprints (per-parameter-group L2 norms + means), and the config
fields that produced them.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# the 5 BASELINE configs (scene geometry per REF/PathTracer.cpp:582-595)
# + reconstruction/sampling variants (VERDICT r02 weak #7: jfa/sibson/
# logpolar outputs and OBJ-asset scenes were unguarded)
CASES = {
    "box": dict(scene="box"),
    "bunny": dict(scene="bunny"),
    "earth": dict(scene="earth"),
    "multi": dict(scene="multi"),
    "vokselia": dict(scene="vokselia"),
    "earth_jfa": dict(scene="earth", reconstruction="jfa"),
    "earth_sibson": dict(scene="earth", reconstruction="sibson",
                         sibson_max_radius=8),
    "earth_logpolar": dict(scene="earth", sampling_mode="logpolar"),
    "textured_obj": dict(scene="textured_obj"),
}
SIZE = 64


def _textured_obj_scene():
    """Committed OBJ+MTL+PPM asset scene (tests/data) so the full asset
    pipeline (per-face materials + map_Kd texture atlas) is golden-
    guarded."""
    from fovtrace.scene import assets

    data = os.path.join(os.path.dirname(GOLDEN_DIR), "data")
    return assets.scene_from_obj(os.path.join(data, "checker_quad.obj"))


def render_case(name, spec):
    from fovtrace import Camera, RenderConfig
    from fovtrace.render import pipeline
    from fovtrace.scene import procedural

    kw = dict(width=SIZE, height=SIZE, reconstruction="atrous",
              max_depth=3, diffuse_max_depth=1, ray_budget_frac=0.6)
    kw.update({k: v for k, v in spec.items() if k != "scene"})
    config = RenderConfig(**kw)
    scene = (_textured_obj_scene() if spec["scene"] == "textured_obj"
             else procedural.SCENES[spec["scene"]]())
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    gaze = (jnp.asarray(SIZE // 2), jnp.asarray(SIZE // 2))
    state = pipeline.FrameState.initial(cam, config)

    # two frames: the second exercises temporal reuse
    out, state = pipeline.render_frame_jit(scene, cam, gaze, state, config)
    out, state = pipeline.render_frame_jit(scene, cam, gaze, state, config)
    image = np.asarray(out["image"], np.float16)

    def loss_fn(emission, kd, eye):
        s2 = scene.replace(
            light=scene.light.replace(emission=emission),
            materials=scene.materials.replace(kd=kd))
        c2 = cam.replace(eye=eye)
        o, _ = pipeline.render_frame(
            s2, c2, gaze, pipeline.FrameState.initial(c2, config), config)
        return jnp.mean(o["image"])

    g_em, g_kd, g_eye = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))(
        scene.light.emission, scene.materials.kd, cam.eye)
    fp = np.asarray([
        float(jnp.linalg.norm(g_em)), float(jnp.mean(g_em)),
        float(jnp.linalg.norm(g_kd)), float(jnp.mean(g_kd)),
        float(jnp.linalg.norm(g_eye)), float(jnp.mean(g_eye)),
    ], np.float64)
    return image, fp, int(out["ray_count"])


def main():
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="*", default=None,
                   help="generate only these cases")
    p.add_argument("--missing-only", action="store_true",
                   help="skip cases whose golden already exists")
    args = p.parse_args()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, spec in CASES.items():
        if args.only and name not in args.only:
            continue
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        if args.missing_only and os.path.exists(path):
            print(f"[golden] {name}: exists, skipped")
            continue
        image, fp, rays = render_case(name, spec)
        np.savez_compressed(path, image=image, grad_fp=fp, ray_count=rays,
                            spec=json.dumps(spec))
        print(f"[golden] {name}: mean={image.mean():.4f} rays={rays} "
              f"grad_fp={np.round(fp, 6)} -> {path}")


if __name__ == "__main__":
    main()
