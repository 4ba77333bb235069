"""Quality regression bound: foveated render vs full-sampling ground
truth (the in-repo analog of the reference's ../Compare offline check,
main.cpp:445-461). With a fixed gaze the per-pixel RNG matches ground
truth, so every sampled pixel accumulates identical samples — the fovea
must be ~bit-exact and the reconstructed periphery within a sane PSNR
bound. Guards against silent regressions in sampling masks, temporal
accumulation or reconstruction."""
import jax.numpy as jnp
import numpy as np

from fovtrace import Camera, RenderConfig
from fovtrace.render import pipeline


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else float(10.0 * np.log10(1.0 / mse))


def test_foveated_matches_gt_in_fovea():
    from fovtrace.scene import procedural

    h, w = 64, 64
    scene = procedural.SCENES["box"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    gaze = (jnp.asarray(h // 2), jnp.asarray(w // 2))
    base = dict(width=w, height=h, max_depth=2, ray_budget_frac=0.9,
                full_outputs=False, use_pallas=False,
                intersect_backend="brute")

    def run(config, n=3):
        st = pipeline.FrameState.initial(cam, config)
        out = None
        for _ in range(n):
            out, st = pipeline.render_frame(scene, cam, gaze, st, config)
        from fovtrace.core import vec
        return np.clip(np.asarray(vec.to_rows(out["image_rgb"])), 0, 1)

    gt = run(RenderConfig(**base, sampling_mode="full",
                          reconstruction="none"))
    fov = run(RenderConfig(**base, sampling_mode="masked",
                           reconstruction="pullpush"))

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = np.sqrt((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / np.hypot(w, h)
    fovea = d < 0.07
    assert _psnr(fov[fovea], gt[fovea]) > 45.0, "fovea must be ~lossless"
    assert _psnr(fov, gt) > 17.0, "full-frame PSNR regression"
    # (measured 19.1 at this config; periphery is 1/8-grid + pull-push at 64px)
