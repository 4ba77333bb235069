"""The author-falloff sampling mode (samplingStep.cu:145-147, exposed
round 5 — VERDICT r04 weak #8) renders end-to-end and samples densest
at the gaze."""
import jax.numpy as jnp
import numpy as np

from fovtrace import Camera, RenderConfig
from fovtrace.render import pipeline


def test_author_mode_renders_and_focuses():
    from fovtrace.scene import procedural

    scene = procedural.SCENES["box"]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    config = RenderConfig(width=64, height=64, sampling_mode="author",
                          reconstruction="pullpush", max_depth=2,
                          full_outputs=True, use_pallas=False,
                          intersect_backend="brute")
    state = pipeline.FrameState.initial(cam, config)
    out, _ = pipeline.render_frame(scene, cam,
                                   (jnp.asarray(32), jnp.asarray(32)),
                                   state, config)
    mask = np.asarray(out["mask"])
    assert 0 < mask.sum() < mask.size
    # rational falloff: the 16x16 block under the gaze is denser than a
    # far corner block
    assert mask[24:40, 24:40].mean() > mask[0:16, 0:16].mean()
    assert np.isfinite(np.asarray(out["image"])).all()
