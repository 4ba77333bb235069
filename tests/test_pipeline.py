import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fovtrace import RenderConfig, Camera
from fovtrace.render import pipeline
from fovtrace.scene import procedural


@pytest.fixture(scope="module")
def setup():
    config = RenderConfig(width=64, height=64, reconstruction="pullpush",
                          max_depth=2, ray_budget_frac=0.6)
    scene = procedural.box_scene()
    cam = Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(32), jnp.asarray(32))
    return config, scene, cam, state, gaze


class TestPipeline:
    def test_frame_outputs_finite(self, setup):
        config, scene, cam, state, gaze = setup
        out, _ = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        for k in ("image", "shading", "depth", "position", "saliency"):
            assert np.isfinite(np.asarray(out[k])).all(), k

    def test_deterministic(self, setup):
        config, scene, cam, state, gaze = setup
        o1, _ = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        o2, _ = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        np.testing.assert_array_equal(np.asarray(o1["image"]), np.asarray(o2["image"]))

    def test_ray_count_between_floor_and_full(self, setup):
        config, scene, cam, state, gaze = setup
        out, _ = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        rc = int(out["ray_count"])
        assert 0 < rc < config.n_pixels

    def test_full_mode_traces_everything(self, setup):
        config, scene, cam, state, gaze = setup
        cfg = config.replace(sampling_mode="full", ray_budget_frac=1.0)
        out, _ = pipeline.render_frame_jit(scene, cam, gaze, state, cfg)
        assert int(out["ray_count"]) == cfg.n_pixels
        # with full sampling there are no holes at all
        assert (np.asarray(out["shading"])[..., 3] > 0).all()

    def test_temporal_accumulation(self, setup):
        config, scene, cam, state, gaze = setup
        out1, st1 = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        out2, st2 = pipeline.render_frame_jit(scene, cam, gaze, st1, config)
        w1 = np.asarray(st1.history[3])   # [4,H,W]: plane 3 = #samples
        w2 = np.asarray(st2.history[3])
        assert w2.max() > w1.max()          # history grows where cache hits
        assert int(st2.frame) == 2

    def test_static_camera_history_valid(self, setup):
        config, scene, cam, state, gaze = setup
        _, st1 = pipeline.render_frame_jit(scene, cam, gaze, state, config)
        out2, _ = pipeline.render_frame_jit(scene, cam, gaze, st1, config)
        valid = np.asarray(out2["weight"][..., 2])
        hitm = np.asarray(out2["position"]).any(-1)
        # most surface pixels reproject onto themselves under a static camera
        assert valid[hitm].mean() > 0.9

    def test_gaze_moves_fovea(self, setup):
        config, scene, cam, state, gaze = setup
        g2 = (jnp.asarray(10), jnp.asarray(50))
        out, _ = pipeline.render_frame_jit(scene, cam, g2, state, config)
        mask = np.asarray(out["mask"])
        assert mask[10, 50]
        # density near gaze higher than far corner
        near = mask[5:15, 45:55].mean()
        far = mask[50:60, 5:15].mean()
        assert near > far

    def test_reconstruction_modes(self, setup):
        config, scene, cam, state, gaze = setup
        for mode in ("jfa", "sibson", "pullpush", "atrous", "none"):
            cfg = config.replace(reconstruction=mode,
                                 sibson_max_radius=4)
            out, _ = pipeline.render_frame_jit(scene, cam, gaze, state, cfg)
            assert np.isfinite(np.asarray(out["image"])).all(), mode

    def test_logpolar_sampling_mode(self, setup):
        config, scene, cam, state, gaze = setup
        cfg = config.replace(sampling_mode="logpolar")
        out, _ = pipeline.render_frame_jit(scene, cam, gaze, state, cfg)
        rc = int(out["ray_count"])
        assert 0 < rc < cfg.n_pixels
