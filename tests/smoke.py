import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from fovtrace import RenderConfig, Camera
from fovtrace.scene import procedural
from fovtrace.render import pipeline

config = RenderConfig(width=128, height=128, reconstruction="all",
                      sibson_max_radius=6, max_depth=3)
scene = procedural.box_scene()
print("tris:", scene.num_triangles)
cam = Camera.create(eye=(3.0, 2.0, 4.0), target=(0.0, 0.5, 0.0))
state = pipeline.FrameState.initial(cam, config)
gaze = (jnp.asarray(64), jnp.asarray(64))

out, state = pipeline.render_frame_jit(scene, cam, gaze, state, config)
img = np.asarray(out["image"])
print("image", img.shape, "min", img.min(), "max", img.max(), "mean", img.mean())
print("ray_count", int(out["ray_count"]), "/", config.n_pixels)
print("nan?", np.isnan(img).any())
for k in ("jfa", "sibson", "pullpush", "atrous", "shading"):
    a = np.asarray(out[k])
    print(k, a.shape, float(np.nanmin(a)), float(np.nanmax(a)), "nan", bool(np.isnan(a).any()))

# second frame (temporal path)
out2, state = pipeline.render_frame_jit(scene, cam, gaze, state, config)
print("frame2 ok, hist max w:", float(np.asarray(state.history)[..., 3].max()))

from fovtrace.scene import image_io
image_io.save_ppm("/tmp/smoke.ppm", np.clip(np.asarray(out2["image"]), 0, 1))
print("saved /tmp/smoke.ppm")
