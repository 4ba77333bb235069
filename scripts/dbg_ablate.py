import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from fovtrace import Camera, RenderConfig
from fovtrace.render import pipeline
from fovtrace.scene import procedural

def block(o):
    for l in jax.tree.leaves(o):
        if hasattr(l, 'block_until_ready'): l.block_until_ready()

def run(tag, **over):
    kw = dict(width=1920, height=1088, reconstruction='atrous',
              max_depth=4, diffuse_max_depth=1,
              ray_budget_frac=0.30, full_outputs=False)
    kw.update(over)
    config = RenderConfig(**kw)
    scene = procedural.SCENES['earth']()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    state = pipeline.FrameState.initial(cam, config)
    gaze = (jnp.asarray(544), jnp.asarray(960))
    fwd = jax.jit(lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config))
    out, st = fwd(scene, cam, gaze, state); block((out, st))
    out, st2 = fwd(scene, cam, gaze, st); block((out, st2))
    t0 = time.perf_counter()
    for _ in range(5): out, _ = fwd(scene, cam, gaze, st2)
    block(out)
    ms = (time.perf_counter()-t0)/5*1e3
    print(f'{tag:32s} {ms:9.2f} ms', flush=True)

run('baseline (atrous, d4, temporal)')
run('recon=none', reconstruction='none')
run('max_depth=1', max_depth=1)
run('max_depth=2', max_depth=2)
run('temporal=off', temporal=False)
run('budget 15%', ray_budget_frac=0.15)
run('remat_shade', remat_shade=True)
