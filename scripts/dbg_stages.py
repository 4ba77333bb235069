import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys, jax, jax.numpy as jnp, numpy as np
from fovtrace import Camera, RenderConfig
from fovtrace.render import pipeline, gbuffer as gb_mod, shade as shade_mod
from fovtrace.core import rng, reproject, vec
from fovtrace.scene import procedural

def block(o):
    for l in jax.tree.leaves(o):
        if hasattr(l, 'block_until_ready'): l.block_until_ready()
    return o

def timeit(fn, *a, iters=5, name=''):
    block(fn(*a))
    block(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters): o = fn(*a)
    block(o)
    ms = (time.perf_counter()-t0)/iters*1e3
    print(f'{name:28s} {ms:9.2f} ms', flush=True)
    return o, ms

config = RenderConfig(width=1920, height=1088, reconstruction='atrous',
                      max_depth=4, diffuse_max_depth=1, ray_budget_frac=0.30,
                      full_outputs=False)
scene = procedural.SCENES['earth']()
cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
state = pipeline.FrameState.initial(cam, config)
gaze = (jnp.asarray(544), jnp.asarray(960))

fwd = jax.jit(lambda s, c, g, st: pipeline.render_frame(s, c, g, st, config))
out, state1 = fwd(scene, cam, gaze, state); block((out, state1))
out, state2 = fwd(scene, cam, gaze, state1); block((out, state2))
_, ms_fwd = timeit(fwd, scene, cam, gaze, state2, name='full_fwd')

f_gb = jax.jit(lambda s, c, pc: pipeline.stage_gbuffer(s, c, pc, config))
gbuf, _ = timeit(f_gb, scene, cam, state2.prev_camera, name='gbuffer')

f_samp = jax.jit(lambda s, gb, g, st: pipeline.stage_sampling(s, gb, g, st, config))
samp, _ = timeit(f_samp, scene, gbuf, gaze, state2, name='sampling')
mask, sal, is_valid, fetched, gaze_target, ray_count = samp

f_cmp = jax.jit(lambda m: pipeline.stage_compact(m, config))
(idx, active, rank, gate), _ = timeit(f_cmp, mask, name='compact')

f_shade = jax.jit(lambda s, c, i, a, fe, v, st, gt, rk, ga:
    pipeline.stage_shade(s, c, i, a, fe, v, st, config, gaze_target=gt,
                         rank=rk, gate=ga))
sh, _ = timeit(f_shade, scene, cam, idx, active, fetched, is_valid, state2,
               gaze_target, rank, gate, name='shade_stage(+temporal)')
(sh_rgb, sh_a), hist, traced, rays = sh

f_rec = jax.jit(lambda r, a, gb: pipeline.stage_reconstruct(r, a, gb, config))
timeit(f_rec, sh_rgb, sh_a, gbuf, name='reconstruct')


n = idx.shape[0]
py = (idx // 1920).astype(jnp.float32); px = (idx % 1920).astype(jnp.float32)
seeds = rng.pixel_seed(idx, state2.frame)
ndc_x = (px + 0.5)/1920*2-1; ndc_y = (py + 0.5)/1088*2-1
_, dirs = cam.unproject_v(ndc_x, ndc_y, 1920/1088)
origins = vec.splat(cam.eye, dirs.shape)
block((dirs, seeds))
f_sh = jax.jit(lambda s, o, d, sd: shade_mod.shade_v(s, o, d, sd, config))
timeit(f_sh, scene, origins, dirs, seeds, name='shade_v(612k tile-order)')

# shade innards at the first-bounce width
from fovtrace.kernels import intersect as isect
f_i = jax.jit(lambda o, d: isect.intersect_v(scene, o, d, config.scene_epsilon, isect.BIG_T))
hit, _ = timeit(f_i, origins, dirs, name='shade isect 612k')
f_s = jax.jit(lambda o, d, ht: isect.hit_surface_v(scene, o, d, ht))
surf, _ = timeit(f_s, origins, dirs, hit, name='hit_surface 612k')
f_o = jax.jit(lambda p, l, tm: isect.occlusion_v(scene, p, l, config.scene_epsilon, tm))
from fovtrace.core import vec as vecm
lp = vecm.of(scene.light.corner + 0.5*scene.light.v1 + 0.5*scene.light.v2)
to_l = lp - surf['point']
ld = vecm.length(to_l)
ldir = to_l * (1.0/jnp.maximum(ld, 1e-20))
timeit(f_o, surf['point'] + surf['gnormal']*1e-3, ldir, ld-1e-3, name='shade occlusion 612k')
f_env = jax.jit(lambda d: shade_mod.envmap_lookup_v(scene.envmap, d))
timeit(f_env, dirs, name='envmap 612k')
f_mat = jax.jit(lambda m: isect.material_lookup_v(scene.materials, m,
    [('kind',1),('ks',3),('phong_exp',1),('reflectivity_n',3),('ior',1),
     ('extinction',3),('refraction_color',3),('reflection_color',3),
     ('fresnel_exponent',1),('fresnel_minimum',1),('fresnel_maximum',1)]))
timeit(f_mat, jnp.maximum(surf['mat_id'], 0), name='material_lookup x11 612k')

# gbuffer innards at full res
rov, rdv = cam.primary_rays_v(1920, 1088)
from fovtrace.render.gbuffer import swizzle_to_tiles
ro_f = rov.map(lambda a: swizzle_to_tiles(a.reshape(-1), 1088, 1920))
rd_f = rdv.map(lambda a: swizzle_to_tiles(a.reshape(-1), 1088, 1920))
hitg, _ = timeit(f_i, ro_f, rd_f, name='gb isect 2.1M (swizzled)')
surfg, _ = timeit(f_s, ro_f, rd_f, hitg, name='gb hit_surface 2.1M')
print('rays_traced/frame', int(out['rays_traced']), flush=True)
