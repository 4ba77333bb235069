"""Foveated-vs-ground-truth quality harness.

TPU analog of the reference's offline quality loop — `main.cpp:445-461`
dumps foveated frames to `../Compare/` for offline PSNR against full
renders, and `main.cpp:288-299` logs the ray-%% CSV. Here both renders
run in-process over a gaze trajectory and the report gives, per
(sampling mode x reconstruction):

  - full-frame PSNR and SSIM vs the full-sampling ground truth
  - PSNR inside gaze-centered annuli: fovea (r < aperture), mid
    (aperture..2*aperture), periphery (> 2*aperture) — foveated
    rendering promises a ~lossless fovea and gracefully degraded
    periphery
  - mean ray%% (traced rays / pixels, the reference's ray_count metric)

Usage: python scripts/quality_eval.py [--width 960 --height 544
       --frames 20 --warmup 8] [--quick]
Writes QUALITY.md and quality.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    if mse <= 1e-12:
        return 99.0
    return float(10.0 * np.log10(1.0 / mse))


def ssim(a, b, win=7, c1=0.01 ** 2, c2=0.03 ** 2):
    """Mean SSIM with a uniform window, channel-averaged."""
    from numpy.lib.stride_tricks import sliding_window_view

    def chan(x, y):
        xs = sliding_window_view(x, (win, win)).mean(axis=(-1, -2))
        ys = sliding_window_view(y, (win, win)).mean(axis=(-1, -2))
        x2 = sliding_window_view(x * x, (win, win)).mean(axis=(-1, -2))
        y2 = sliding_window_view(y * y, (win, win)).mean(axis=(-1, -2))
        xy = sliding_window_view(x * y, (win, win)).mean(axis=(-1, -2))
        vx = x2 - xs * xs
        vy = y2 - ys * ys
        cxy = xy - xs * ys
        num = (2 * xs * ys + c1) * (2 * cxy + c2)
        den = (xs * xs + ys * ys + c1) * (vx + vy + c2)
        return float(np.mean(num / den))

    return np.mean([chan(a[..., k], b[..., k]) for k in range(3)])


def annulus_masks(h, w, gaze, aperture):
    gy, gx = gaze
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = np.sqrt((xx - gx) ** 2 + (yy - gy) ** 2) / np.hypot(w, h)
    return (d < aperture, (d >= aperture) & (d < 2 * aperture),
            d >= 2 * aperture)


def region_psnr(a, b, m):
    if not m.any():
        return float("nan")
    return psnr(a[m], b[m])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=8,
                    help="temporal warm-up frames excluded from metrics")
    ap.add_argument("--scene", default="earth")
    ap.add_argument("--aperture", type=float, default=0.07)
    ap.add_argument("--quick", action="store_true",
                    help="masked x {pullpush, atrous} only")
    ap.add_argument("--gaze", default="fixed",
                    help="fixed (default) isolates SPATIAL foveation "
                         "error: per-pixel RNG seeds match GT's, so any "
                         "sampled pixel accumulates identical samples and "
                         "the fovea is ~bit-exact. A moving gaze (circle) "
                         "adds per-pixel sample-COUNT differences — pure "
                         "Monte-Carlo noise deltas unrelated to foveation.")
    args = ap.parse_args()

    from fovtrace import Camera, RenderConfig
    from fovtrace.app import trajectory
    from fovtrace.core import vec
    from fovtrace.render import pipeline
    from fovtrace.scene import procedural

    h, w = args.height, args.width
    scene = procedural.SCENES[args.scene]()
    cam = Camera.create(eye=(3.0, 2.5, 4.0), target=(0.0, 0.8, 0.0))
    gazes, _poses = trajectory.make(args.gaze, h, w, args.frames)

    base = dict(width=w, height=h, max_depth=4, diffuse_max_depth=1,
                aperture=args.aperture, ray_budget_frac=0.55,
                full_outputs=False)

    def run(config):
        state = pipeline.FrameState.initial(cam, config)
        frames, rayfracs = [], []
        for g in gazes:
            out, state = pipeline.render_frame_jit(
                scene, cam, (jnp.asarray(g[0]), jnp.asarray(g[1])), state,
                config)
            assert int(out["rays_dropped"]) == 0, \
                "budget truncated the mask — raise ray_budget_frac"
            frames.append(np.asarray(vec.to_rows(out["image_rgb"])))
            rayfracs.append(float(out["ray_count"]) / (h * w))
        return frames, rayfracs

    t0 = time.time()
    print(f"[quality] GT render (full sampling) {w}x{h} "
          f"x{args.frames} frames", file=sys.stderr, flush=True)
    # GT shades EVERY pixel: needs the full budget
    gt_frames, _ = run(RenderConfig(**{**base, "ray_budget_frac": 1.0},
                                    sampling_mode="full",
                                    reconstruction="none"))

    modes = ["masked"] if args.quick else ["masked", "weier", "logpolar"]
    recons = (["pullpush", "atrous"] if args.quick
              else ["jfa", "sibson", "pullpush", "atrous"])

    rows = []
    for mode in modes:
        for recon in recons:
            cfg = RenderConfig(**base, sampling_mode=mode,
                               reconstruction=recon)
            frames, rayfracs = run(cfg)
            ms = {"mode": mode, "recon": recon,
                  "ray_pct": 100.0 * float(np.mean(rayfracs))}
            ps, ss, pf, pm, pp = [], [], [], [], []
            for i in range(args.warmup, args.frames):
                a = np.clip(frames[i], 0.0, 1.0)
                b = np.clip(gt_frames[i], 0.0, 1.0)
                ps.append(psnr(a, b))
                ss.append(ssim(a, b))
                mf, mm, mp = annulus_masks(h, w, gazes[i], args.aperture)
                pf.append(region_psnr(a, b, mf))
                pm.append(region_psnr(a, b, mm))
                pp.append(region_psnr(a, b, mp))
            ms.update(psnr_full=float(np.mean(ps)),
                      ssim=float(np.mean(ss)),
                      psnr_fovea=float(np.mean(pf)),
                      psnr_mid=float(np.mean(pm)),
                      psnr_periphery=float(np.mean(pp)))
            rows.append(ms)
            print(f"[quality] {mode:8s} x {recon:9s} rays {ms['ray_pct']:.1f}% "
                  f"PSNR {ms['psnr_full']:.1f} SSIM {ms['ssim']:.3f} "
                  f"fovea {ms['psnr_fovea']:.1f} mid {ms['psnr_mid']:.1f} "
                  f"peri {ms['psnr_periphery']:.1f}",
                  file=sys.stderr, flush=True)

    md = ["# Quality vs ground truth", "",
          f"scene={args.scene} {w}x{h}, {args.frames} frames "
          f"({args.gaze} gaze, {args.warmup} temporal warm-up frames "
          "excluded), "
          f"aperture={args.aperture}. Ground truth: sampling_mode=full, "
          "no reconstruction, same temporal accumulation. PSNR in dB on "
          "tonemapped [0,1] frames; annuli centered on the per-frame gaze "
          "(fovea r<aperture, mid to 2x, periphery beyond) — the TPU "
          "analog of the reference's ../Compare BMP workflow "
          "(main.cpp:445-461) + ray-% CSV (main.cpp:288-299).", "",
          "| mode | recon | ray% | PSNR | SSIM | fovea | mid | periphery |",
          "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        md.append(f"| {r['mode']} | {r['recon']} | {r['ray_pct']:.1f} | "
                  f"{r['psnr_full']:.1f} | {r['ssim']:.3f} | "
                  f"{r['psnr_fovea']:.1f} | {r['psnr_mid']:.1f} | "
                  f"{r['psnr_periphery']:.1f} |")
    md.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUALITY.md"), "w") as f:
        f.write("\n".join(md))
    with open(os.path.join(root, "quality.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[quality] wrote QUALITY.md ({time.time()-t0:.0f}s)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
