#!/usr/bin/env python
"""core_test-analog: differential test harness over the 18 test scenes.

Mirrors test/core_test.cpp's workflow: render each run level and compare
against the reference C engine's golden BMPs with the per-channel
threshold + isolated-pixel-forgiveness rule (core_test.cpp:96-145).
Additionally cross-checks the Pallas megakernel against the jnp tracer
(the "optimized vs brute-force" differential of the original, re-targeted
at kernel vs reference implementation).

  -b n / -e n   first/last run level (default 1..18)
  -x/-y         resolution (default 800x480 to match goldens)
  -i            save rendered/diff images to dump/
  -t n          diff threshold (default 3)
  -k            also run the pallas kernel and diff vs jnp
  -c            force CPU backend
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", type=int, default=1)
    ap.add_argument("-e", type=int, default=18)
    ap.add_argument("-x", type=int, default=800)
    ap.add_argument("-y", type=int, default=480)
    ap.add_argument("-i", action="store_true")
    ap.add_argument("-t", type=int, default=3)
    ap.add_argument("-k", action="store_true")
    ap.add_argument("-c", action="store_true")
    args = ap.parse_args()

    import jax
    if args.c:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from quadray_tpu.engine import Scene
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.utils.image import load_bmp, save_bmp, frame_cmp

    root = os.path.join(os.path.dirname(__file__), "..")
    os.makedirs("dump", exist_ok=True)
    failures = 0
    for lvl in range(args.b, args.e + 1):
        name = f"test{lvl:02d}"
        golden = os.path.join(root, "golden", f"ref_{name}.bmp")
        print(f"-------------------  RUN LEVEL = {lvl:2d}  "
              f"-------------------")
        sc = Scene(load_scene(name), args.x, args.y)
        t0 = time.time()
        frame = sc.render(0.0)
        dt = (time.time() - t0) * 1000.0
        print(f"Time F = {dt:.0f}")
        if os.path.exists(golden) and (args.x, args.y) == (800, 480):
            ref = load_bmp(golden)
            nbad, bad = frame_cmp(ref, frame, t_diff=args.t)
            status = "OK" if nbad == 0 else f"DIFF {nbad} px"
            print(f"vs reference golden: {status}")
            failures += nbad > 0
            if args.i:
                save_bmp(f"dump/scr{lvl:02d}.bmp", frame)
                d = (np.abs(ref.astype(int) - frame.astype(int))
                     .max(-1).astype(np.uint8))
                save_bmp(f"dump/dff{lvl:02d}.bmp", np.stack([d] * 3, -1))
        if args.k:
            from quadray_tpu.ops.pallas_kernel import trace_rays_pallas
            from quadray_tpu.ops.trace import TraceConfig, trace_rays
            from quadray_tpu.ops.rays import camera_rays
            import jax.numpy as jnp
            arr = sc.arrays
            org1, dirs = camera_rays(
                arr.cam_pos, arr.cam_hor, arr.cam_ver, arr.cam_nrm,
                arr.cam_pov, args.x, args.y, 1)
            n = dirs.shape[0]
            org = jnp.broadcast_to(org1[None, :], (n, 3))
            tmin = jnp.full((n,), arr.cam_pov)
            cfg = TraceConfig(stack=6)
            a = trace_rays(arr, org, dirs, tmin, cfg)
            b = trace_rays_pallas(arr, org, dirs, tmin, cfg)
            d = float(jnp.abs(a - b).max())
            print(f"pallas vs jnp maxdiff = {d:.2e}")
    print(f"\n{failures} scene(s) with differences")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
