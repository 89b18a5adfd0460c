#!/usr/bin/env python
"""RooT-analog demo driver: offline/offscreen frame rendering with the
reference demo scenes, animators, fps logging and frame dumps.

The reference app (root/RooT.h) drives an X11 window with hotkeys; on a
TPU host the equivalent workflow is offscreen batch rendering (RooT's own
`-o` benchmark mode, RooT.h:74): render N frames of a demo scene with its
animators advancing a millisecond clock, log fps every interval, and
optionally save frames.

CLI mirrors the reference options where meaningful (RooT.h:637-1010):
  -d n   demo scene number 1..3 (default 1)       [-d]
  -x/-y  resolution (default 800x480)             [-x -y]
  -f n   number of frames to render (default 10)  [-f]
  -a n   antialiasing 1/2/4 (default 1)           [-a]
  -q     path-tracer mode                         [-q]
  -s n   samples per pixel accumulated in -q mode
  -i     save frames as BMP to dump/
  -r ms  fps log interval (default 500)           [-r]
  -h n   draw fps counter into frames             [-h]
  -p     force the pure-jnp path (no pallas)
  -c     force CPU backend
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# persistent compilation cache: scene-structure kernels compile once
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/quadray_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-d", type=int, default=1, help="demo scene 1..3")
    ap.add_argument("-x", type=int, default=800)
    ap.add_argument("-y", type=int, default=480)
    ap.add_argument("-f", type=int, default=10, help="frames")
    ap.add_argument("-a", type=int, default=1, choices=(1, 2, 4))
    ap.add_argument("-q", action="store_true", help="path tracer mode")
    ap.add_argument("-s", type=int, default=64, help="PT samples")
    ap.add_argument("-i", action="store_true", help="save BMP frames")
    ap.add_argument("-r", type=int, default=500, help="fps log ms")
    ap.add_argument("-hud", action="store_true", help="fps counter on frame")
    ap.add_argument("-p", action="store_true", help="force jnp path")
    ap.add_argument("-c", action="store_true", help="force CPU")
    args = ap.parse_args()

    import jax
    if args.c:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from quadray_tpu.engine import Platform, Scene
    from quadray_tpu.models.scenes import demos
    from quadray_tpu.utils.digits import draw_number

    sdef = demos.build(f"demo{args.d:02d}")
    pfm = Platform(fsaa=args.a, use_pallas=False if args.p else None)
    scene = Scene(sdef, args.x, args.y, pfm=pfm)

    os.makedirs("dump", exist_ok=True)
    t_wall0 = time.time()
    t_log = t_wall0
    frames_in_interval = 0
    total = 0

    for fi in range(args.f):
        sim_ms = fi * (1000.0 / 30.0)  # 30 fps animation clock
        frame = scene.render(sim_ms)
        total += 1
        frames_in_interval += 1
        now = time.time()
        if (now - t_log) * 1000.0 >= args.r:
            fps = frames_in_interval / (now - t_log)
            print(f"FPS = {fps:7.1f}")
            t_log = now
            frames_in_interval = 0
        if args.hud:
            fps_so_far = total / max(now - t_wall0, 1e-9)
            draw_number(frame, f"{fps_so_far:.1f}")
        if args.i:
            scene.frame = frame
            scene.save_frame(f"dump/demo{args.d:02d}_f{fi:04d}.bmp")

    dt = time.time() - t_wall0
    print(f"AVG FPS = {total / dt:7.2f}  ({args.x}x{args.y}, "
          f"{args.f} frames, {dt:.1f}s)")


if __name__ == "__main__":
    main()
