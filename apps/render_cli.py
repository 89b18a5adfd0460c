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
  -k s   scripted interactive actions: comma-separated per-frame key
         tokens mirroring RooT's hotkeys (RooT.h:434-442 + 283-451);
         '+' combines keys in one frame, '.' is an idle frame, and the
         trace loops if shorter than -f. Example:
           -k "w,w,w+left,left,.,f4,a2,s,right"
         keys: w/s/a/d moves, up/down/left/right rotations (RooT's
         inverted pitch mapping), rise/fall vertical moves, f4 save
         frame, a1/a2/a4 antialiasing, q path-tracer toggle, f1 state
         dump, d1/d2/d3 scene switch
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
    ap.add_argument("-k", type=str, default=None,
                    help="scripted per-frame key trace (see docstring)")
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

    # scripted interactive loop (the RooT main_step hotkey dispatch,
    # RooT.h:272-633, driven by a key trace instead of X11 events)
    from quadray_tpu import engine as E
    key_actions = {
        "w": E.CAMERA_MOVE_FORWARD, "s": E.CAMERA_MOVE_BACK,
        "a": E.CAMERA_MOVE_LEFT, "d": E.CAMERA_MOVE_RIGHT,
        "rise": E.CAMERA_MOVE_UP, "fall": E.CAMERA_MOVE_DOWN,
        # RooT maps UP key -> ROTATE_DOWN and vice versa (RooT.h:439-440)
        "up": E.CAMERA_ROTATE_DOWN, "down": E.CAMERA_ROTATE_UP,
        "left": E.CAMERA_ROTATE_LEFT, "right": E.CAMERA_ROTATE_RIGHT,
    }
    script = ([tok.strip() for tok in args.k.split(",")] if args.k
              else None)
    scr_id = [0]

    def dispatch(keys: str, sim_ms: float):
        """Apply one frame's '+'-combined key tokens; returns the scene
        to render (scene switches return a new one)."""
        nonlocal scene
        for key in keys.split("+"):
            key = key.lower()
            if key in ("", "."):
                continue
            if key in key_actions:
                scene.update_action(sim_ms, key_actions[key])
            elif key == "f4":
                scene.save_frame(f"dump/scr{scr_id[0]:03d}.bmp")
                scr_id[0] += 1
            elif key in ("a1", "a2", "a4"):
                pfm.set_fsaa(int(key[1]))
            elif key == "q":
                scene.set_pton(not scene.pt_on)
            elif key == "f1":
                scene.print_state()
            elif key in ("d1", "d2", "d3"):
                scene = Scene(demos.build(f"demo0{key[1]}"),
                              args.x, args.y, pfm=pfm)
            else:
                print(f"unknown key token: {key}", file=sys.stderr)
        return scene
    t_wall0 = time.time()
    t_log = t_wall0
    frames_in_interval = 0
    total = 0

    for fi in range(args.f):
        sim_ms = fi * (1000.0 / 30.0)  # 30 fps animation clock
        if script:
            scene = dispatch(script[fi % len(script)], sim_ms)
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
