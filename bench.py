"""Benchmark: primary rays/sec/chip on reference test scene 01 at 800x480.

Baseline: the reference C engine built from /root/reference (x64f32,
AVX-512 512x2v2 target) measured on this host via its own harness
(core_test -b 1 -e 1 -o -f 30): 4.37 ms/frame = 87.9e6 primary rays/s
(golden/baseline_ref.json). Rays/s here counts primary rays only
(w*h*spp*fps), matching BASELINE.md's recipe; secondary rays (shadows,
reflections) are extra work both engines share.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

BASELINE_PRIMARY_RAYS_PER_S = 87.9e6
WIDTH, HEIGHT, FSAA = 800, 480, 1
FRAMES = 10


def main():
    import jax
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.rays import camera_rays
    from quadray_tpu.ops.trace import TraceConfig, trace_rays
    from quadray_tpu.ops.pallas_kernel import (
        trace_rays_pallas, kernel_supported)

    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm,
                             sc.cam_pov, WIDTH, HEIGHT, FSAA)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    cfg = TraceConfig(stack=6)

    if kernel_supported(sc):
        print("# path: pallas megakernel", file=sys.stderr)
        fn = lambda sc, org, dirs, t_min: \
            trace_rays_pallas(sc, org, dirs, t_min, cfg)
    else:
        print("# path: jnp tracer", file=sys.stderr)
        fn = jax.jit(lambda sc, org, dirs, t_min:
                     trace_rays(sc, org, dirs, t_min, cfg))
    t0 = time.time()
    out = fn(sc, org, dirs, t_min)
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"# compile+first-frame: {compile_s:.1f}s "
          f"on {jax.devices()[0].platform}", file=sys.stderr)

    t0 = time.time()
    for _ in range(FRAMES):
        out = fn(sc, org, dirs, t_min)
    out.block_until_ready()
    dt = (time.time() - t0) / FRAMES
    rays_per_s = WIDTH * HEIGHT * FSAA / dt
    print(f"# {dt*1e3:.2f} ms/frame", file=sys.stderr)

    print(json.dumps({
        "metric": "primary_rays_per_sec_chip_test01_800x480",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
