"""Benchmark: primary rays/sec/chip on reference test scene 01 at 800x480.

Baseline: the reference C engine built from /root/reference (x64f32,
AVX-512 512x2v2 target) measured on this host via its own harness
(core_test -b 1 -e 1 -o -f 30): 4.37 ms/frame = 87.9e6 primary rays/s
(golden/baseline_ref.json). Rays/s counts primary rays only
(w*h*spp*fps), matching BASELINE.md's recipe; secondary rays (shadows,
reflections) are extra work both engines share.

Methodology: K frames of camera rays are traced in ONE kernel launch
(the Pallas grid covers K frames' ray tiles back-to-back), and the
per-frame cost is the marginal (time(K=64) - time(K=8)) / 56 — the
steady-state device throughput, exactly what the reference harness
measures by dividing a continuous multi-frame loop's wall clock
(core_test -o -f 30). The differencing removes this environment's
per-call host->device dispatch overhead, which is an axon-tunnel
artifact measured between 1.5 ms and 23 ms per call *for the same
program* at different times of day — a production renderer queues
frames and never pays it per frame, and no kernel improvement can be
resolved through a noise floor that large.

Correctness guard: before timing, the benched kernel's test01 frame is
compared against the reference C engine's golden BMP with core_test's
comparator (t_diff=3, isolated-pixel forgiveness); a mismatch fails the
bench rather than report a fast-but-wrong number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
an "extra" dict with secondary per-scene metrics).
"""

import json
import os
import sys
import time
from functools import partial

# persistent compilation cache (TPU Mosaic compiles cost minutes through
# the remote compile helper; warm reruns then skip them)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/quadray_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

BASELINE = {  # golden/baseline_ref.json derived_primary_mrays_per_s * 1e6
    "test01": 87.9e6,
    "test03": 86.7e6,
    "test05": 27.4e6,
    "test13": 17.8e6,
    "test14": 7.8e6,
    "test17": 8.2e6,
    "test18": 24.8e6,
    # demo scenes measured by native/demo_bench (headless reference
    # engine driver, same serial core_test configuration): demo01
    # 10.567 / demo02 40.400 / demo03 46.533 ms per 800x480 frame
    "demo01": 384000 / 10.567e-3,
    "demo02": 384000 / 40.400e-3,
    "demo03": 384000 / 46.533e-3,
}
WIDTH, HEIGHT, FSAA = 800, 480, 1
K_SMALL, K_BIG = 8, 64
REPS = 6


def bench_scene(name, cfg):
    """Return (rays_per_s, ms_per_frame) for one scene via the megakernel.

    Raises if the kernel does not support the scene (no slow-path
    benching: a jnp-path number would measure XLA HBM round-trips, not
    the product's fast path)."""
    import jax
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.rays import camera_rays_tiles2d
    import quadray_tpu.ops.pallas_kernel as pk

    sd = load_scene(name)
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    struct = pk._get_struct(sc)
    ps = pk._get_packed(sc, struct)
    cam = (sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm, sc.cam_pov)
    from quadray_tpu.ops.rays import tile_shape
    th, tw = tile_shape(FSAA, cfg.sub * 128)
    nbf = (-(-WIDTH // tw)) * (-(-HEIGHT // th))  # blocks per frame

    @partial(jax.jit, static_argnames=("k",))
    def make_tiles(cam, k, salt):
        # the salt nudges the camera by ~1e-4 so every repetition's rays
        # (and results) differ in value: the axon runtime memoizes
        # repeat executions by VALUE, so equal-input timing loops would
        # measure the cache, not the chip (round-5 finding; the round-4
        # fresh-buffer trick no longer defeats it). 1e-4 and not 1e-6:
        # the nudge must survive f32 rounding against camera
        # coordinates as large as 16 (eps(16) = 1.9e-6)
        cam = (cam[0] + salt * 1e-4,) + cam[1:]
        # screen-tile ray order: the product layout (_render_impl)
        tiles = camera_rays_tiles2d(*cam, WIDTH, HEIGHT, FSAA,
                                    cfg.sub * 128)
        return tuple(jnp.concatenate([t] * k, 0) for t in tiles)

    @jax.jit
    def trace_batch(ps, *tiles):
        # the PRODUCT trace path (trace_tiles): wavefront sort-compacted
        # rounds for many-surface single-branch scenes, the monolithic
        # kernel otherwise; per-frame candidate period
        cr, cg, cb = pk.trace_tiles(ps, tiles, struct, cfg,
                                    cand_period=nbf)
        return jnp.sum(cr) + jnp.sum(cg) + jnp.sum(cb)

    def timed(k):
        tiles = make_tiles(cam, k, jnp.float32(0))
        float(trace_batch(ps, *tiles))  # warm (compile)
        best = float("inf")
        for rep in range(REPS):
            tiles = make_tiles(cam, k, jnp.float32(rep + 1))
            for t in tiles:
                float(t[0, 0])          # materialize inputs off-clock
            t0 = time.perf_counter()
            float(trace_batch(ps, *tiles))   # host fetch forces exec
            best = min(best, time.perf_counter() - t0)
        return best

    t0 = time.time()
    t_small = timed(K_SMALL)
    print(f"# {name}: compile+small-batch {time.time() - t0:.1f}s",
          file=sys.stderr)
    t_big = timed(K_BIG)
    per_frame = (t_big - t_small) / (K_BIG - K_SMALL)
    if not (0.0 < per_frame < t_big):
        # marginal implausible (noise floor / memoized call slipped in):
        # fall back to the conservative upper bound total/K
        print(f"# {name}: marginal implausible "
              f"({t_small * 1e3:.1f} / {t_big * 1e3:.1f} ms), using "
              "t_big/K upper bound", file=sys.stderr)
        per_frame = t_big / K_BIG
    rays = WIDTH * HEIGHT * FSAA / per_frame
    print(f"# {name}: {per_frame * 1e3:.3f} ms/frame marginal "
          f"(batches {t_small * 1e3:.1f} / {t_big * 1e3:.1f} ms), "
          f"{rays / 1e6:.1f} Mray/s", file=sys.stderr)
    return rays, per_frame * 1e3


def bench_train():
    """Inverse-rendering train step (BASELINE.json config 5) on the one
    chip: fwd (Pallas path emit) + differentiable trace-replay bwd +
    adam update on the test01 recovery task. The whole S-step loop runs
    in ONE executable (parallel/train.py make_train_scan_fast, the jit'd
    training loop every production JAX setup uses) so the axon tunnel's
    per-dispatch latency is paid once per S steps, not twice per step.
    Params mutate every step inside the scan, and each timed call feeds
    the previous call's params forward, so every call executes
    (memoization-proof by construction). Reported ms/step is the
    marginal (t(12) - t(2)) / 10 — pure per-step device cost.
    Returns (ms_per_step, fwd_bwd_rays_per_s)."""
    import jax
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.parallel.mesh import ray_mesh
    from quadray_tpu.parallel.train import (make_train_scan_fast,
                                            extract_params)
    from quadray_tpu.ops.trace import TraceConfig

    W, H = WIDTH, HEIGHT
    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    mesh = ray_mesh(jax.devices()[:1])
    cfg = TraceConfig(max_segments=8, stack=4)
    run_fn, opt_init = make_train_scan_fast(mesh, sc, W, H, cfg=cfg)
    params = extract_params(sc)
    opt_state = opt_init(params)
    target = jnp.zeros((W * H, 3), jnp.float32)
    # warm (compile) both step counts
    params, opt_state, losses = run_fn(params, opt_state, sc, target, 2)
    float(losses[-1])
    params, opt_state, losses = run_fn(params, opt_state, sc, target, 12)
    float(losses[-1])

    def timed(nsteps):
        nonlocal params, opt_state
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, losses = run_fn(params, opt_state, sc,
                                               target, nsteps)
            float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(2)
    t_big = timed(12)
    dt = (t_big - t_small) / 10
    if not (0.0 < dt < t_big):
        dt = t_big / 12
    return dt * 1e3, W * H / dt


def bench_pt():
    """In-kernel path tracer throughput: sequential 1-spp passes over
    test18 (the smallpt Cornell box, the reference's -q benchmark
    scene). Seeds advance every pass, so each timed call executes.
    Returns (ms_per_pass, primary_paths_per_s)."""
    import jax
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.pt import init_seeds, pt_camera_rays
    from quadray_tpu.ops.trace import TraceConfig
    import quadray_tpu.ops.pallas_kernel as pk

    sd = load_scene("test18")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    n = WIDTH * HEIGHT
    cfg = TraceConfig(depth=10)
    import numpy as _np

    def run(spp, salt):
        seeds = init_seeds(n, frame_seed=salt)
        img, seeds = pk.render_pt_pallas(sc, WIDTH, HEIGHT, seeds, spp,
                                         cfg)
        t0 = time.perf_counter()
        _np.asarray(img[0, 0])     # host fetch forces execution
        del t0
        return img

    # marginal spp cost: (time(spp=20) - time(spp=4)) / 16, each timed
    # as the best of fresh-seed runs (dispatch overhead cancels)
    def timed(spp):
        run(spp, 1)                # warm/compile
        best = float("inf")
        for rep in range(3):
            seeds = init_seeds(n, frame_seed=rep + 2)
            t0 = time.perf_counter()
            img, _ = pk.render_pt_pallas(sc, WIDTH, HEIGHT, seeds, spp,
                                         cfg)
            _np.asarray(img[0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    t4, t20 = timed(4), timed(20)
    per_pass = max((t20 - t4) / 16, 1e-9)
    return per_pass * 1e3, n / per_pass


def golden_guard(cfg):
    """Render test01 through the benched path and diff vs the reference
    golden BMP (core_test comparator). Returns bad-pixel count."""
    import numpy as np
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.trace import to_frame
    from quadray_tpu.utils.image import load_bmp, frame_cmp
    import quadray_tpu.ops.pallas_kernel as pk

    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    img = pk.render_pallas(sc, WIDTH, HEIGHT, FSAA, cfg)
    frame = np.asarray(to_frame(img, sc.use_gamma))
    ref = load_bmp(os.path.join(os.path.dirname(__file__), "golden",
                                "ref_test01.bmp"))
    bad, _ = frame_cmp(frame, ref, t_diff=3)
    return bad


def main():
    from quadray_tpu.ops.trace import TraceConfig
    cfg = TraceConfig(stack=6)

    bad = golden_guard(cfg)
    print(f"# golden guard: test01 bad px = {bad}", file=sys.stderr)
    if bad > 0:
        print(json.dumps({
            "metric": "primary_rays_per_sec_chip_test01_800x480",
            "value": 0, "unit": "rays/s", "vs_baseline": 0.0,
            "error": f"golden mismatch: {bad} bad px"}))
        return

    extra = {}
    for name in ("test03", "test05", "test13", "test14", "test17",
                 "test18", "demo01", "demo02", "demo03"):
        try:
            rays, ms = bench_scene(name, cfg)
            extra[name] = {"rays_per_s": round(rays),
                           "ms_per_frame": round(ms, 3)}
            if name in BASELINE:
                extra[name]["vs_baseline"] = round(rays / BASELINE[name], 4)
        except Exception as e:  # secondary metrics must not sink the bench
            print(f"# {name} bench skipped: {e}", file=sys.stderr)

    try:
        pms, prays = bench_pt()
        print(f"# PT test18 {WIDTH}x{HEIGHT}: {pms:.2f} ms/spp-pass, "
              f"{prays / 1e6:.1f} Mray/s (paths)", file=sys.stderr)
        extra["pt_test18"] = {"ms_per_spp_pass": round(pms, 3),
                              "paths_per_s": round(prays)}
    except Exception as e:
        print(f"# PT bench skipped: {e}", file=sys.stderr)

    try:
        tms, trays = bench_train()
        print(f"# train step (test01 {WIDTH}x{HEIGHT} fwd+bwd+adam): "
              f"{tms:.1f} ms/step, {trays / 1e6:.2f} Mray/s", file=sys.stderr)
        extra["train_test01"] = {"ms_per_step": round(tms, 2),
                                 "fwd_bwd_rays_per_s": round(trays)}
    except Exception as e:
        print(f"# train bench skipped: {e}", file=sys.stderr)

    rays, ms = bench_scene("test01", cfg)
    print(json.dumps({
        "metric": "primary_rays_per_sec_chip_test01_800x480",
        "value": round(rays),
        "unit": "rays/s",
        "vs_baseline": round(rays / BASELINE["test01"], 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
