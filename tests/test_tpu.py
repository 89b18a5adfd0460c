"""Hardware-tier tests (QUADRAY_TPU_TESTS=1, real TPU).

The reference validates its optimized path on the actual target with
core_test run0-vs-run1 (test/core_test.cpp:955-1007). Here the optimized
path is the Pallas megakernel and the target is the TPU: these tests
render through the kernel ON HARDWARE and compare against the reference
C engine's golden BMPs — the tier whose absence let a Mosaic/precision
divergence ship in round 1.

Run:  QUADRAY_TPU_TESTS=1 python -m pytest tests -m tpu -q
Fast: QUADRAY_TPU_FAST=1 narrows to one scene per feature cluster
(kernel compiles are ~1 min per scene shape).
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")

ALL_SCENES = ["test01", "test02", "test03", "test04", "test05", "test06",
              "test07", "test08", "test09", "test10", "test11", "test12",
              "test13", "test14", "test15", "test16", "test17", "test18",
              # demo scenes vs goldens rendered by native/demo_bench
              "demo01", "demo02", "demo03"]
FAST_SCENES = ["test01", "test09", "test05"]

SCENES = (FAST_SCENES if os.environ.get("QUADRAY_TPU_FAST") == "1"
          else ALL_SCENES)

# hardware golden budgets for the PALLAS path, set to measured actuals
# (no slack; see KNOWN_ISSUES.md for the frame-convention analysis).
# test13 and demo02 dropped to 0 in round 5: the no-Fresnel TIR fold
# fix (ops/trace.py fresnel_terms) closed both.
BUDGET = {"test11": 8, "test14": 3, "test16": 45, "demo03": 3}


def _render_pallas(name, use_kernel=True):
    import jax.numpy as jnp
    from quadray_tpu.engine import Scene
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.ops.pallas_kernel import trace_rays_pallas
    from quadray_tpu.ops.trace import TraceConfig, trace_rays, to_frame
    from quadray_tpu.ops.rays import camera_rays

    sc = Scene(load_scene(name), 800, 480)
    arr = sc.arrays
    org1, dirs = camera_rays(arr.cam_pos, arr.cam_hor, arr.cam_ver,
                             arr.cam_nrm, arr.cam_pov, 800, 480, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    tmin = jnp.full((n,), arr.cam_pov)
    cfg = TraceConfig(stack=6)
    fn = trace_rays_pallas if use_kernel else trace_rays
    cols = fn(arr, org, dirs, tmin, cfg)
    frame = to_frame(jnp.clip(cols, 0.0, 1.0).reshape(480, 800, 3),
                     arr.use_gamma)
    used_kernel = fn is trace_rays_pallas
    return np.asarray(frame), used_kernel


@pytest.mark.tpu
@pytest.mark.parametrize("name", SCENES)
def test_pallas_vs_golden_on_tpu(name):
    from quadray_tpu.utils.image import load_bmp, frame_cmp
    ref = load_bmp(os.path.join(GOLDEN, f"ref_{name}.bmp"))
    frame, used_kernel = _render_pallas(name)
    nbad, _ = frame_cmp(ref, frame, t_diff=3)
    allowed = BUDGET.get(name, 0)
    path = "pallas" if used_kernel else "jnp-fallback"
    assert nbad <= allowed, (
        f"{name} [{path}]: {nbad} bad px on TPU vs golden "
        f"(allowed {allowed})")


@pytest.mark.tpu
def test_pallas_default_config_on_tpu():
    """The hardware tier otherwise validates at TraceConfig(stack=6);
    one scene also runs at the DEFAULT TraceConfig() (stack=10, the
    RT_STACK_DEPTH configuration) so the default-shape kernel stays
    covered — test17 exercises the branch stack hardest."""
    import jax.numpy as jnp
    from quadray_tpu.utils.image import load_bmp, frame_cmp
    from quadray_tpu.engine import Scene
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.ops.pallas_kernel import trace_rays_pallas
    from quadray_tpu.ops.trace import TraceConfig, to_frame
    from quadray_tpu.ops.rays import camera_rays

    sc = Scene(load_scene("test17"), 800, 480)
    arr = sc.arrays
    org1, dirs = camera_rays(arr.cam_pos, arr.cam_hor, arr.cam_ver,
                             arr.cam_nrm, arr.cam_pov, 800, 480, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    tmin = jnp.full((n,), arr.cam_pov)
    cols = trace_rays_pallas(arr, org, dirs, tmin, TraceConfig())
    frame = to_frame(jnp.clip(cols, 0.0, 1.0).reshape(480, 800, 3),
                     arr.use_gamma)
    ref = load_bmp(os.path.join(GOLDEN, "ref_test17.bmp"))
    nbad, _ = frame_cmp(ref, np.asarray(frame), t_diff=3)
    assert nbad == 0, f"test17 @ default TraceConfig: {nbad} bad px"


@pytest.mark.tpu
def test_jnp_path_exact_on_tpu():
    """The jnp tracer itself must be hardware-exact (guards against
    low-precision-matmul regressions, e.g. default bf16 MXU passes)."""
    from quadray_tpu.utils.image import load_bmp, frame_cmp
    ref = load_bmp(os.path.join(GOLDEN, "ref_test01.bmp"))
    frame, _ = _render_pallas("test01", use_kernel=False)
    nbad, _ = frame_cmp(ref, frame, t_diff=3)
    assert nbad == 0, f"jnp path on TPU: {nbad} bad px"
