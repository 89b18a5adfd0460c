"""test16 precision experiment: does the 38-px clip-boundary residual
vanish at fp64? (the decisive frame-convention measurement)"""
import os
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops import trace as T
from quadray_tpu.ops.rays import camera_rays
from quadray_tpu.utils.image import load_bmp, frame_cmp

W, H = 800, 480
sd = load_scene("test16")
sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))

def up(a):
    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
        return a.astype(jnp.float64)
    return a

sc64 = jax.tree_util.tree_map(up, sc)
org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm,
                         sc.cam_pov, W, H, 1)
n = dirs.shape[0]
org = jnp.broadcast_to(org1[None, :], (n, 3)).astype(jnp.float64)
t_min = jnp.full((n,), sc.cam_pov, jnp.float64)
cfg = T.TraceConfig(stack=6)
T.set_element(jnp.float64)
cols = T.trace_rays(sc64, org, dirs.astype(jnp.float64), t_min, cfg)
T.set_element(jnp.float32)
img = np.asarray(T.to_frame(
    jnp.asarray(cols, jnp.float32).reshape(H, W, 3), sc.use_gamma))
ref = load_bmp("/root/repo/golden/ref_test16.bmp")
bad, _ = frame_cmp(img, ref, t_diff=3)
print(f"test16 fp64 bad px = {bad} (fp32 = 38)")
