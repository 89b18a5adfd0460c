"""Sharded rendering: shard_map over the ray dimension.

Replaces the reference's scanline-interleaved thread pool
(engine.cpp:3458-3477 + tracer.cpp:1142-1151): rays are split in
contiguous blocks across the mesh's ray axis; the scene SoA is replicated;
each device runs the iterative Whitted loop on its own block only (local
while_loop termination — no cross-device sync per bounce), and the frame
is gathered for host assembly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from quadray_tpu.ops.rays import camera_rays, resolve_aa
from quadray_tpu.ops.trace import TraceConfig, trace_rays, trace_rays_diff
from quadray_tpu.parallel.mesh import RAY_AXIS, pad_to

F32 = jnp.float32


def _sharded_trace(sc, org, dirs, t_min, cfg: TraceConfig, mesh,
                   differentiable: bool = False):
    """Trace rays sharded over the mesh ray axis. org/dirs/t_min must have
    leading dim divisible by the mesh size."""
    fn = trace_rays_diff if differentiable else trace_rays
    spec_r = P(RAY_AXIS)
    scene_specs = jax.tree_util.tree_map(lambda _: P(), sc)

    @partial(shard_map, mesh=mesh,
             in_specs=(scene_specs, spec_r, spec_r, spec_r),
             out_specs=spec_r, check_vma=False)
    def go(sc_rep, org_blk, dirs_blk, tmin_blk):
        return fn(sc_rep, org_blk, dirs_blk, tmin_blk, cfg)

    return go(sc, org, dirs, t_min)


def render_sharded(sc, width: int, height: int, mesh, fsaa: int = 1,
                   cfg: TraceConfig = TraceConfig(),
                   differentiable: bool = False):
    """Full-frame sharded render -> (H, W, 3) linear radiance."""
    nd = mesh.devices.size
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm,
                             sc.cam_pov, width, height, fsaa)
    n = dirs.shape[0]
    npad = pad_to(n, nd)
    if npad != n:
        dirs = jnp.concatenate(
            [dirs, jnp.ones((npad - n, 3), F32)], axis=0)
    org = jnp.broadcast_to(org1[None, :], (npad, 3))
    t_min = jnp.full((npad,), sc.cam_pov, F32)
    cols = _sharded_trace(sc, org, dirs, t_min, cfg, mesh, differentiable)
    cols = jnp.clip(cols[:n], 0.0, 1.0)
    return resolve_aa(cols, width, height, fsaa)
