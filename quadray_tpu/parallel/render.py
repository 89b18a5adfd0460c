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


def render_sharded_pallas(sc, width: int, height: int, mesh, fsaa: int = 1,
                          cfg: TraceConfig = TraceConfig(),
                          interpret: bool = False):
    """Full-frame sharded render on the Pallas fast path: ray tiles are
    sharded in contiguous blocks over the mesh ray axis, the packed scene
    is replicated, and each device runs the megakernel over its own tile
    rows (the multi-chip analog of the scanline-interleaved thread pool,
    engine.cpp:3458-3477). interpret=True runs the kernel in Pallas
    interpret mode so the sharding itself is testable on a CPU mesh."""
    import quadray_tpu.ops.pallas_kernel as pk
    from quadray_tpu.ops.rays import camera_rays_tiled

    nd = mesh.devices.size
    struct = pk._get_struct(sc)
    ps = pk._get_packed(sc, struct)
    tiles = camera_rays_tiled(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                              sc.cam_nrm, sc.cam_pov, width, height, fsaa,
                              pk.BLOCK * nd)
    spec_r = P(RAY_AXIS)
    ps_specs = jax.tree_util.tree_map(lambda _: P(), ps)

    @partial(shard_map, mesh=mesh,
             in_specs=(ps_specs,) + (spec_r,) * 7,
             out_specs=(spec_r,) * 3, check_vma=False)
    def go(ps_rep, *tiles_blk):
        return pk._trace_tiled(ps_rep, *tiles_blk, struct=struct, cfg=cfg,
                               interpret=interpret)

    cr, cg, cb = go(ps, *tiles)
    n = width * height * fsaa
    comps = [jnp.clip(c.reshape(-1)[:n], 0.0, 1.0)
             .reshape(height, width, fsaa).mean(axis=2)
             for c in (cr, cg, cb)]
    return jnp.stack(comps, axis=-1)
