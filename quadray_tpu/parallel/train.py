"""Inverse rendering: optimize scene parameters from target images.

The "training" workload of this framework (BASELINE.json config 5): pixel
L2 loss against target frames, gradients through the differentiable tracer
to surface transforms / quadric coefficients / materials / lights, ray
dimension sharded over the mesh with the loss psum-reduced over ICI, and a
plain optax optimizer on top.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from quadray_tpu.ops.rays import camera_rays
from quadray_tpu.ops.trace import TraceConfig, trace_rays_diff
from quadray_tpu.parallel.mesh import RAY_AXIS, pad_to

F32 = jnp.float32

# SceneArrays fields that make sense as optimization variables
DIFFERENTIABLE_FIELDS = (
    "s_pos", "s_inv", "s_sci", "s_scjh", "s_sciw",
    "m_col", "m_dff", "m_spc", "m_rfl", "m_trn", "m_rfr",
    "l_pos", "l_col", "l_cnt", "l_lnr", "l_qdr", "amb_col",
)


def extract_params(sc, fields=DIFFERENTIABLE_FIELDS) -> Dict[str, Any]:
    return {k: getattr(sc, k) for k in fields}


def loss_fn(params: Dict[str, Any], sc, org, dirs, t_min, target, w,
            cfg: TraceConfig):
    """Weighted mean squared pixel error over the local ray block
    (w masks out padding rays)."""
    sc = sc.replace(**params)
    cols = trace_rays_diff(sc, org, dirs, t_min, cfg)
    cols = jnp.clip(cols, 0.0, 1.0)
    err = jnp.sum(((cols - target) ** 2) * w[:, None])
    return err / jnp.maximum(jnp.sum(w) * 3.0, 1.0)


def make_train_step_fast(mesh, sc0, width: int, height: int,
                         cfg: TraceConfig = TraceConfig(max_segments=8,
                                                        stack=4),
                         fsaa: int = 1, lr: float = 1e-2,
                         fields=DIFFERENTIABLE_FIELDS, k_paths: int = 8,
                         interpret: bool = False):
    """Fast train step via trace-replay differentiation: the Pallas
    megakernel traces the current scene and emits per-segment path
    records (detached), and the differentiable color is re-evaluated
    along those paths in O(N*K) (ops/replay.py). Requires a
    single-branch scene (struct.can_push False); ``sc0`` supplies the
    static kernel structure, which parameter updates cannot change.

    ~100x the throughput of the all-surface jnp autodiff path on TPU
    (the jnp tracer's (N, NS) AoS intermediates are VPU-hostile);
    gradients agree wherever the path topology is locally constant —
    the framework's documented differentiability contract."""
    import quadray_tpu.ops.pallas_kernel as pk
    from quadray_tpu.ops.replay import replay_color

    struct = pk._get_struct(sc0)
    assert not struct.can_push, \
        "trace-replay training requires a single-branch scene"
    opt = optax.adam(lr)
    spec_r = P(RAY_AXIS)

    def loss_fast(params, sc_rep, org, dirs_blk, t_min, target_blk,
                  w_blk):
        sc2 = sc_rep.replace(**params)
        # the path emit is fully detached (inputs AND outputs): the
        # discrete path structure is piecewise-constant in the params,
        # and pallas_call has no JVP rule for scalar-prefetch kernels
        sc_det = jax.tree_util.tree_map(jax.lax.stop_gradient, sc2)
        _, paths = pk.trace_paths_with_struct(
            sc_det, struct, jax.lax.stop_gradient(org), dirs_blk, t_min,
            cfg, k_paths, interpret)
        paths = jax.lax.stop_gradient(paths)
        cols = replay_color(sc2, org, dirs_blk, t_min, paths, cfg)
        cols = jnp.clip(cols, 0.0, 1.0)
        err = jnp.sum(((cols - target_blk) ** 2) * w_blk[:, None])
        return err / jnp.maximum(jnp.sum(w_blk) * 3.0, 1.0)

    def local_step(params, sc_rep, dirs_blk, target_blk, w_blk):
        org = jnp.broadcast_to(sc_rep.cam_pos[None, :],
                               (dirs_blk.shape[0], 3))
        t_min = jnp.full((dirs_blk.shape[0],), sc_rep.cam_pov, F32)
        loss, grads = jax.value_and_grad(loss_fast)(
            params, sc_rep, org, dirs_blk, t_min, target_blk, w_blk)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, RAY_AXIS), grads)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        return loss, grads

    nd = mesh.devices.size

    @jax.jit
    def grad_fn(params, sc, target_flat):
        scene_specs = jax.tree_util.tree_map(lambda _: P(), sc)
        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=(param_specs, scene_specs, spec_r, spec_r, spec_r),
            out_specs=(P(), param_specs), check_vma=False)
        org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                                 sc.cam_nrm, sc.cam_pov, width, height,
                                 fsaa)
        n = dirs.shape[0]
        npad = pad_to(n, nd)
        tgt = target_flat
        w = jnp.ones((npad,), F32)
        if npad != n:
            dirs = jnp.concatenate([dirs, jnp.ones((npad - n, 3), F32)], 0)
            tgt = jnp.concatenate([tgt, jnp.zeros((npad - n, 3), F32)], 0)
            w = w.at[n:].set(0.0)
        return sharded(params, sc, dirs, tgt, w)

    @jax.jit
    def update_fn(grads, opt_state, params):
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def step_fn(params, opt_state, sc, target_flat):
        # single-step API (tests, interactive use). For throughput use
        # make_train_scan_fast: S steps inside one executable — each
        # separate dispatch here pays a host->device round trip that
        # through this environment's axon tunnel costs more than the
        # step's ~10 ms of device compute
        loss, grads = grad_fn(params, sc, target_flat)
        params, opt_state = update_fn(grads, opt_state, params)
        return params, opt_state, loss

    return step_fn, opt.init


def make_train_scan_fast(mesh, sc0, width: int, height: int,
                         cfg: TraceConfig = TraceConfig(max_segments=8,
                                                        stack=4),
                         fsaa: int = 1, lr: float = 1e-2,
                         fields=DIFFERENTIABLE_FIELDS, k_paths: int = 8,
                         interpret: bool = False):
    """Multi-step trace-replay training: S adam steps inside ONE
    executable via ``lax.scan`` (the standard JAX training-loop idiom —
    jit the whole update loop, not one step).

    The per-step device cost of the fast path is ~0.3 ms (path-record
    emit 0.1 + differentiable replay fwd+bwd 0.2, measured round 5);
    dispatching each step separately costs 2 host->device round trips,
    which through this environment's axon tunnel is 40+ ms of pure
    latency per call — 250x the compute. Scanning S steps in one
    dispatch amortizes it away, exactly as a production training loop
    (jit'd epoch) would. Returns run_fn(params, opt_state, sc, target,
    steps) -> (params, opt_state, losses[steps]); ``steps`` is static.
    """
    import quadray_tpu.ops.pallas_kernel as pk
    from quadray_tpu.ops.replay import replay_color

    struct = pk._get_struct(sc0)
    assert not struct.can_push, \
        "trace-replay training requires a single-branch scene"
    opt = optax.adam(lr)
    spec_r = P(RAY_AXIS)
    nd = mesh.devices.size

    def loss_fast(params, sc_rep, org, dirs_blk, t_min, target_blk,
                  w_blk):
        sc2 = sc_rep.replace(**params)
        sc_det = jax.tree_util.tree_map(jax.lax.stop_gradient, sc2)
        _, paths = pk.trace_paths_with_struct(
            sc_det, struct, jax.lax.stop_gradient(org), dirs_blk, t_min,
            cfg, k_paths, interpret)
        paths = jax.lax.stop_gradient(paths)
        cols = replay_color(sc2, org, dirs_blk, t_min, paths, cfg)
        cols = jnp.clip(cols, 0.0, 1.0)
        err = jnp.sum(((cols - target_blk) ** 2) * w_blk[:, None])
        return err / jnp.maximum(jnp.sum(w_blk) * 3.0, 1.0)

    def local_scan(params, opt_state, sc_rep, dirs_blk, target_blk,
                   w_blk, steps):
        org = jnp.broadcast_to(sc_rep.cam_pos[None, :],
                               (dirs_blk.shape[0], 3))
        t_min = jnp.full((dirs_blk.shape[0],), sc_rep.cam_pov, F32)

        def one_step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fast)(
                params, sc_rep, org, dirs_blk, t_min, target_blk, w_blk)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, RAY_AXIS), grads)
            loss = jax.lax.pmean(loss, RAY_AXIS)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=steps)
        return params, opt_state, losses

    @partial(jax.jit, static_argnames=("steps",))
    def run_fn(params, opt_state, sc, target_flat, steps):
        scene_specs = jax.tree_util.tree_map(lambda _: P(), sc)
        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        opt_specs = jax.tree_util.tree_map(lambda _: P(), opt_state)
        sharded = shard_map(
            partial(local_scan, steps=steps), mesh=mesh,
            in_specs=(param_specs, opt_specs, scene_specs, spec_r,
                      spec_r, spec_r),
            out_specs=(param_specs, opt_specs, P()), check_vma=False)
        org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                                 sc.cam_nrm, sc.cam_pov, width, height,
                                 fsaa)
        n = dirs.shape[0]
        npad = pad_to(n, nd)
        tgt = target_flat
        w = jnp.ones((npad,), F32)
        if npad != n:
            dirs = jnp.concatenate([dirs, jnp.ones((npad - n, 3), F32)], 0)
            tgt = jnp.concatenate([tgt, jnp.zeros((npad - n, 3), F32)], 0)
            w = w.at[n:].set(0.0)
        return sharded(params, opt_state, sc, dirs, tgt, w)

    return run_fn, opt.init


def make_train_step(mesh, width: int, height: int,
                    cfg: TraceConfig = TraceConfig(max_segments=8, stack=4),
                    fsaa: int = 1, lr: float = 1e-2,
                    fields=DIFFERENTIABLE_FIELDS):
    """Build (step_fn, opt_init). step_fn(params, opt_state, sc, target_flat)
    -> (params, opt_state, loss). Rays sharded over the mesh; per-device
    partial losses/grads are psum-averaged over ICI inside shard_map so the
    update is identical on every device.
    """
    opt = optax.adam(lr)
    nd = mesh.devices.size
    spec_r = P(RAY_AXIS)

    def local_step(params, sc_rep, dirs_blk, target_blk, w_blk):
        org = jnp.broadcast_to(sc_rep.cam_pos[None, :],
                               (dirs_blk.shape[0], 3))
        t_min = jnp.full((dirs_blk.shape[0],), sc_rep.cam_pov, F32)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, sc_rep, org, dirs_blk, t_min, target_blk, w_blk, cfg)
        # gradient all-reduce over ICI (mean across ray shards)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, RAY_AXIS), grads)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        return loss, grads

    @partial(jax.jit, static_argnames=())
    def step_fn(params, opt_state, sc, target_flat):
        scene_specs = jax.tree_util.tree_map(lambda _: P(), sc)
        param_specs = jax.tree_util.tree_map(lambda _: P(), params)

        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=(param_specs, scene_specs, spec_r, spec_r, spec_r),
            out_specs=(P(), param_specs), check_vma=False)
        org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                                 sc.cam_nrm, sc.cam_pov, width, height, fsaa)
        n = dirs.shape[0]
        npad = pad_to(n, nd)
        tgt = target_flat
        w = jnp.ones((npad,), F32)
        if npad != n:
            dirs = jnp.concatenate([dirs, jnp.ones((npad - n, 3), F32)], 0)
            tgt = jnp.concatenate([tgt, jnp.zeros((npad - n, 3), F32)], 0)
            w = w.at[n:].set(0.0)
        loss, grads = sharded(params, sc, dirs, tgt, w)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step_fn, opt.init
