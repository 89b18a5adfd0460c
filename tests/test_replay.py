"""Trace-replay differentiation tests (ops/replay.py).

Validates the fast training path's two contracts:
  1. primal fidelity — replaying the kernel-emitted paths reproduces the
     kernel's own colors (exactly, for non-textured scenes);
  2. gradient fidelity — replay gradients match the all-surface jnp
     autodiff path (trace_rays_diff) wherever the path topology is
     locally constant (edge lanes excluded, tests/test_grad.py
     methodology).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops.trace import TraceConfig, trace_rays_diff
from quadray_tpu.ops.rays import camera_rays

CFG = TraceConfig(stack=6)
K = 8


def _setup(name, w=96, h=64):
    sd = load_scene(name)
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, w, h, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    return sc, org, dirs, t_min


@pytest.mark.parametrize("name", ["test01", "test02", "test04"])
def test_replay_primal_matches_kernel(name):
    from quadray_tpu.ops.pallas_kernel import trace_paths
    from quadray_tpu.ops.replay import replay_color
    sc, org, dirs, t_min = _setup(name, 128, 64)
    cols, paths = trace_paths(sc, org, dirs, t_min, CFG, k_paths=K,
                              interpret=True)
    rep = replay_color(sc, org, dirs, t_min, paths, CFG)
    d = np.abs(np.asarray(cols) - np.asarray(rep))
    assert d.max() < 1e-5, f"{name}: replay diverges by {d.max()}"


def test_replay_grads_match_jnp_autodiff():
    """d(sum of interior pixels)/d(s_pos, m_col, l_pos) via replay vs
    via the all-surface jnp autodiff path."""
    from quadray_tpu.ops.pallas_kernel import trace_paths
    from quadray_tpu.ops.replay import replay_color
    sc, org, dirs, t_min = _setup("test01", 64, 40)
    # small segment budget: the jnp comparison path unrolls its whole
    # branch-stack graph and its CPU grad compile explodes beyond this
    cfg = TraceConfig(max_segments=3, stack=2)
    _, paths = trace_paths(sc, org, dirs, t_min, cfg, k_paths=3,
                           interpret=True)

    # interior mask: exclude lanes whose 4-neighbourhood (in the 64x40
    # grid) changes its first-hit surface — visibility edges
    srf0 = np.asarray(paths)[0] & 0xFFF
    g = srf0.reshape(40, 64)
    edge = np.zeros_like(g, bool)
    edge[1:, :] |= g[1:, :] != g[:-1, :]
    edge[:-1, :] |= g[1:, :] != g[:-1, :]
    edge[:, 1:] |= g[:, 1:] != g[:, :-1]
    edge[:, :-1] |= g[:, 1:] != g[:, :-1]
    wmask = jnp.asarray(~edge.reshape(-1), jnp.float32)

    fields = ("s_pos", "m_col", "l_pos")

    def loss_replay(params):
        sc2 = sc.replace(**params)
        cols = replay_color(sc2, org, dirs, t_min, paths, cfg)
        return jnp.sum(jnp.clip(cols, 0.0, 1.0) * wmask[:, None])

    def loss_jnp(params):
        sc2 = sc.replace(**params)
        cols = trace_rays_diff(sc2, org, dirs, t_min, cfg)
        return jnp.sum(jnp.clip(cols, 0.0, 1.0) * wmask[:, None])

    params = {k: getattr(sc, k) for k in fields}
    ga = jax.grad(loss_replay)(params)
    gb = jax.grad(loss_jnp)(params)
    for k in fields:
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        scale = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / scale
        assert rel < 5e-3, f"{k}: replay grad off by rel {rel:.2e}"


def test_train_step_fast_reduces_loss():
    """End-to-end fast train step on a 1-device mesh (interpret kernel):
    recover a perturbed sphere position; loss must drop."""
    from quadray_tpu.parallel.mesh import ray_mesh
    from quadray_tpu.parallel.train import (make_train_step_fast,
                                            extract_params)
    from quadray_tpu.ops.trace import render as render_jnp
    sc, _, _, _ = _setup("test01")
    W, H = 48, 32
    target = jnp.clip(render_jnp(sc, W, H, 1, CFG), 0.0, 1.0
                      ).reshape(-1, 3)
    mesh = ray_mesh(jax.devices()[:1])
    cfg = TraceConfig(max_segments=4, stack=4)
    step_fn, opt_init = make_train_step_fast(
        mesh, sc, W, H, cfg=cfg, lr=5e-3, k_paths=4, interpret=True)
    # perturb the scene: nudge every surface position
    sc_p = sc.replace(s_pos=sc.s_pos + 0.05)
    params = extract_params(sc_p)
    opt_state = opt_init(params)
    losses = []
    for _ in range(4):
        params, opt_state, loss = step_fn(params, opt_state, sc_p, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_train_scan_fast_matches_step_fast():
    """The one-executable S-step scan (make_train_scan_fast) computes
    the same optimization trajectory as S calls of the per-step path
    (same math, same order — only the dispatch granularity differs)."""
    from quadray_tpu.parallel.mesh import ray_mesh
    from quadray_tpu.parallel.train import (
        make_train_scan_fast, make_train_step_fast, extract_params)
    from quadray_tpu.ops.trace import render as render_jnp
    sc, _, _, _ = _setup("test01")
    W, H = 48, 32
    target = jnp.clip(render_jnp(sc, W, H, 1, CFG), 0.0, 1.0
                      ).reshape(-1, 3)
    mesh = ray_mesh(jax.devices()[:1])
    cfg = TraceConfig(max_segments=4, stack=4)
    kw = dict(cfg=cfg, lr=5e-3, k_paths=4, interpret=True)
    step_fn, opt_init = make_train_step_fast(mesh, sc, W, H, **kw)
    run_fn, _ = make_train_scan_fast(mesh, sc, W, H, **kw)
    sc_p = sc.replace(s_pos=sc.s_pos + 0.05)
    params0 = extract_params(sc_p)

    p1, o1 = params0, opt_init(params0)
    losses_ref = []
    for _ in range(3):
        p1, o1, loss = step_fn(p1, o1, sc_p, target)
        losses_ref.append(float(loss))

    p2, o2, losses = run_fn(params0, opt_init(params0), sc_p, target, 3)
    np.testing.assert_allclose(np.asarray(losses), losses_ref,
                               rtol=2e-5, atol=1e-7)
    for kparam in p1:
        np.testing.assert_allclose(np.asarray(p2[kparam]),
                                   np.asarray(p1[kparam]),
                                   rtol=2e-4, atol=1e-6)
