"""Multi-device correctness on the virtual 8-device CPU mesh.

The determinism/topology tier SURVEY.md §4.3 calls for: the sharded
render and train paths must produce the same pixels/gradients regardless
of how many devices the ray axis is split over (the reference's analog:
core_test implicitly validates that the scanline-interleaved thread
split does not change the frame).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops.trace import TraceConfig
from quadray_tpu.parallel.mesh import ray_mesh
from quadray_tpu.parallel.render import render_sharded, render_sharded_pallas

W, H = 96, 64
CFG = TraceConfig(depth=2, max_segments=4, stack=2)


@pytest.fixture(scope="module")
def sc():
    sd = load_scene("test01")
    return compile_scene(S.SceneDef(root=sd.root,
                                    opts=S.OPTS_FULL & ~sd.opts))


def _need8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (see conftest)")


def test_render_sharded_device_count_bitwise(sc):
    """1-device and 8-device sharded renders are BIT-IDENTICAL: each ray
    is traced independently, so splitting the ray axis must not change a
    single ulp (deterministic reduction-free data parallelism)."""
    _need8()
    img1 = np.asarray(render_sharded(sc, W, H, ray_mesh(jax.devices()[:1]),
                                     cfg=CFG))
    img8 = np.asarray(render_sharded(sc, W, H, ray_mesh(jax.devices()[:8]),
                                     cfg=CFG))
    assert img1.shape == (H, W, 3)
    assert np.array_equal(img1, img8)


def test_render_sharded_matches_unsharded(sc):
    from quadray_tpu.ops.trace import render
    _need8()
    img0 = np.asarray(render(sc, W, H, 1, CFG))
    img8 = np.asarray(render_sharded(sc, W, H, ray_mesh(jax.devices()[:8]),
                                     cfg=CFG))
    assert np.array_equal(img0, img8)


def test_render_sharded_pallas_device_count_bitwise(sc):
    """The Pallas fast path has a sharded entry too; interpret mode makes
    the sharding testable without TPU hardware."""
    _need8()
    img1 = np.asarray(render_sharded_pallas(
        sc, W, H, ray_mesh(jax.devices()[:1]), cfg=CFG, interpret=True))
    img8 = np.asarray(render_sharded_pallas(
        sc, W, H, ray_mesh(jax.devices()[:8]), cfg=CFG, interpret=True))
    assert img1.shape == (H, W, 3)
    assert np.array_equal(img1, img8)


def test_train_step_device_count_invariant(sc):
    """One optimizer step computed on 1 vs 8 devices yields the same loss
    and parameters (the pmean grad all-reduce only reassociates fp sums;
    tolerances cover that, and in practice the values match closely)."""
    _need8()
    from quadray_tpu.parallel.train import make_train_step, extract_params
    from quadray_tpu.ops.trace import trace_rays
    from quadray_tpu.ops.rays import camera_rays

    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, W, H, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    target = jnp.clip(trace_rays(sc, org, dirs, t_min, CFG), 0.0, 1.0)
    sc_pert = sc.replace(m_col=jnp.clip(sc.m_col + 0.1, 0.0, 1.0))

    results = {}
    for nd in (1, 8):
        step, opt_init = make_train_step(
            ray_mesh(jax.devices()[:nd]), W, H, cfg=CFG, lr=1e-2,
            fields=("m_col", "l_col"))
        params = extract_params(sc_pert, ("m_col", "l_col"))
        opt_state = opt_init(params)
        params, opt_state, loss = step(params, opt_state, sc_pert, target)
        results[nd] = (float(loss), jax.device_get(params))

    l1, p1 = results[1]
    l8, p8 = results[8]
    assert np.isclose(l1, l8, rtol=1e-5), (l1, l8)
    for k in p1:
        np.testing.assert_allclose(p1[k], p8[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)


def test_train_step_fast_device_count_invariant(sc):
    """The FAST training path (Pallas path-record emit + differentiable
    trace replay, parallel/train.make_train_step_fast) computes the
    same loss and updated parameters on 1 vs 8 devices: path records
    are per-ray (sharding-invariant), and the pmean grad all-reduce
    only reassociates fp sums. Kernel runs in interpret mode on the
    CPU mesh; sub=8 keeps the per-shard ray padding small."""
    _need8()
    from quadray_tpu.parallel.train import (make_train_step_fast,
                                            extract_params)
    from quadray_tpu.ops.trace import trace_rays
    from quadray_tpu.ops.rays import camera_rays

    w, h = 64, 32
    cfg = CFG._replace(sub=8)
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, w, h, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    target = jnp.clip(trace_rays(sc, org, dirs, t_min, cfg), 0.0, 1.0)
    sc_pert = sc.replace(m_col=jnp.clip(sc.m_col + 0.1, 0.0, 1.0))

    results = {}
    for nd in (1, 8):
        step, opt_init = make_train_step_fast(
            ray_mesh(jax.devices()[:nd]), sc_pert, w, h, cfg=cfg,
            lr=1e-2, fields=("m_col", "l_col"), k_paths=4,
            interpret=True)
        params = extract_params(sc_pert, ("m_col", "l_col"))
        opt_state = opt_init(params)
        params, opt_state, loss = step(params, opt_state, sc_pert,
                                       target)
        results[nd] = (float(loss), jax.device_get(params))

    l1, p1 = results[1]
    l8, p8 = results[8]
    assert np.isfinite(l1)
    assert np.isclose(l1, l8, rtol=1e-5), (l1, l8)
    for k in p1:
        np.testing.assert_allclose(p1[k], p8[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)


def test_train_step_fast_sharded_grads_finite(sc):
    """Two consecutive fast steps on the 8-device mesh with ray counts
    that do NOT fill the per-shard replay tiles: the zero-padded lanes
    once produced an exact eta==1, dot==0 Fresnel configuration whose
    sqrt-at-zero gradient was NaN and, after the pmean all-reduce,
    poisoned every parameter (round-5 regression)."""
    _need8()
    from quadray_tpu.parallel.train import (make_train_step_fast,
                                            extract_params)

    w, h = 32, 16
    cfg = CFG._replace(max_segments=4, stack=2, sub=8)
    target = jnp.zeros((w * h, 3), jnp.float32)
    step, opt_init = make_train_step_fast(
        ray_mesh(jax.devices()[:8]), sc, w, h, cfg=cfg, k_paths=4,
        interpret=True)
    params = extract_params(sc)
    opt_state = opt_init(params)
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, sc, target)
        assert np.isfinite(float(loss))
    for k, v in params.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_scaling_report_harness(sc):
    """Smoke the scaling-efficiency harness on the CPU mesh (the >=85%
    north-star gate applies on real multi-chip hardware; here we only
    require the report to be well-formed and monotone in devices)."""
    _need8()
    from quadray_tpu.parallel.distributed import scaling_report

    def fn(mesh):
        jax.block_until_ready(render_sharded(sc, W, H, mesh, cfg=CFG))

    rep = scaling_report(fn, device_counts=[1, 2], frames=2)
    assert rep["rows"][0]["devices"] == 1
    assert rep["rows"][1]["devices"] == 2
    assert all(r["seconds_per_frame"] > 0 for r in rep["rows"])
    assert rep["rows"][0]["efficiency"] == 1.0


def test_distributed_init_noop():
    """Without QUADRAY_* env the distributed init is a no-op and frame
    assembly is a plain host copy."""
    from quadray_tpu.parallel.distributed import (
        init_distributed, assemble_frame)
    assert init_distributed() is False
    x = jnp.ones((4, 4, 3))
    out = assemble_frame(x)
    assert isinstance(out, np.ndarray) and out.shape == (4, 4, 3)


def test_checkpoint_resume_training(sc, tmp_path):
    """Checkpoint/resume (SURVEY §5.4): save mid-optimization, restore,
    and continue to the same result as an uninterrupted run."""
    _need8()
    from quadray_tpu.parallel.train import make_train_step, extract_params
    from quadray_tpu.parallel.checkpoint import (
        save_checkpoint, load_checkpoint)
    from quadray_tpu.ops.trace import trace_rays
    from quadray_tpu.ops.rays import camera_rays

    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, W, H, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    target = jnp.clip(trace_rays(sc, org, dirs, t_min, CFG), 0.0, 1.0)
    sc_pert = sc.replace(m_col=jnp.clip(sc.m_col + 0.1, 0.0, 1.0))

    step, opt_init = make_train_step(ray_mesh(jax.devices()[:2]), W, H,
                                     cfg=CFG, lr=1e-2, fields=("m_col",))
    params = extract_params(sc_pert, ("m_col",))
    opt_state = opt_init(params)

    # uninterrupted: 4 steps
    p_ref, s_ref = params, opt_state
    for _ in range(4):
        p_ref, s_ref, _ = step(p_ref, s_ref, sc_pert, target)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    p, s = params, opt_state
    for _ in range(2):
        p, s, _ = step(p, s, sc_pert, target)
    path = save_checkpoint(str(tmp_path), 2, p, s)
    step_no, p2, s2, _ = load_checkpoint(path, params, opt_state)
    assert step_no == 2
    for _ in range(2):
        p2, s2, _ = step(p2, s2, sc_pert, target)

    for k in p_ref:
        np.testing.assert_array_equal(np.asarray(p_ref[k]),
                                      np.asarray(p2[k]), err_msg=k)


def test_two_process_distributed_smoke():
    """ACTUALLY runs jax.distributed with process_count()==2: two local
    CPU processes over a localhost coordinator exercise
    init_distributed, the global 4-device mesh, a cross-process psum and
    assemble_frame's process_allgather (tests/_dist_worker.py). Skipped
    where the sandbox forbids local TCP."""
    import socket
    import subprocess
    import sys as _sys
    import os as _os
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError as e:  # sandboxed-off networking
            pytest.skip(f"no localhost TCP: {e}")
        port = s.getsockname()[1]
    worker = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "_dist_worker.py")
    env = {k: v for k, v in _os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke test timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("UNAVAILABLE" in out
                                  or "PermissionDenied" in out):
            pytest.skip(f"distributed service unavailable: {out[-300:]}")
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"OK process {i}" in out, out[-3000:]
