"""Culling-layer differential tests.

The TPU analog of core_test's run0 (RT_OPTS_NONE) vs run1 (RT_OPTS_FULL)
methodology (core_test.cpp:939-1027): rendering with the bounding-sphere
block culling enabled must be BITWISE identical to brute force, because
a conservative cull can only skip surfaces that could not have produced
a valid hit. Bounds construction follows rt_Array/rt_Surface bounds
semantics (object.cpp:1830-2320, adjust_minmax object.cpp:2508-2799).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops.trace import TraceConfig
from quadray_tpu.ops.rays import camera_rays


def _rays(sc, w, h):
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, w, h, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    return org, dirs, t_min


def _compile(name, opts_off=0):
    sd = load_scene(name)
    return compile_scene(S.SceneDef(
        root=sd.root, opts=(S.OPTS_FULL & ~sd.opts) & ~opts_off))


def test_cull_on_off_bitwise_interpret():
    """Kernel cull=True vs cull=False, small frame, interpret mode."""
    from quadray_tpu.ops.pallas_kernel import trace_rays_pallas
    sc = _compile("test01")
    assert int(np.asarray(sc.s_bnd).sum()) > 0
    org, dirs, t_min = _rays(sc, 128, 64)
    a = np.asarray(trace_rays_pallas(
        sc, org, dirs, t_min, TraceConfig(stack=6, cull=True),
        interpret=True))
    b = np.asarray(trace_rays_pallas(
        sc, org, dirs, t_min, TraceConfig(stack=6, cull=False),
        interpret=True))
    assert np.array_equal(a, b)


def test_bounds_gated_by_tiling_opt():
    """Scenes compiled without the tiling/bounding-volume optimization
    class get no bounding spheres (the RT_OPTS_TILING/VARRAY analog:
    run0 renders brute-force)."""
    sc_on = _compile("test01")
    sc_off = _compile("test01", opts_off=S.OPTS_TILING)
    assert int(np.asarray(sc_on.s_bnd).sum()) > 0
    assert int(np.asarray(sc_off.s_bnd).sum()) == 0


def test_bounding_spheres_contain_hits():
    """Every valid jnp-path hit point of a bounded surface must lie
    inside that surface's world bounding sphere (conservativeness of
    the compile-time bounds on real render hits)."""
    from quadray_tpu.ops.trace import intersect
    sc = _compile("test16")
    org, dirs, t_min = _rays(sc, 160, 96)
    n = dirs.shape[0]
    hit = intersect(sc, org, dirs, t_min,
                    jnp.full((n,), 1e30, jnp.float32),
                    jnp.full((n,), -1, jnp.int32),
                    jnp.ones((n,), jnp.int32),
                    jnp.zeros((n,), bool))
    sid = np.asarray(hit["srf"])
    pts = np.asarray(hit["x"])
    valid = sid >= 0
    bnd = np.asarray(sc.s_bnd)
    sph = np.asarray(sc.s_bsph)
    for si in np.unique(sid[valid]):
        if not bnd[si]:
            continue
        p = pts[valid & (sid == si)]
        d2 = ((p - sph[si, :3]) ** 2).sum(axis=1)
        assert d2.max() <= sph[si, 3] * (1 + 1e-5), (
            f"surface {si}: hit escapes bounding sphere "
            f"({d2.max():.6g} > {sph[si, 3]:.6g})")


@pytest.mark.tpu
def test_cull_on_off_bitwise_hardware():
    """Full-resolution cull on/off bitwise equality on the TPU kernel
    for the deep many-surface scene the culling layer targets."""
    from quadray_tpu.ops.pallas_kernel import render_pallas
    sc = _compile("test13")
    a = np.asarray(render_pallas(sc, 800, 480, 1,
                                 TraceConfig(stack=6, cull=True)))
    b = np.asarray(render_pallas(sc, 800, 480, 1,
                                 TraceConfig(stack=6, cull=False)))
    assert np.array_equal(a, b)


def test_untie_bound_relations():
    """BOUND/UNTIE relation rows (object.cpp:1498-1586) control culling
    membership: UNTIE'd surfaces render without bounding volumes (never
    culled), BOUND re-ties; the frames are identical either way (the
    core_test bounds on/off differential)."""
    import dataclasses
    from quadray_tpu.ops.pallas_kernel import trace_rays_pallas
    sd = load_scene("test01")
    base_rels = list(sd.root.relations)

    def with_rels(extra):
        root = dataclasses.replace(sd.root,
                                   relations=base_rels + extra)
        return compile_scene(S.SceneDef(
            root=root, opts=S.OPTS_FULL & ~sd.opts))

    sc_on = with_rels([])
    sc_off = with_rels([S.Relation(-1, S.REL_UNTIE_ARRAY, -1)])
    sc_re = with_rels([S.Relation(-1, S.REL_UNTIE_ARRAY, -1),
                       S.Relation(-1, S.REL_BOUND_ARRAY, -1)])
    n_on = int(np.asarray(sc_on.s_bnd).sum())
    assert n_on > 0
    assert int(np.asarray(sc_off.s_bnd).sum()) == 0
    assert int(np.asarray(sc_re.s_bnd).sum()) == n_on

    org, dirs, t_min = _rays(sc_on, 128, 64)
    cfg = TraceConfig(stack=6)
    a = np.asarray(trace_rays_pallas(sc_on, org, dirs, t_min, cfg,
                                     interpret=True))
    b = np.asarray(trace_rays_pallas(sc_off, org, dirs, t_min, cfg,
                                     interpret=True))
    assert np.array_equal(a, b)
