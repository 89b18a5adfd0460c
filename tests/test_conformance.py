"""Kernel-op conformance tier — the simd_test analog.

test/simd_test.cpp asks "does the assembler lie?": every instruction is
run through the SIMD backend and through plain C++, compared with
magnitude-scaled FEQ thresholds (simd_test.cpp:38-50). Here the
"assembler" is Mosaic: each building block of the megakernel runs as a
tiny pallas_call on the TPU and as plain jnp/XLA on the same device, on
the same inputs. This is the tier that catches Mosaic codegen drift
(rsqrt/div/rounding) before it becomes whole-frame pixel errors.

Run: QUADRAY_TPU_TESTS=1 python -m pytest tests/test_conformance.py -q
"""

import numpy as np
import pytest


def _pallas_elementwise(fn, *args):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(*refs):
        ins, out = refs[:-1], refs[-1]
        out[:] = fn(*(r[:] for r in ins))

    out_dtype = jax.eval_shape(fn, *args)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_dtype.shape, out_dtype.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def _feq(a, b, scale=4.0):
    """Magnitude-scaled float compare (FEQ, simd_test.cpp:38-50)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    tol = scale * np.finfo(np.float32).eps * np.maximum(
        np.maximum(np.abs(a), np.abs(b)), 1e-20)
    bad = np.abs(a - b) > tol
    return int(bad.sum()), float(np.abs(a - b).max())


def _rand(shape=(8, 128), lo=-4.0, hi=4.0, seed=0):
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.uniform(lo, hi, shape).astype(np.float32))


CASES = [
    ("add", lambda x, y: x + y, 2, (-1e3, 1e3)),
    ("mul", lambda x, y: x * y, 2, (-1e3, 1e3)),
    ("div", lambda x, y: x / y, 2, (0.5, 1e3)),
    ("sqrt", lambda x: __import__("jax.numpy", fromlist=["sqrt"]).sqrt(x),
     1, (0.0, 1e4)),
    ("rsqrt", lambda x: __import__("jax").lax.rsqrt(x), 1, (1e-4, 1e4)),
    ("exp", lambda x: __import__("jax.numpy", fromlist=["exp"]).exp(x),
     1, (-8.0, 8.0)),
    ("log", lambda x: __import__("jax.numpy", fromlist=["log"]).log(x),
     1, (1e-4, 1e4)),
    ("fma", lambda x, y: x * y + y, 2, (-1e2, 1e2)),
    ("min_max", lambda x, y: __import__("jax.numpy", fromlist=["maximum"])
     .maximum(x, y) - __import__("jax.numpy", fromlist=["minimum"])
     .minimum(x, y), 2, (-1e3, 1e3)),
    ("abs_neg", lambda x: abs(-x), 1, (-1e3, 1e3)),
]


@pytest.mark.tpu
@pytest.mark.parametrize("name,fn,nargs,rng", CASES,
                         ids=[c[0] for c in CASES])
def test_elementwise_op(name, fn, nargs, rng):
    args = [_rand(lo=rng[0], hi=rng[1], seed=i + 1) for i in range(nargs)]
    got = _pallas_elementwise(fn, *args)
    want = fn(*args)
    nbad, maxerr = _feq(got, want)
    assert nbad == 0, f"{name}: {nbad} lanes differ, maxerr {maxerr}"


@pytest.mark.tpu
def test_quadric_roots_block():
    """The stable b-mixed root solver with D_EPS sorting, pallas vs jnp
    on the same device (tracer.cpp:4518-4623 semantics)."""
    import jax.numpy as jnp
    from quadray_tpu.ops.trace import D_EPS, T_EPS

    def roots(a, b, c):
        disc = b * b - a * c
        quad_ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        sgn_b = jnp.where(b >= 0.0, 1.0, -1.0)
        q = -(b + sgn_b * sq)
        b_pos = b > 0.0

        def root(num, den):
            nz = num == 0.0
            den = jnp.where(nz, 1.0, den)
            ok = den != 0.0
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 1e30), ok

        t1, ok1 = root(jnp.where(b_pos, q, c), jnp.where(b_pos, a, q))
        t2, ok2 = root(jnp.where(b_pos, c, q), jnp.where(b_pos, q, a))
        dmask = quad_ok & (disc < D_EPS)
        sgn_a = jnp.where(a >= 0.0, 1.0, -1.0)
        u = (t1 - t2) * sgn_a
        tdff = jnp.where(u >= 0.0, -0.5 * u - jnp.abs(T_EPS * t1),
                         0.0) * sgn_a
        tdff = jnp.where(dmask & ok1 & ok2, tdff, 0.0)
        return jnp.where(quad_ok & ok1, t1 + tdff, 1e30) \
            + 1e-3 * jnp.where(quad_ok & ok2, t2 - tdff, 1e30)

    a = _rand(lo=-2, hi=2, seed=10)
    b = _rand(lo=-3, hi=3, seed=11)
    # include near-zero determinants: c = (b^2 - eps)/a
    eps = _rand(lo=-1e-12, hi=1e-12, seed=12)
    c = (b * b - eps) / jnp.where(jnp.abs(a) < 1e-3, 1.0, a)
    got = _pallas_elementwise(roots, a, b, c)
    want = roots(a, b, c)
    nbad, maxerr = _feq(got, want, scale=8.0)
    assert nbad == 0, f"quadric roots: {nbad} lanes differ, max {maxerr}"


@pytest.mark.tpu
def test_fresnel_block():
    """Exact dielectric Fresnel + TIR transfer (tracer.cpp:3182-3424)."""
    import jax.numpy as jnp

    def fresnel(eta, dot):
        k = 1.0 - eta * eta + (eta * dot) ** 2
        tir = k < 0.0
        sq = jnp.sqrt(jnp.maximum(k, 0.0))
        den1 = eta * dot - sq
        den2 = dot - eta * sq
        rs = jnp.where(jnp.abs(den1) < 1e-30, 1.0,
                       (eta * dot + sq) / jnp.where(jnp.abs(den1) < 1e-30,
                                                    1.0, den1))
        rp = jnp.where(jnp.abs(den2) < 1e-30, 1.0,
                       (dot + eta * sq) / jnp.where(jnp.abs(den2) < 1e-30,
                                                    1.0, den2))
        F = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
        return jnp.where(tir, 1.0, F)

    eta = _rand(lo=0.5, hi=2.0, seed=20)
    dot = _rand(lo=-1.0, hi=-1e-3, seed=21)
    got = _pallas_elementwise(fresnel, eta, dot)
    want = fresnel(eta, dot)
    nbad, maxerr = _feq(got, want, scale=8.0)
    assert nbad == 0, f"fresnel: {nbad} lanes differ, max {maxerr}"


@pytest.mark.tpu
def test_specular_pow_block():
    """Square-and-multiply analog: exp(p*log(x)) vs jnp.power."""
    import jax.numpy as jnp
    x = _rand(lo=1e-6, hi=1.0, seed=30)
    p = _rand(lo=1.0, hi=64.0, seed=31)
    fn = lambda x, p: jnp.exp(p * jnp.log(x))
    got = _pallas_elementwise(fn, x, p)
    # same composition through XLA on the same device: isolates Mosaic's
    # exp/log codegen (jnp.power uses a different polynomial and differs
    # by ~1e-4 relative — an algorithm difference, not codegen drift)
    want = fn(x, p)
    nbad, maxerr = _feq(got, want, scale=64.0)
    assert nbad == 0, f"pow: {nbad} lanes differ, max {maxerr}"


@pytest.mark.tpu
def test_lane_gather_block():
    """Same-shape lane gather (texture fetch building block)."""
    import jax.numpy as jnp
    rs = np.random.RandomState(40)
    tab = jnp.asarray(rs.randn(8, 128).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, 128, (8, 128)).astype(np.int32))
    got = _pallas_elementwise(
        lambda t, i: jnp.take_along_axis(t, i, axis=1), tab, idx)
    want = jnp.take_along_axis(tab, idx, axis=1)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.tpu
def test_kernel_helpers_root_sdiv():
    """The kernel's ACTUAL _root/_sdiv helpers (not re-implementations),
    lowered by Mosaic vs run through XLA on the same device."""
    from quadray_tpu.ops.pallas_kernel import _root, _sdiv

    num = _rand(lo=-4, hi=4, seed=50)
    den = _rand(lo=-4, hi=4, seed=51)
    # force exact zeros into both operands (the nan-root rule's domain)
    num = num.at[0, :8].set(0.0)
    den = den.at[1, :8].set(0.0)

    def f(num, den):
        r, ok = _root(num, den)
        return r + 1e3 * ok.astype(np.float32) + 1e-3 * _sdiv(num, den)

    got = _pallas_elementwise(f, num, den)
    want = f(num, den)
    nbad, maxerr = _feq(got, want, scale=8.0)
    assert nbad == 0, f"_root/_sdiv: {nbad} lanes differ, max {maxerr}"


def _random_rays(n, seed, spread=6.0):
    import jax.numpy as jnp
    rs = np.random.RandomState(seed)
    org = rs.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.mark.tpu
@pytest.mark.parametrize("scene,why", [
    ("test01", "boolean clip program with ENTER/LEAVE accum"),
    ("test10", "custom clip programs"),
    ("test17", "branch stack push/pop (both Fresnel branches fire)"),
])
def test_kernel_vs_jnp_random_rays(scene, why):
    """The megakernel AS WRITTEN (its clip_program fori loops, i32 mask
    carries, SMEM addressing, branch stack) against the jnp tracer on
    arbitrary non-camera rays — op-level conformance on the real code
    rather than re-implemented formulas. A Mosaic regression in any of
    those blocks shows up here as per-ray radiance drift."""
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.trace import TraceConfig, trace_rays
    from quadray_tpu.ops.pallas_kernel import trace_rays_pallas

    sd = load_scene(scene)
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org, dirs = _random_rays(2048, seed=hash(scene) % 1000)
    t_min = jnp.zeros((2048,), np.float32)
    cfg = TraceConfig(stack=4, max_segments=12)
    got = np.asarray(trace_rays_pallas(sc, org, dirs, t_min, cfg))
    want = np.asarray(trace_rays(sc, org, dirs, t_min, cfg))
    # fp association differs slightly between Mosaic and XLA scheduling;
    # the bound is far below 1/255 (a u8 pixel step)
    d = np.abs(got - want)
    frac_bad = float((d > 2e-3).mean())
    assert frac_bad < 0.002, (
        f"{scene} ({why}): {frac_bad:.4%} of lanes differ by >2e-3, "
        f"max {d.max():.3e}")


@pytest.mark.tpu
def test_two_round_retirement_matches_monolithic():
    """The in-place block-retirement path (emit state -> active-block
    list -> dynamic-grid resume) must reproduce the monolithic kernel
    (measured exact on hardware for test14/demo03)."""
    import jax.numpy as jnp
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.ops.trace import TraceConfig
    from quadray_tpu.ops.pallas_kernel import (
        trace_rays_pallas, trace_rays_pallas_rounds)
    from quadray_tpu.ops.rays import camera_rays

    sd = load_scene("test14")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, 400, 240, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
    cfg = TraceConfig(stack=6)
    mono = np.asarray(trace_rays_pallas(sc, org, dirs, t_min, cfg))
    rnds = np.asarray(trace_rays_pallas_rounds(sc, org, dirs, t_min, cfg,
                                               k1=3))
    assert np.abs(mono - rnds).max() < 1e-6
