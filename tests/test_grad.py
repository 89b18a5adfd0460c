"""Gradient correctness: analytic pixel gradients vs finite differences.

The differentiable-renderer validation demanded by SURVEY.md §7.2 M4 /
BASELINE.json's north star ("analytic pixel gradients allclose to finite
differences"). Hard visibility makes the image only piecewise-smooth in
scene parameters, so gradients are validated the standard
inverse-rendering way:

  * the loss is restricted to INTERIOR pixels — pixels whose hit
    assignment (surface id at every path segment sampled via the primary
    hit id here) is identical at theta-delta, theta, theta+delta. Edge
    pixels, where visibility flips and the true derivative has a Dirac
    term analytic AD cannot see, are masked out of both sides of the
    comparison. This is the documented edge-handling contract of
    `trace_rays_diff`.
  * central finite differences of the SAME renderer at the same fp32
    precision; the comparison is directional (dot(grad, v) vs FD along
    v) which is robust to fp32 quantization noise summed over pixels.

Covered parameters (>= 5 as per the round-3 plan): sphere world position
(s_pos), quadric coefficient scale a.k.a. radius^2 (s_sciw), material
color (m_col), diffuse weight (m_dff), light position (l_pos), light
color (l_col), and the camera-facing ambient (amb_col).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadray_tpu.models.scenes.loader import load_scene
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops.rays import camera_rays
from quadray_tpu.ops.trace import TraceConfig, trace_rays_diff, intersect

F32 = jnp.float32
W, H = 96, 64
CFG = TraceConfig(depth=2, max_segments=4, stack=2)


@pytest.fixture(scope="module")
def setup():
    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, W, H, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, F32)
    return sc, org, dirs, t_min


def path_signature(sc, org, dirs, t_min):
    """Discrete path state per pixel: primary hit id + per-light shadow
    bits + reflected-segment hit id + its shadow bits. Pixels where ANY
    of these flips under a parameter perturbation sit on a visibility
    discontinuity (hit silhouette or hard-shadow edge) whose derivative
    is a Dirac term analytic AD cannot represent — they are excluded
    from the comparison (the documented edge handling)."""
    from quadray_tpu.ops.trace import material_index, fresnel_terms

    n = org.shape[0]
    zeros = jnp.zeros((n,), F32)
    ones_t = jnp.ones((n,), F32)

    def segment(o, d, tmn, osrf, oside, thru):
        h = intersect(sc, o, d, tmn, jnp.full((n,), 1e30, F32),
                      osrf, oside, thru)
        sig = h["srf"] + 1
        for li in range(sc.l_pos.shape[0]):
            lvec = sc.l_pos[li][None, :] - h["x"]
            occ = intersect(sc, h["x"], lvec, zeros, ones_t,
                            h["srf"], h["side"],
                            jnp.zeros((n,), bool), shadow=True)
            sig = sig * 2 + occ.astype(jnp.int32)
        return h, sig

    h1, sig1 = segment(org, dirs, t_min,
                       jnp.full((n,), -1, jnp.int32),
                       jnp.ones((n,), jnp.int32),
                       jnp.zeros((n,), bool))
    # reflected continuation (test01-class scenes have no refraction)
    ddotn = jnp.sum(dirs * h1["n"], -1)
    refl = dirs - 2.0 * ddotn[:, None] * h1["n"]
    _, sig2 = segment(h1["x"], refl, zeros, h1["srf"], h1["side"],
                      jnp.zeros((n,), bool))
    return np.asarray(sig1 * 100000 + sig2)


def masked_loss(sc, org, dirs, t_min, mask):
    cols = trace_rays_diff(sc, org, dirs, t_min, CFG)
    return jnp.sum(cols * mask[:, None])


def check_param(setup, field, direction, delta, rtol):
    """Directional derivative of the masked pixel sum along `direction`
    in SceneArrays.<field>: jax.grad vs central finite differences."""
    sc, org, dirs, t_min = setup
    base = getattr(sc, field)
    v = jnp.broadcast_to(jnp.asarray(direction, F32), base.shape)

    def at(eps):
        return sc.replace(**{field: base + eps * v})

    # interior-pixel mask: discrete path state stable across +-delta
    ids0 = path_signature(sc, org, dirs, t_min)
    idsp = path_signature(at(delta), org, dirs, t_min)
    idsm = path_signature(at(-delta), org, dirs, t_min)
    mask = jnp.asarray((ids0 == idsp) & (ids0 == idsm), F32)
    assert float(mask.sum()) > 0.5 * mask.shape[0], \
        f"{field}: interior mask should keep most pixels"

    def loss(eps):
        return masked_loss(at(eps), org, dirs, t_min, mask)

    g = jax.grad(loss)(jnp.asarray(0.0, F32))
    fd = (loss(jnp.asarray(delta, F32))
          - loss(jnp.asarray(-delta, F32))) / (2.0 * delta)
    g, fd = float(g), float(fd)
    assert np.isfinite(g) and np.isfinite(fd)
    scale = max(abs(g), abs(fd))
    assert scale > 1e-6, f"{field}: derivative unexpectedly zero"
    assert abs(g - fd) <= rtol * scale, \
        f"{field}: grad {g} vs FD {fd} (rel err {abs(g - fd) / scale:.4f})"


def test_grad_surface_position(setup):
    sc = setup[0]
    d = np.zeros(sc.s_pos.shape, np.float32)
    d[1] = (0.3, 0.2, 0.1)  # move one surface only
    check_param(setup, "s_pos", d, delta=2e-3, rtol=0.05)


def test_grad_quadric_constant(setup):
    # sciw is r^2 for spheres/cylinders: the "radius" parameter
    sc = setup[0]
    d = np.zeros(sc.s_sciw.shape, np.float32)
    d[1] = 1.0
    check_param(setup, "s_sciw", d, delta=2e-3, rtol=0.05)


def test_grad_material_color(setup):
    sc = setup[0]
    d = np.zeros(sc.m_col.shape, np.float32)
    d[:, :] = [0.7, 0.2, 0.4]
    check_param(setup, "m_col", d, delta=1e-3, rtol=0.05)


def test_grad_material_diffuse(setup):
    sc = setup[0]
    d = np.ones(sc.m_dff.shape, np.float32)
    check_param(setup, "m_dff", d, delta=1e-3, rtol=0.05)


def test_grad_light_position(setup):
    sc = setup[0]
    d = np.zeros(sc.l_pos.shape, np.float32)
    d[0] = (0.5, -0.3, 0.2)
    check_param(setup, "l_pos", d, delta=2e-3, rtol=0.05)


def test_grad_light_color(setup):
    sc = setup[0]
    d = np.ones(sc.l_col.shape, np.float32) * 0.5
    check_param(setup, "l_col", d, delta=1e-3, rtol=0.05)


def test_grad_ambient(setup):
    sc = setup[0]
    d = np.ones(sc.amb_col.shape, np.float32)
    check_param(setup, "amb_col", d, delta=1e-3, rtol=0.05)


def test_train_step_reduces_loss():
    """End-to-end inverse rendering: a few optimizer steps on a perturbed
    scene reduce the pixel loss toward the clean render (the
    DIFFERENTIABLE_FIELDS contract actually optimizes)."""
    import jax as _jax
    from quadray_tpu.parallel.mesh import ray_mesh
    from quadray_tpu.parallel.train import (
        make_train_step, extract_params)
    from quadray_tpu.ops.trace import trace_rays

    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root, opts=S.OPTS_FULL & ~sd.opts))
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, W, H, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, F32)
    target = jnp.clip(trace_rays(sc, org, dirs, t_min, CFG), 0.0, 1.0)

    # perturb material colors; recover by gradient descent
    sc_pert = sc.replace(m_col=jnp.clip(sc.m_col + 0.2, 0.0, 1.0))
    mesh = ray_mesh(_jax.devices()[:1])
    step, opt_init = make_train_step(mesh, W, H, cfg=CFG, lr=5e-2,
                                     fields=("m_col",))
    params = extract_params(sc_pert, ("m_col",))
    opt_state = opt_init(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, sc_pert, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses}"
