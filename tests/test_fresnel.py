"""Fresnel curve validation vs the reference's own closed forms.

The reference ships C reference implementations of every Fresnel
variant for its `-z` plot mode (RT_PLOT_FUNCS_REF, tracer.cpp:5480-5700,
"inspired by memo-on-fresnel-equations by S. Lagarde"); these tests
transcribe those closed forms and require our production functions to
match them over the full incidence sweep the reference plots
(cos = -cos(1.57 i / N)), discharging the plotter-validation item.
"""

import numpy as np

import jax.numpy as jnp

from quadray_tpu.ops.trace import (
    fresnel_metal_fast, fresnel_metal_slow, fresnel_schlick, _safe_div)

N = 800
S = 1.57 / N
DOT = jnp.asarray(-np.cos(S * np.arange(N, dtype=np.float32)))


def closed_metal_fast(cos_i, eta, k2):
    """plot_fresnel_metal_fast C reference (tracer.cpp:5619-5633)."""
    c2 = cos_i * cos_i
    two = 2.0 * eta * cos_i
    t0 = eta * eta + k2
    t1 = t0 * c2
    rs = (t0 - two + c2) / (t0 + two + c2)
    rp = (t1 - two + 1.0) / (t1 + two + 1.0)
    return 0.5 * (rp + rs)


def closed_metal_slow(cos_i, eta, k2):
    """plot_fresnel_metal_slow C reference (tracer.cpp:5680-5700)."""
    c2 = cos_i * cos_i
    s2 = 1.0 - c2
    t0 = eta * eta - k2 - s2
    a2b2 = np.sqrt(t0 * t0 + 4.0 * eta * eta * k2)
    t1 = a2b2 + c2
    a = np.sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * cos_i
    rs = (t1 - t2) / (t1 + t2)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / (t3 + t4)
    return 0.5 * (rp + rs)


def test_metal_fast_matches_reference_closed_form():
    eta, k = 0.27, 2.77          # gold, the reference's plot constants
    ours = np.asarray(fresnel_metal_fast(DOT, jnp.float32(eta),
                                         jnp.float32(k * k)))
    ref = closed_metal_fast(-np.asarray(DOT), eta, k * k)
    np.testing.assert_allclose(ours, ref, rtol=2e-6, atol=2e-6)


def test_metal_slow_matches_reference_closed_form():
    eta, k = 0.27, 2.77
    ours = np.asarray(fresnel_metal_slow(DOT, jnp.float32(eta),
                                         jnp.float32(k * k)))
    ref = closed_metal_slow(-np.asarray(DOT), eta, k * k)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_metal_fast_vs_slow_agree():
    """The fast approximation tracks the exact conductor formula (the
    reference's two build variants must describe the same material)."""
    eta, k = 0.27, 2.77
    fast = np.asarray(fresnel_metal_fast(DOT, jnp.float32(eta),
                                         jnp.float32(k * k)))
    slow = np.asarray(fresnel_metal_slow(DOT, jnp.float32(eta),
                                         jnp.float32(k * k)))
    assert np.max(np.abs(fast - slow)) < 0.05
    # both rise to ~1 at grazing incidence
    assert fast[-1] > 0.98 and slow[-1] > 0.98


def test_dielectric_and_schlick():
    """Exact dielectric endpoints: R0 = ((1-n)/(1+n))^2 at normal
    incidence, -> 1 at grazing; Schlick agrees with exact to ~1%."""
    eta = jnp.float32(1.0 / 1.5)
    k = 1.0 - eta * eta + (eta * DOT) ** 2
    sq = jnp.sqrt(jnp.maximum(k, 0.0))
    rs = _safe_div(eta * DOT + sq, eta * DOT - sq, 1.0)
    rp = _safe_div(DOT + eta * sq, DOT - eta * sq, 1.0)
    exact = np.asarray(0.5 * (rs * rs + rp * rp))
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    assert abs(exact[0] - r0) < 1e-4
    assert exact[-1] > 0.95
    schl = np.asarray(fresnel_schlick(DOT, eta, sq))
    # "low precision Fresnel" (tracer.cpp:66 comment): Schlick deviates
    # up to ~3.6% from the exact form near grazing for eta = 1/1.5
    assert np.max(np.abs(schl - exact)) < 0.04
    assert abs(schl[0] - r0) < 1e-4


def test_plotter_app_writes_curves(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import importlib
    mod = importlib.import_module("apps.plot_fresnel")
    mod.main()
    import os
    assert os.path.exists("dump/plot_fresnel_metal_fast.bmp")
    assert os.path.exists("dump/plot_gamma.bmp")
