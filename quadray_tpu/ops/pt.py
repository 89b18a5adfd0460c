"""Progressive path tracer — PT mode (reference: tracer.cpp:2374-2703,
5176-5215; seeds engine.cpp:3652-3685).

The reference's experimental path tracer extends the Whitted kernel with a
per-lane LCG PRNG, tent-filtered sub-pixel jitter, cosine-hemisphere
diffuse bounces, probabilistic Fresnel splits and a progressive running
average over frames. Here it is a separate bounded-depth sampling loop
(one continuation per bounce — no branch stack needed) over the same
intersect/material machinery as ops/trace.py; the engine accumulates
passes into persistent color planes (the pseed/ptr_r/g/b analog,
engine.cpp:2875-2899).

PRNG: 32-bit LCG x <- x*214013 + 2531011 (tracer.h:48-53) — same
constants as the reference; streams differ (seed plane layout is ours).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quadray_tpu.scene.compile import (
    SceneArrays, PROP_LIGHT, PROP_GAMMA)
from quadray_tpu.ops.trace import (
    TraceConfig, intersect, material_index, texture_color, fresnel_terms,
    BIG)

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

LCG_A = jnp.uint32(214013)
LCG_C = jnp.uint32(2531011)


def lcg_next(seed):
    return seed * LCG_A + LCG_C


def lcg_uniform(seed):
    """Advance seed; return (new_seed, uniform in [0,1))."""
    seed = lcg_next(seed)
    u = (seed >> jnp.uint32(8)).astype(F32) * (1.0 / 16777216.0)
    return seed, u


def tent_jitter(u):
    """smallpt-style tent filter over [-1, 1] (tracer.cpp:1218-1285)."""
    r = 2.0 * u
    return jnp.where(r < 1.0, jnp.sqrt(jnp.maximum(r, 1e-12)) - 1.0,
                     1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 1e-12)))


def init_seeds(n: int, frame_seed: int = 1):
    """Per-lane decorrelated seeds (reset_pseed analog)."""
    lane = jnp.arange(n, dtype=U32)
    s = lane * jnp.uint32(2654435761) + jnp.uint32(frame_seed)
    for _ in range(3):
        s = lcg_next(s)
    return s


def _cosine_hemisphere(n, u1, u2):
    """Cosine-weighted direction about unit normal n (N,3); u1/u2 (N,)."""
    # orthonormal basis (tracer.cpp:2398-2534 builds it from normal/ray
    # cross products; any stable basis gives the same distribution)
    a = jnp.where(jnp.abs(n[:, 2:3]) < 0.9,
                  jnp.array([0.0, 0.0, 1.0], F32)[None, :],
                  jnp.array([1.0, 0.0, 0.0], F32)[None, :])
    t1 = jnp.cross(a, n)
    t1 = t1 * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(t1 * t1, -1, keepdims=True), 1e-20))
    t2 = jnp.cross(n, t1)
    r = jnp.sqrt(jnp.maximum(u1, 0.0))[:, None]
    phi = (2.0 * jnp.pi) * u2
    x = r * jnp.cos(phi)[:, None]
    y = r * jnp.sin(phi)[:, None]
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))[:, None]
    return t1 * x + t2 * y + n * z


@partial(jax.jit, static_argnames=("cfg",))
def trace_pt(sc: SceneArrays, org, dirs, t_min, seeds,
             cfg: TraceConfig = TraceConfig()):
    """One path-traced sample per lane. Returns (radiance (N,3), seeds)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))

    state = dict(
        org=org.astype(F32), dir=dirs.astype(F32),
        thr=jnp.ones((N, 3), F32),
        tmin=t_min.astype(F32),
        osrf=jnp.full((N,), -1, I32), oside=jnp.ones((N,), I32),
        thru=jnp.zeros((N,), jnp.bool_),
        active=jnp.ones((N,), jnp.bool_),
        acc=jnp.zeros((N, 3), F32),
        seed=seeds,
        it=jnp.zeros((), I32),
    )

    def cond(st):
        # cfg.depth counts RECURSIONS like inf_DEPTH (decremented at each
        # ENTER, stop at 0): the primary hit is free, so a depth-10 path
        # sees 11 hits (tracer.cpp:2548-2560)
        return jnp.any(st["active"]) & (st["it"] < cfg.depth + 1)

    def body(st):
        act = st["active"]
        h = intersect(sc, st["org"], st["dir"], st["tmin"],
                      jnp.full((N,), BIG), st["osrf"], st["oside"],
                      st["thru"])
        hit = h["hit"] & act
        midx = material_index(sc, h["srf"], h["side"])
        props = sc.m_props[midx]
        tex = texture_color(sc, midx, h["p"])

        # emission (array-accumulated light radiance, the smallpt emitter)
        sside = jnp.where(h["side"] > 0, 0, 1)
        emis = sc.s_emis[jnp.maximum(h["srf"], 0), sside]
        acc = st["acc"] + jnp.where(hit[:, None], st["thr"] * emis, 0.0)

        # sampling weights
        c_rfl, c_trn, refr_dir, _ = fresnel_terms(
            sc, midx, st["dir"], h["n"])
        p_dif = jnp.maximum(1.0 - c_rfl - c_trn, 0.0)

        seed, u_branch = lcg_uniform(st["seed"])
        seed, u1 = lcg_uniform(seed)
        seed, u2 = lcg_uniform(seed)

        pick_rfl = u_branch < c_rfl
        pick_trn = (~pick_rfl) & (u_branch < c_rfl + c_trn)
        # diffuse gather requires the DIFFUSE prop (CHECK_PROP(PT_mix,
        # RT_PROP_DIFFUSE), tracer.cpp:2350) — rfl+trn >= 1 clears it
        # (e.g. the metal mirror), Fresnel may still leave p_dif > 0
        from quadray_tpu.scene.compile import PROP_DIFFUSE
        pick_dif = (~pick_rfl & ~pick_trn & (p_dif > 0.0)
                    & ((props & PROP_DIFFUSE) != 0))

        ddotn = jnp.sum(st["dir"] * h["n"], -1)
        refl_dir = st["dir"] - 2.0 * ddotn[:, None] * h["n"]
        diff_dir = _cosine_hemisphere(h["n"], u1, u2)

        n_dir = jnp.where(pick_rfl[:, None], refl_dir,
                          jnp.where(pick_trn[:, None], refr_dir, diff_dir))
        # Russian roulette on the DIFFUSE branch only, below split depth
        # (PT_SPLIT_DEPTH, tracer.cpp:2352-2376): survive with
        # probability q = max texture channel, survivors re-weighted by
        # tex/q; specular/glass branches are never rouletted
        deep = st["it"] >= (cfg.depth - 5)
        q = jnp.clip(jnp.max(tex, -1), 1e-4, 1.0)
        seed, u_rr = lcg_uniform(seed)
        rr_kill = deep & pick_dif & (u_rr >= q)
        # diffuse bounce modulates by texture * l_dff
        # (tracer.cpp:2546-2608, PT_ret mat_L_DFF * ctx_TEX)
        dif_mod = tex * sc.m_dff[midx][:, None]
        dif_mod = jnp.where((deep & pick_dif)[:, None],
                            dif_mod / q[:, None], dif_mod)
        n_thr = jnp.where(pick_dif[:, None], st["thr"] * dif_mod,
                          st["thr"])
        # emissive surfaces terminate the path (light sampled on hit)
        emissive = (props & PROP_LIGHT) != 0
        cont = hit & ~emissive & (pick_rfl | pick_trn | pick_dif)
        cont &= ~rr_kill

        return dict(
            org=jnp.where(cont[:, None], h["x"], st["org"]),
            dir=jnp.where(cont[:, None], n_dir, st["dir"]),
            thr=jnp.where(cont[:, None], n_thr, st["thr"]),
            tmin=jnp.where(cont, 0.0, st["tmin"]),
            osrf=jnp.where(cont, h["srf"], st["osrf"]),
            oside=jnp.where(cont, h["side"], st["oside"]),
            thru=cont & pick_trn,
            active=cont,
            acc=acc,
            seed=seed,
            it=st["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["acc"], out["seed"]


def pt_camera_rays(sc: SceneArrays, width: int, height: int, seeds):
    """Primary rays with per-sample tent-filter jitter."""
    from quadray_tpu.ops.rays import camera_rays
    n = width * height
    seeds, ux = lcg_uniform(seeds)
    seeds, uy = lcg_uniform(seeds)
    jx = tent_jitter(ux) * 0.5
    jy = tent_jitter(uy) * 0.5
    xs = jnp.tile(jnp.arange(width, dtype=F32), height)
    ys = jnp.repeat(jnp.arange(height, dtype=F32), width)
    factor = 1.0 / width
    aspect = height / width
    u = (xs + 0.5 + jx) * factor - 0.5
    v = (ys + 0.5 + jy) * factor - 0.5 * aspect
    dirs = (sc.cam_nrm[None, :] * sc.cam_pov
            + sc.cam_hor[None, :] * u[:, None]
            + sc.cam_ver[None, :] * v[:, None])
    return sc.cam_pos, dirs, seeds
