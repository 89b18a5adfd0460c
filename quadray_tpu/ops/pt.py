"""Progressive path tracer — PT mode (reference: tracer.cpp:2374-2703,
5176-5215; seeds engine.cpp:3652-3685).

The reference's experimental path tracer extends the Whitted kernel with a
per-lane LCG PRNG, tent-filtered sub-pixel jitter, cosine-hemisphere
diffuse bounces, probabilistic Fresnel splits and a progressive running
average over frames. Here it is the same SPLIT-TREE walk (see trace_pt)
over the intersect/material machinery of ops/trace.py; the engine
accumulates passes into persistent color planes (the pseed/ptr_r/g/b
analog, engine.cpp:2875-2899).

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


PT_SHALLOW = 2    # top levels where BOTH Fresnel branches are followed
#                   (the reference skips the split while inf_DEPTH >
#                   RT_STACK_DEPTH-2, tracer.cpp:3430-3433)
PT_STACK = 6      # pending-sibling stack slots per lane: the top-2
#                   both-branch levels push at most 2 each, and deep
#                   nodes push only for mixed diffuse+specular
#                   materials (diffuse-only walls and spec-only glass
#                   never do), so 6 covers the reference's depth-10
#                   trees with slack


@partial(jax.jit, static_argnames=("cfg",))
def trace_pt(sc: SceneArrays, org, dirs, t_min, seeds,
             cfg: TraceConfig = TraceConfig()):
    """One path-traced sample per lane via the reference's SPLIT-TREE
    walk (PT mode of render0). Per hit (tracer.cpp:2340-2703,
    3182-3554):

      * emission is gathered (smallpt emitter);
      * DIFFUSE-prop surfaces spawn one cosine-hemisphere child
        weighted tex*l_dff, Russian-rouletted below the split depth
        (PT_SPLIT_DEPTH, tracer.cpp:2352-2376);
      * transparent surfaces follow BOTH Fresnel branches (weights
        c_rfl / c_trn) at the top PT_SHALLOW levels, and below that a
        defensively SAMPLED single branch with probability
        q = 0.25 + 0.5*c_rfl/(c_rfl+c_trn) and weight c/q
        (RT_FEAT_PT_SPLIT_FRESNEL, tracer.cpp:3428-3466);
      * opaque reflective surfaces follow the mirror branch
        deterministically (the RF section has no PT split).

    The reference walks this tree depth-first through its context
    stack; here pending siblings wait on a bounded per-lane stack
    (children beyond PT_STACK slots are dropped — unreachable for the
    reference's own depth-10 trees). Returns (radiance (N,3), seeds).
    """
    from quadray_tpu.scene.compile import (PROP_DIFFUSE, PROP_OPAQUE)
    N = dirs.shape[0]
    SD = PT_STACK
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))

    state = dict(
        org=org.astype(F32), dir=dirs.astype(F32),
        thr=jnp.ones((N, 3), F32),
        tmin=t_min.astype(F32),
        osrf=jnp.full((N,), -1, I32), oside=jnp.ones((N,), I32),
        thru=jnp.zeros((N,), jnp.bool_),
        dep=jnp.zeros((N,), I32),
        active=jnp.ones((N,), jnp.bool_),
        acc=jnp.zeros((N, 3), F32),
        seed=seeds,
        sp=jnp.zeros((N,), I32),
        st_org=jnp.zeros((N, SD, 3), F32),
        st_dir=jnp.zeros((N, SD, 3), F32),
        st_thr=jnp.zeros((N, SD, 3), F32),
        st_dep=jnp.zeros((N, SD), I32),
        st_osrf=jnp.zeros((N, SD), I32),
        st_oside=jnp.zeros((N, SD), I32),
        st_thru=jnp.zeros((N, SD), I32),
        it=jnp.zeros((), I32),
    )
    slot_ids = jnp.arange(SD, dtype=I32)[None, :]

    def cond(st):
        # tree-node cap: a depth-D path sees D+1 hits; the split tree
        # multiplies node count by < 4 in practice
        return ((jnp.any(st["active"]) | jnp.any(st["sp"] > 0))
                & (st["it"] < 6 * (cfg.depth + 1)))

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

        c_rfl, c_trn, refr_dir, _ = fresnel_terms(
            sc, midx, st["dir"], h["n"])

        # fixed per-hit draw order (must match the kernel PT):
        # u1, u2 hemisphere; u_rr roulette; u_split Fresnel choice
        seed, u1 = lcg_uniform(st["seed"])
        seed, u2 = lcg_uniform(seed)
        seed, u_rr = lcg_uniform(seed)
        seed, u_split = lcg_uniform(seed)

        emissive = (props & PROP_LIGHT) != 0
        can_rec = hit & ~emissive & (st["dep"] < cfg.depth)

        # Fresnel branch weights (TR section; opaque mirrors take the
        # RF section: deterministic, never split)
        opaque = (props & PROP_OPAQUE) != 0
        shallow = st["dep"] < PT_SHALLOW
        s_rt = jnp.maximum(c_rfl + c_trn, 1e-30)
        qd = 0.25 + 0.5 * c_rfl / s_rt
        chose_rfl = u_split < qd
        w_rfl = jnp.where(shallow, c_rfl,
                          jnp.where(chose_rfl, c_rfl / qd, 0.0))
        w_trn = jnp.where(
            shallow, c_trn,
            jnp.where(chose_rfl, 0.0,
                      c_trn / jnp.maximum(1.0 - qd, 1e-30)))
        w_rfl = jnp.where(opaque, c_rfl, w_rfl)
        w_trn = jnp.where(opaque, 0.0, w_trn)

        # diffuse child: weight tex*l_dff, RR below split depth
        deep_rr = st["dep"] >= (cfg.depth - 5)
        q = jnp.clip(jnp.max(tex, -1), 1e-4, 1.0)
        rr_kill = deep_rr & (u_rr >= q)
        # reciprocal multiply (not division) to stay bit-compatible
        # with the kernel PT's dm_* computation
        dq = jnp.where(deep_rr, 1.0 / q, 1.0)
        dif_mod = tex * sc.m_dff[midx][:, None] * dq[:, None]
        have_dif = can_rec & ((props & PROP_DIFFUSE) != 0) & ~rr_kill
        have_trn = can_rec & (w_trn > 0.0)
        have_rfl = can_rec & (w_rfl > 0.0)

        ddotn = jnp.sum(st["dir"] * h["n"], -1)
        refl_dir = st["dir"] - 2.0 * ddotn[:, None] * h["n"]
        diff_dir = _cosine_hemisphere(h["n"], u1, u2)

        # continue with the diffuse child (the reference's PT section
        # recurses before TR/RF); pending siblings pushed rfl-then-trn
        # so the transmit child pops first
        sp = st["sp"]
        st_org, st_dir, st_thr = st["st_org"], st["st_dir"], st["st_thr"]
        st_dep, st_osrf = st["st_dep"], st["st_osrf"]
        st_oside, st_thru = st["st_oside"], st["st_thru"]

        def push(pred, pdir, pthr, pthru, sp, st_org, st_dir, st_thr,
                 st_dep, st_osrf, st_oside, st_thru):
            ok = pred & (sp < SD)
            oh = (slot_ids == sp[:, None]) & ok[:, None]
            oh3 = oh[:, :, None]
            st_org = jnp.where(oh3, h["x"][:, None, :], st_org)
            st_dir = jnp.where(oh3, pdir[:, None, :], st_dir)
            st_thr = jnp.where(oh3, pthr[:, None, :], st_thr)
            st_dep = jnp.where(oh, (st["dep"] + 1)[:, None], st_dep)
            st_osrf = jnp.where(oh, h["srf"][:, None], st_osrf)
            st_oside = jnp.where(oh, h["side"][:, None], st_oside)
            st_thru = jnp.where(oh, jnp.int32(pthru)[None, None],
                                st_thru)
            return sp + ok, (st_org, st_dir, st_thr, st_dep, st_osrf,
                             st_oside, st_thru)

        cont_dif = have_dif
        cont_trn = ~cont_dif & have_trn
        cont_rfl = ~cont_dif & ~cont_trn & have_rfl
        # push children NOT taken as the continuation
        sp, stk = push(have_rfl & ~cont_rfl, refl_dir,
                       st["thr"] * w_rfl[:, None], 0, sp, st_org,
                       st_dir, st_thr, st_dep, st_osrf, st_oside,
                       st_thru)
        (st_org, st_dir, st_thr, st_dep, st_osrf, st_oside,
         st_thru) = stk
        sp, stk = push(have_trn & ~cont_trn, refr_dir,
                       st["thr"] * w_trn[:, None], 1, sp, st_org,
                       st_dir, st_thr, st_dep, st_osrf, st_oside,
                       st_thru)
        (st_org, st_dir, st_thr, st_dep, st_osrf, st_oside,
         st_thru) = stk

        cont = cont_dif | cont_trn | cont_rfl
        n_dir = jnp.where(cont_dif[:, None], diff_dir,
                          jnp.where(cont_trn[:, None], refr_dir,
                                    refl_dir))
        n_thr = jnp.where(
            cont_dif[:, None], st["thr"] * dif_mod,
            jnp.where(cont_trn[:, None], st["thr"] * w_trn[:, None],
                      st["thr"] * w_rfl[:, None]))

        # lanes whose node finished pop a pending sibling
        can_pop = ~cont & (sp > 0)
        psp = jnp.maximum(sp - 1, 0)
        ohp = slot_ids == psp[:, None]

        def popf(stf):
            return jnp.sum(jnp.where(
                ohp[:, :, None] if stf.ndim == 3 else ohp,
                stf, 0), axis=1)

        p_org, p_dir, p_thr = popf(st_org), popf(st_dir), popf(st_thr)
        p_dep, p_osrf = popf(st_dep), popf(st_osrf)
        p_oside, p_thru = popf(st_oside), popf(st_thru)

        w2 = lambda c_, a_, b_: jnp.where(c_[:, None], a_, b_)
        return dict(
            org=w2(cont, h["x"], w2(can_pop, p_org, st["org"])),
            dir=w2(cont, n_dir, w2(can_pop, p_dir, st["dir"])),
            thr=w2(cont, n_thr, w2(can_pop, p_thr, st["thr"])),
            tmin=jnp.where(cont | can_pop, 0.0, st["tmin"]),
            osrf=jnp.where(cont, h["srf"],
                           jnp.where(can_pop, p_osrf, st["osrf"])),
            oside=jnp.where(cont, h["side"],
                            jnp.where(can_pop, p_oside, st["oside"])),
            thru=jnp.where(cont, cont_trn,
                           jnp.where(can_pop, p_thru != 0, st["thru"])),
            dep=jnp.where(cont, st["dep"] + 1,
                          jnp.where(can_pop, p_dep, st["dep"])),
            active=cont | can_pop,
            acc=acc,
            seed=seed,
            sp=jnp.where(can_pop, psp, sp),
            st_org=st_org, st_dir=st_dir, st_thr=st_thr,
            st_dep=st_dep, st_osrf=st_osrf, st_oside=st_oside,
            st_thru=st_thru,
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
