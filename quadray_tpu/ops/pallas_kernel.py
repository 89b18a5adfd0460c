"""Pallas TPU megakernel: the whole Whitted trace in one kernel.

The TPU re-design of render0 (tracer.cpp:1081-5405): where the reference
keeps 4-16 rays in SIMD registers and walks pointer lists, this kernel
keeps a (SUB, 128) tile of rays on-chip, loops surfaces with per-surface
scalars prefetched to SMEM (fori_loop, dynamic scalar reads — the analog
of the reference's Rebx surface-pointer walk), and runs the iterative
branch-stack Whitted loop with semantics IDENTICAL to ops/trace.py (the
differentially-tested reference implementation): one HBM read of the rays
and one write of the colors per block.

Root semantics ported 1:1 from ops/trace.py (itself matching
tracer.cpp:4378-4623):
  * stable b-mixed Vieta roots with the nan-root rule (zero numerator ->
    root 0; zero denominator -> invalid),
  * structural sides (slot a = outer/entering, slot b = inner/leaving;
    planes take the ray-vs-K sign),
  * two-plane degenerate determinant in exact factored form,
  * near-zero-determinant root sorting with D_EPS/T_EPS,
  * conic-singularity apex adjustment of the clip/normal point.

VMEM budget: the while-loop carry holds ~18 ray tiles plus a branch stack
of cfg.stack x 12 (SUB, 128) f32 tiles; at SUB=64, stack=10 that is
~4.6 MB before temporaries (v5e VMEM ~64 MB/core, but Mosaic reserves
most of it for spills). trace_rays_auto falls back to the jnp path if
Mosaic fails to compile.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadray_tpu.scene.compile import (
    SceneArrays, PROP_LIGHT, PROP_METAL, PROP_OPAQUE, PROP_REFRACT,
    PROP_DIFFUSE, PROP_SPECULAR, PROP_TEXTURE, PROP_FRESNEL, PROP_TRANSP,
    PROP_GAMMA, CLIP_SURF, CLIP_ENTER, CLIP_LEAVE)
from quadray_tpu.ops.trace import TraceConfig, D_EPS, T_EPS

F32 = jnp.float32
I32 = jnp.int32
BIG = 1e30

SUB = 64          # sublanes per block -> block = SUB*128 rays
LANES = 128
BLOCK = SUB * LANES

PF = 34           # per-surface floats: pos 0-2, inv 3-11, sci 12-14,
#                   scjh 15-17, sciw 18, cmin 19-21, cmax 22-24, fwd 25-33
CF = 22           # per-clip-entry floats
MF = 10           # per-material floats
LF = 10           # per-light floats


class PackedScene(NamedTuple):
    sp_f: jnp.ndarray    # (NS, PF) f32
    sp_i: jnp.ndarray    # (NS, 5) i32: kind, mat_outer, mat_inner, blk, sing
    cl_f: jnp.ndarray    # (NS, NC*CF) f32 pre-gathered clip tables
    mat_f: jnp.ndarray   # (NM, MF) f32
    mat_i: jnp.ndarray   # (NM, 1) i32 props
    lg_f: jnp.ndarray    # (NL, LF) f32
    misc: jnp.ndarray    # (8,) f32: amb_rgb, use_gamma, use_fresnel, pad


def pack_scene(sc: SceneArrays) -> PackedScene:
    NS = sc.s_pos.shape[0]
    NC = sc.c_op.shape[1]
    sp_f = jnp.concatenate([
        sc.s_pos, sc.s_inv.reshape(NS, 9), sc.s_sci, sc.s_scjh,
        sc.s_sciw[:, None],
        jnp.clip(sc.s_cmin, -BIG, BIG), jnp.clip(sc.s_cmax, -BIG, BIG),
        sc.s_fwd.reshape(NS, 9),
    ], axis=1).astype(F32)
    # per-surface shadow-blocker flags (CHECK_SHAD rule, evaluated on the
    # host per material): bit0 = outer side blocks, bit1 = inner side
    props = sc.m_props
    mat_blocks = (((props & PROP_LIGHT) == 0)
                  & ~(((props & PROP_TRANSP) != 0)
                      & ((props & PROP_REFRACT) == 0))).astype(I32)
    blk = (mat_blocks[sc.s_mat[:, 0]]
           + 2 * mat_blocks[sc.s_mat[:, 1]])
    sp_i = jnp.concatenate([
        sc.s_kind[:, None], sc.s_mat,
        blk[:, None], sc.s_sing[:, None]], axis=1).astype(I32)
    ref = jnp.maximum(sc.c_ref, 0)
    cl_f = jnp.concatenate([
        sc.s_pos[ref], sc.s_inv[ref].reshape(NS, NC, 9), sc.s_sci[ref],
        sc.s_scjh[ref], sc.s_sciw[ref][..., None],
        sc.s_kind[ref][..., None].astype(F32),
        sc.c_side[..., None],
        sc.c_op[..., None].astype(F32),
    ], axis=2).astype(F32)
    mat_f = jnp.stack([
        sc.m_col[:, 0], sc.m_col[:, 1], sc.m_col[:, 2], sc.m_dff, sc.m_spc,
        sc.m_pow, sc.m_rfl, sc.m_trn, sc.m_rfr, sc.m_ext], axis=1)
    mat_i = sc.m_props[:, None].astype(I32)
    lg_f = jnp.concatenate([
        sc.l_pos, sc.l_col, sc.l_cnt[:, None], sc.l_lnr[:, None],
        sc.l_qdr[:, None], sc.l_on[:, None]], axis=1).astype(F32)
    misc = jnp.concatenate([
        sc.amb_col, sc.use_gamma[None], sc.use_fresnel[None],
        jnp.zeros((3,), F32)])
    return PackedScene(sp_f, sp_i, cl_f.reshape(NS, NC * CF), mat_f, mat_i,
                       lg_f, misc)


def kernel_supported(sc: SceneArrays) -> bool:
    """Textured materials need the jnp path's gather (v2 limitation)."""
    props = np.asarray(sc.m_props)
    return not bool((props & PROP_TEXTURE).any())


def _sdiv(num, den, fallback=BIG):
    bad = jnp.abs(den) < 1e-30
    return jnp.where(bad, fallback, num / jnp.where(bad, 1.0, den))


def _root(num, den):
    """nan-root handling (tracer.cpp:4585-4600, = trace.py _root): zero
    numerator -> root 0; zero denominator (nonzero numerator) -> invalid."""
    nz = num == 0.0
    den = jnp.where(nz, 1.0, den)
    ok = den != 0.0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), BIG), ok


def _make_kernel(NS, NC, NM, NL, cfg: TraceConfig):
    D = cfg.stack

    def kernel(sp_f, sp_i, cl_f, mat_f, mat_i, lg_f, misc,
               ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r,
               cr_r, cg_r, cb_r):

        # ---- scalar helpers over SMEM tables -------------------------
        def surf(s):
            g = lambda k: sp_f[s, k]
            return dict(
                px=g(0), py=g(1), pz=g(2),
                i00=g(3), i01=g(4), i02=g(5), i10=g(6), i11=g(7),
                i12=g(8), i20=g(9), i21=g(10), i22=g(11),
                sx=g(12), sy=g(13), sz=g(14),
                jx=g(15), jy=g(16), jz=g(17), sw=g(18),
                n0=g(19), n1=g(20), n2=g(21),
                x0=g(22), x1=g(23), x2=g(24),
                f00=g(25), f01=g(26), f02=g(27), f10=g(28), f11=g(29),
                f12=g(30), f20=g(31), f21=g(32), f22=g(33),
                kind=sp_i[s, 0], mo=sp_i[s, 1], mi=sp_i[s, 2],
                blk=sp_i[s, 3], sing=sp_i[s, 4])

        def clipentry(s, j):
            g = lambda k: cl_f[s, j * CF + k]
            return dict(
                px=g(0), py=g(1), pz=g(2),
                i00=g(3), i01=g(4), i02=g(5), i10=g(6), i11=g(7),
                i12=g(8), i20=g(9), i21=g(10), i22=g(11),
                sx=g(12), sy=g(13), sz=g(14),
                jx=g(15), jy=g(16), jz=g(17), sw=g(18),
                kind=g(19), side=g(20), op=g(21))

        def to_local(P, x, y, z):
            rx, ry, rz = x - P["px"], y - P["py"], z - P["pz"]
            return (P["i00"] * rx + P["i01"] * ry + P["i02"] * rz,
                    P["i10"] * rx + P["i11"] * ry + P["i12"] * rz,
                    P["i20"] * rx + P["i21"] * ry + P["i22"] * rz)

        def lin(P, x, y, z):
            return (P["i00"] * x + P["i01"] * y + P["i02"] * z,
                    P["i10"] * x + P["i11"] * y + P["i12"] * z,
                    P["i20"] * x + P["i21"] * y + P["i22"] * z)

        def implicit(P, kind_is_plane, lx, ly, lz):
            quad = (P["sx"] * lx * lx + P["sy"] * ly * ly
                    + P["sz"] * lz * lz
                    - 2.0 * (P["jx"] * lx + P["jy"] * ly + P["jz"] * lz)
                    - P["sw"])
            return jnp.where(kind_is_plane, lz, quad)

        # ---- intersect: nearest hit over all surfaces ----------------
        def intersect(ox, oy, oz, dx, dy, dz, tmn, tmx,
                      osrf, oside, thru, shadow, wmask):
            """fori over surfaces; carry = best hit state. In shadow mode
            the carry degenerates to an occlusion mask. Semantics match
            trace.py intersect() 1:1."""

            def per_surface(s, carry):
                P = surf(s)
                kind = P["kind"]
                is_pl = kind == 1
                is_tp = kind == 3
                live = kind > 0
                lx, ly, lz = to_local(P, ox, oy, oz)
                ex, ey, ez = lin(P, dx, dy, dz)
                a = (P["sx"] * ex * ex + P["sy"] * ey * ey
                     + P["sz"] * ez * ez)
                b = ((P["sx"] * lx - P["jx"]) * ex
                     + (P["sy"] * ly - P["jy"]) * ey
                     + (P["sz"] * lz - P["jz"]) * ez)
                c = implicit(P, False, lx, ly, lz)
                # two-plane exact factored determinant (tracer.cpp:4239-46)
                cross = lx * ez - lz * ex
                disc_tp = jnp.abs(P["sx"] * P["sz"]) * cross * cross
                disc = jnp.where(is_tp, disc_tp, b * b - a * c)
                quad_ok = disc >= 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                # stable b-mixed roots (tracer.cpp:4518-4547): slot a =
                # entering/outer, slot b = leaving/inner, structurally
                sgn_b = jnp.where(b >= 0.0, 1.0, -1.0)
                q = -(b + sgn_b * sq)
                b_pos = b > 0.0
                t1, ok1 = _root(jnp.where(b_pos, q, c),
                                jnp.where(b_pos, a, q))
                t2, ok2 = _root(jnp.where(b_pos, c, q),
                                jnp.where(b_pos, q, a))
                # near-zero-determinant root sorting (tracer.cpp:4572-4623)
                dmask = quad_ok & (disc < D_EPS) & ~is_pl
                sgn_a = jnp.where(a >= 0.0, 1.0, -1.0)
                u = (t1 - t2) * sgn_a
                fm = u >= 0.0
                tdff = jnp.where(fm, -0.5 * u - jnp.abs(T_EPS * t1),
                                 0.0) * sgn_a
                tdff = jnp.where(dmask & ok1 & ok2, tdff, 0.0)
                t1 = t1 + tdff
                t2 = t2 - tdff

                # plane root + ray-sign side (tracer.cpp:4062-4210)
                t_pl = _sdiv(-lz, ez)
                side_pl = jnp.where(ez < 0.0, 1, -1).astype(I32)
                # division-free t-window for plane roots (TPU f32 div is
                # not correctly rounded; see trace.py win_pl)
                pos_d = ez > 0.0
                tmin_d = tmn * ez
                tmax_d = tmx * ez
                # bool selects as logical ops (no i1 select_n in Mosaic)
                win_pl = (ez != 0.0) \
                    & ((pos_d & (-lz > tmin_d)) | (~pos_d & (-lz < tmin_d))) \
                    & ((pos_d & (-lz < tmax_d)) | (~pos_d & (-lz > tmax_d)))

                root_a = jnp.where(is_pl, t_pl,
                                   jnp.where(quad_ok & ok1, t1, BIG))
                root_b = jnp.where(is_pl, BIG,
                                   jnp.where(quad_ok & ok2, t2, BIG))
                side_a = jnp.where(is_pl, side_pl, 1).astype(I32)
                side_b = jnp.full_like(side_pl, -1)

                # conic-singularity scalars (CC_glb, tracer.cpp:1706-1860)
                sing = P["sing"]
                cyl = sing == 2
                ratio_n = P["sx"] + jnp.where(cyl, 0.0, P["sy"])
                bad_rz = jnp.abs(P["sz"]) < 1e-30
                ratio = jnp.abs(jnp.where(bad_rz, 0.0,
                                          ratio_n / jnp.where(bad_rz, 1.0,
                                                              P["sz"])))
                acc_c = jnp.where(cyl, 1.0, 2.0)
                inv_r = T_EPS * jax.lax.rsqrt(
                    jnp.maximum(ratio + acc_c, 1e-30))
                sqrt_ratio = jnp.sqrt(ratio)
                sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)

                def hitdata(t, side, inner):
                    """Hit point (with apex adjustment), world point,
                    gradient — per root slot. `inner` is a Python bool
                    (slot b); planes never trigger the singularity."""
                    hx = lx + t * ex
                    hy = ly + t * ey
                    hz = lz + t * ez
                    wx = ox + t * dx
                    wy = oy + t * dy
                    wz = oz + t * dz
                    if True:  # singularity adjust (gated by sing>0)
                        r2loc = hx * hx + hy * hy + hz * hz
                        hm = (sing > 0) & dmask & (r2loc < T_EPS)
                        a_neg = a < 0.0
                        if inner:
                            ij_flip = jnp.where(~a_neg, -1.0, 1.0)
                            k_flip = 1.0
                        else:
                            ij_flip = 1.0
                            k_flip = jnp.where(a_neg, -1.0, 1.0)
                        adj_i = sgn(lx) * ij_flip * inv_r
                        adj_j = jnp.where(cyl, 0.0,
                                          sgn(ly) * ij_flip * inv_r)
                        adj_k = sgn(lz) * k_flip * sqrt_ratio * inv_r
                        hx = jnp.where(hm, adj_i, hx)
                        hy = jnp.where(hm, adj_j, hy)
                        hz = jnp.where(hm, adj_k, hz)
                        awx = (P["px"] + P["f00"] * adj_i
                               + P["f01"] * adj_j + P["f02"] * adj_k)
                        awy = (P["py"] + P["f10"] * adj_i
                               + P["f11"] * adj_j + P["f12"] * adj_k)
                        awz = (P["pz"] + P["f20"] * adj_i
                               + P["f21"] * adj_j + P["f22"] * adj_k)
                        wx = jnp.where(hm, awx, wx)
                        wy = jnp.where(hm, awy, wy)
                        wz = jnp.where(hm, awz, wz)
                    gx = jnp.where(is_pl, 0.0, P["sx"] * hx - P["jx"])
                    gy = jnp.where(is_pl, 0.0, P["sy"] * hy - P["jy"])
                    gz = jnp.where(is_pl, 1.0, P["sz"] * hz - P["jz"])
                    return hx, hy, hz, wx, wy, wz, gx, gy, gz

                def validity(t, side, hx, hy, hz, wx, wy, wz,
                             plane_slot=False):
                    win = (t > tmn) & (t < tmx)
                    if plane_slot:
                        win = (is_pl & win_pl) | (~is_pl & win)
                    v = wmask & live & win & (t < BIG)
                    v &= (hx >= P["n0"]) & (hx <= P["x0"])
                    v &= (hy >= P["n1"]) & (hy <= P["x1"])
                    v &= (hz >= P["n2"]) & (hz <= P["x2"])
                    # custom clip program (CC_cyc, tracer.cpp:1939-2160)
                    if NC > 0:
                        def per_clip(j, cm):
                            # i1 vectors can't be scf.for carries; use i32
                            mask = cm[0] != 0
                            saved = cm[1] != 0
                            C = clipentry(s, j)
                            cx, cy, cz = to_local(C, wx, wy, wz)
                            val = implicit(C, C["kind"] == 1.0, cx, cy, cz)
                            pos = C["side"] >= 0.0
                            keep = ((pos & (val <= 0.0))
                                    | (~pos & (val >= 0.0)))
                            is_s = C["op"] == float(CLIP_SURF)
                            is_e = C["op"] == float(CLIP_ENTER)
                            is_l = C["op"] == float(CLIP_LEAVE)
                            is_n = ~(is_s | is_e | is_l)
                            # bool selects as logical ops (no i1 select_n)
                            saved = (is_e & mask) | (~is_e & saved)
                            mask = ((is_s & mask & keep) | is_e
                                    | (is_l & saved & ~mask)
                                    | (is_n & mask))
                            return mask.astype(I32), saved.astype(I32)

                        vm, _ = jax.lax.fori_loop(
                            0, NC, per_clip,
                            (v.astype(I32), jnp.ones(v.shape, I32)))
                        v = vm != 0
                    # CHECK_SIDE exact self-intersection skip
                    same = osrf == s
                    allowed = thru ^ (side == oside)
                    v &= ~same | allowed
                    return v

                ha = hitdata(root_a, side_a, inner=False)
                hb = hitdata(root_b, side_b, inner=True)
                va = validity(root_a, side_a, *ha[:6], plane_slot=True)
                vb = validity(root_b, side_b, *hb[:6])

                if shadow:
                    souter_a = side_a > 0
                    blk = P["blk"]
                    blocks_a = ((souter_a & ((blk & 1) != 0))
                                | (~souter_a & ((blk & 2) != 0)))
                    blocks_b = (blk & 2) != 0
                    occ = carry != 0
                    return (occ | (va & blocks_a)
                            | (vb & blocks_b)).astype(I32)

                # per-surface nearest valid root, then one carry update
                pick_b = vb & (~va | (root_b < root_a))
                sel_ab = lambda fa, fb: jnp.where(pick_b, fb, fa)
                t = sel_ab(jnp.where(va, root_a, BIG),
                           jnp.where(vb, root_b, BIG))
                side = sel_ab(side_a, side_b)
                wx = sel_ab(ha[3], hb[3])
                wy = sel_ab(ha[4], hb[4])
                wz = sel_ab(ha[5], hb[5])
                gx = sel_ab(ha[6], hb[6])
                gy = sel_ab(ha[7], hb[7])
                gz = sel_ab(ha[8], hb[8])

                (bt, bsrf, bside, bwx, bwy, bwz, bnx, bny, bnz, bmat) = \
                    carry
                better = t < bt
                # world normal = inv^T g, flipped to hit side
                nwx = (P["i00"] * gx + P["i10"] * gy + P["i20"] * gz)
                nwy = (P["i01"] * gx + P["i11"] * gy + P["i21"] * gz)
                nwz = (P["i02"] * gx + P["i12"] * gy + P["i22"] * gz)
                sf = side.astype(F32)
                midx = jnp.where(side > 0, P["mo"], P["mi"])
                sel = lambda a_, b_: jnp.where(better, a_, b_)
                return (sel(t, bt), sel(s, bsrf), sel(side, bside),
                        sel(wx, bwx), sel(wy, bwy), sel(wz, bwz),
                        sel(nwx * sf, bnx), sel(nwy * sf, bny),
                        sel(nwz * sf, bnz), sel(midx, bmat))

            if shadow:
                init = jnp.zeros(ox.shape, I32)
            else:
                z = jnp.zeros(ox.shape, F32)
                zi = jnp.zeros(ox.shape, I32)
                init = (jnp.full(ox.shape, BIG, F32), zi - 1, zi + 1,
                        z, z, z, z, z, z, zi)
            return jax.lax.fori_loop(0, NS, per_surface, init)

        # ---- material params per ray (one-hot over NM) ---------------
        def mat_params(midx):
            def per_mat(m, acc):
                sel = (midx == m)
                selF = sel.astype(F32)
                out = [a + selF * mat_f[m, k] for k, a in
                       enumerate(acc[:-1])]
                props = jnp.where(sel, mat_i[m, 0], acc[-1])
                return tuple(out) + (props,)
            z = jnp.zeros(midx.shape, F32)
            init = tuple(z for _ in range(MF)) + \
                (jnp.zeros(midx.shape, I32),)
            return jax.lax.fori_loop(0, NM, per_mat, init)

        # ---- main loop ----------------------------------------------
        ox = ox_r[:]
        oy = oy_r[:]
        oz = oz_r[:]
        dx = dx_r[:]
        dy = dy_r[:]
        dz = dz_r[:]
        tmn = tm_r[:]
        shape = ox.shape
        z = jnp.zeros(shape, F32)
        zi = jnp.zeros(shape, I32)
        zb = jnp.zeros(shape, jnp.bool_)

        amb_r, amb_g, amb_b = misc[0], misc[1], misc[2]
        use_gamma = misc[3]
        use_fres = misc[4]

        def shade_and_continue(st):
            (ox, oy, oz, dx, dy, dz, tmn, thr_r, thr_g, thr_b, depth,
             osrf, oside, thru_i, active_i, acc_r, acc_g, acc_b, sp,
             stk, it) = st
            thru = thru_i != 0
            active = active_i != 0

            (bt, bsrf, bside, hx, hy, hz, nx, ny, nz, bmat) = intersect(
                ox, oy, oz, dx, dy, dz, tmn,
                jnp.full(shape, BIG, F32), osrf, oside, thru,
                False, active)
            hit = (bt < BIG) & active
            # normalize normal
            nn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                           1e-30))
            nx, ny, nz = nx * nn, ny * nn, nz * nn

            (mc_r, mc_g, mc_b, m_dff, m_spc, m_pow, m_rfl, m_trn, m_rfr,
             m_ext, props) = mat_params(bmat)
            emissive = (props & PROP_LIGHT) != 0
            metal = (props & PROP_METAL) != 0
            # gamma decode x^2 (PAINT_COLX, tracer.cpp:664-673)
            gam = ((props & PROP_GAMMA) != 0) & (use_gamma > 0)
            mc_r = jnp.where(gam, mc_r * mc_r, mc_r)
            mc_g = jnp.where(gam, mc_g * mc_g, mc_g)
            mc_b = jnp.where(gam, mc_b * mc_b, mc_b)

            col_r = mc_r * amb_r
            col_g = mc_g * amb_g
            col_b = mc_b * amb_b

            def per_light(l, cols):
                cr, cg, cb = cols
                lpx, lpy, lpz = lg_f[l, 0], lg_f[l, 1], lg_f[l, 2]
                lcr, lcg, lcb = lg_f[l, 3], lg_f[l, 4], lg_f[l, 5]
                cnt, lnr, qdr, on = (lg_f[l, 6], lg_f[l, 7], lg_f[l, 8],
                                     lg_f[l, 9])
                lvx, lvy, lvz = lpx - hx, lpy - hy, lpz - hz
                r_dot = lvx * nx + lvy * ny + lvz * nz
                lit = (r_dot > 0.0) & (on > 0) & hit
                occ = intersect(hx, hy, hz, lvx, lvy, lvz, z,
                                jnp.ones(shape, F32), bsrf, bside, zb,
                                True, lit)
                hm = lit & ~occ
                r2 = lvx * lvx + lvy * lvy + lvz * lvz
                r = jnp.sqrt(jnp.maximum(r2, 1e-30))
                attn = jax.lax.rsqrt(jnp.maximum(
                    cnt + lnr * r + qdr * r2, 1e-30))
                dfs = jnp.where(hm & ((props & PROP_DIFFUSE) != 0),
                                r_dot / r * attn * m_dff, 0.0)
                rlx = lvx - 2.0 * r_dot * nx
                rly = lvy - 2.0 * r_dot * ny
                rlz = lvz - 2.0 * r_dot * nz
                sdot = rlx * dx + rly * dy + rlz * dz
                d2 = dx * dx + dy * dy + dz * dz
                cosr = sdot * jax.lax.rsqrt(jnp.maximum(d2 * r2, 1e-30))
                spc_on = hm & (sdot > 0.0) & ((props & PROP_SPECULAR) != 0)
                cosr = jnp.clip(jnp.where(spc_on, cosr, 1.0), 1e-6, 1.0)
                spc = jnp.where(
                    spc_on, jnp.exp(m_pow * jnp.log(cosr)) * m_spc, 0.0)
                tm = dfs + spc
                cr = cr + jnp.where(metal, mc_r * lcr * tm,
                                    mc_r * lcr * dfs + lcr * spc)
                cg = cg + jnp.where(metal, mc_g * lcg * tm,
                                    mc_g * lcg * dfs + lcg * spc)
                cb = cb + jnp.where(metal, mc_b * lcb * tm,
                                    mc_b * lcb * dfs + lcb * spc)
                return cr, cg, cb

            col_r, col_g, col_b = jax.lax.fori_loop(
                0, NL, per_light, (col_r, col_g, col_b))
            col_r = jnp.where(emissive, mc_r, col_r)
            col_g = jnp.where(emissive, mc_g, col_g)
            col_b = jnp.where(emissive, mc_b, col_b)

            # Fresnel / refraction (tracer.cpp:3182-3424)
            dl = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                           1e-30))
            rhx, rhy, rhz = dx * dl, dy * dl, dz * dl
            dot = rhx * nx + rhy * ny + rhz * nz
            eta = m_rfr
            k = 1.0 - eta * eta + (eta * dot) ** 2
            refracts = (props & PROP_REFRACT) != 0
            tir = (k < 0.0) & refracts
            sq = jnp.sqrt(jnp.maximum(k, 0.0))
            rfx = jnp.where(refracts, eta * rhx - nx * (eta * dot + sq),
                            rhx)
            rfy = jnp.where(refracts, eta * rhy - ny * (eta * dot + sq),
                            rhy)
            rfz = jnp.where(refracts, eta * rhz - nz * (eta * dot + sq),
                            rhz)
            fres_on = (((props & PROP_FRESNEL) != 0) & (use_fres > 0)
                       & ((props & PROP_OPAQUE) == 0))
            rs = _sdiv(eta * dot + sq, eta * dot - sq, 1.0)
            rp = _sdiv(dot + eta * sq, dot - eta * sq, 1.0)
            Fr = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
            Fr = jnp.where(fres_on, Fr, 0.0)
            Fr = jnp.where(tir, 1.0, Fr)
            c_trn = jnp.where(tir, 0.0, m_trn * (1.0 - Fr))
            c_rfl = m_rfl + m_trn * Fr

            lw = jnp.maximum(1.0 - c_rfl - c_trn, 0.0)
            acc_r = acc_r + jnp.where(hit, thr_r * col_r * lw, 0.0)
            acc_g = acc_g + jnp.where(hit, thr_g * col_g * lw, 0.0)
            acc_b = acc_b + jnp.where(hit, thr_b * col_b * lw, 0.0)

            # continuations
            deep_ok = depth < cfg.depth
            trl_r, trl_g, trl_b = thr_r * c_rfl, thr_g * c_rfl, thr_b * c_rfl
            trn_r, trn_g, trn_b = thr_r * c_trn, thr_g * c_trn, thr_b * c_trn
            mx = lambda a_, b_, c_: jnp.maximum(jnp.maximum(a_, b_), c_)
            go_rfl = hit & deep_ok & (mx(trl_r, trl_g, trl_b) > cfg.cutoff)
            go_trn = hit & deep_ok & (mx(trn_r, trn_g, trn_b) > cfg.cutoff)

            ddn = dx * nx + dy * ny + dz * nz
            rlx2 = dx - 2.0 * ddn * nx
            rly2 = dy - 2.0 * ddn * ny
            rlz2 = dz - 2.0 * ddn * nz

            push = go_rfl & go_trn & (sp < D)
            new_stk = []
            vals = (hx, hy, hz, rfx, rfy, rfz, trn_r, trn_g, trn_b,
                    (depth + 1).astype(F32), bsrf.astype(F32),
                    bside.astype(F32))
            for kk in range(D):
                at_k = push & (sp == kk)
                slot = stk[kk]
                new_stk.append(tuple(
                    jnp.where(at_k, v, sl) for v, sl in zip(vals, slot)))
            sp2 = sp + push.astype(I32)

            cont = go_rfl | go_trn
            use_rfl = go_rfl
            n_ox, n_oy, n_oz = hx, hy, hz
            n_dx = jnp.where(use_rfl, rlx2, rfx)
            n_dy = jnp.where(use_rfl, rly2, rfy)
            n_dz = jnp.where(use_rfl, rlz2, rfz)
            n_tr = jnp.where(use_rfl, trl_r, trn_r)
            n_tg = jnp.where(use_rfl, trl_g, trn_g)
            n_tb = jnp.where(use_rfl, trl_b, trn_b)

            can_pop = active & ~cont & (sp2 > 0)
            psp = jnp.maximum(sp2 - 1, 0)
            pops = []
            for f in range(12):
                acc0 = jnp.zeros(shape, F32)
                for kk in range(D):
                    acc0 = jnp.where(psp == kk, new_stk[kk][f], acc0)
                pops.append(acc0)
            (p_ox, p_oy, p_oz, p_dx, p_dy, p_dz, p_tr, p_tg, p_tb,
             p_dep, p_srf, p_side) = pops

            w2 = lambda c_, a_, b_: jnp.where(c_, a_, b_)
            ox2 = w2(cont, n_ox, w2(can_pop, p_ox, ox))
            oy2 = w2(cont, n_oy, w2(can_pop, p_oy, oy))
            oz2 = w2(cont, n_oz, w2(can_pop, p_oz, oz))
            dx2 = w2(cont, n_dx, w2(can_pop, p_dx, dx))
            dy2 = w2(cont, n_dy, w2(can_pop, p_dy, dy))
            dz2 = w2(cont, n_dz, w2(can_pop, p_dz, dz))
            tr2 = w2(cont, n_tr, w2(can_pop, p_tr, thr_r))
            tg2 = w2(cont, n_tg, w2(can_pop, p_tg, thr_g))
            tb2 = w2(cont, n_tb, w2(can_pop, p_tb, thr_b))
            dep2 = w2(cont, depth + 1,
                      w2(can_pop, p_dep.astype(I32), depth))
            osrf2 = w2(cont, bsrf, w2(can_pop, p_srf.astype(I32), osrf))
            osd2 = w2(cont, bside, w2(can_pop, p_side.astype(I32), oside))
            thru2 = ((cont & ~use_rfl) | (~cont & can_pop)).astype(I32)
            tmn2 = jnp.where(cont | can_pop, 0.0, tmn)
            act2 = (active & (cont | can_pop)).astype(I32)
            sp3 = jnp.where(can_pop, psp, sp2)

            return (ox2, oy2, oz2, dx2, dy2, dz2, tmn2, tr2, tg2, tb2,
                    dep2, osrf2, osd2, thru2, act2, acc_r, acc_g, acc_b,
                    sp3, tuple(new_stk), it + 1)

        stk0 = tuple(tuple(z for _ in range(12)) for _ in range(D))
        st0 = (ox, oy, oz, dx, dy, dz, tmn,
               z + 1.0, z + 1.0, z + 1.0, zi, zi - 1, zi + 1, zi,
               zi + 1, z, z, z, zi, stk0,
               jnp.zeros((), I32))

        def cond(st):
            return jnp.any(st[14] != 0) & (st[20] < cfg.max_segments)

        out = jax.lax.while_loop(cond, shade_and_continue, st0)
        cr_r[:] = out[15]
        cg_r[:] = out[16]
        cb_r[:] = out[17]

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_rays_pallas(sc: SceneArrays, org, dirs, t_min,
                      cfg: TraceConfig = TraceConfig(),
                      interpret: bool = False):
    """Pallas megakernel entry: same signature/semantics as
    ops.trace.trace_rays. Rays are padded to BLOCK (padding rays get
    t_min = BIG so they never hit)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    ps = pack_scene(sc)
    NS = sc.s_pos.shape[0]
    NC = sc.c_op.shape[1]
    NM = sc.m_props.shape[0]
    NL = sc.l_pos.shape[0]

    npad = ((N + BLOCK - 1) // BLOCK) * BLOCK
    pad = npad - N

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // LANES, LANES)

    ox = prep(org[:, 0])
    oy = prep(org[:, 1])
    oz = prep(org[:, 2])
    dx = prep(dirs[:, 0], 1.0)
    dy = prep(dirs[:, 1], 1.0)
    dz = prep(dirs[:, 2], 1.0)
    tm = prep(t_min.astype(F32), BIG)

    grid = npad // BLOCK
    kern = _make_kernel(NS, NC, NM, NL, cfg)
    # index_map receives the scalar-prefetch refs after the grid index
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(grid,),
        in_specs=[ray_spec] * 7,
        out_specs=[ray_spec] * 3,
    )
    out_shape = [jax.ShapeDtypeStruct((npad // LANES, LANES), F32)] * 3
    cr, cg, cb = pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.mat_i, ps.lg_f, ps.misc,
      ox, oy, oz, dx, dy, dz, tm)
    cols = jnp.stack([cr.reshape(-1), cg.reshape(-1), cb.reshape(-1)],
                     axis=-1)
    return cols[:N]
