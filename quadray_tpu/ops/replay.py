"""Trace-replay differentiation: the fast training path.

The differentiable pixel function is split TPU-first:

  * the Pallas megakernel traces the rays and emits a per-segment PATH
    RECORD (hit surface id, side, continuation kind, per-light shadow
    bits — see pallas_kernel._make_kernel emit_paths);
  * this module re-evaluates the color as a pure differentiable function
    of the scene parameters along those saved paths — O(N*K) work with
    take-based row gathers, no per-surface loop, SoA component arrays.

The discrete path structure is detached (piecewise-constant in the
parameters), exactly the framework's documented differentiability
contract: gradients are valid where the hit/branch assignment is locally
constant, and visibility-edge pixels are masked by the caller
(tests/test_grad.py methodology). This is the standard
detach-the-sampler decomposition of a Whitted tree.

Replay arithmetic mirrors ops/trace.py / the kernel (stable b-mixed
Vieta roots per side slot, exact Fresnel + TIR, metal fast/plain
RF-Fresnel, metal blending, attenuation with the +1-biased constant,
gamma decode). Known primal deltas vs the kernel: textured materials
replay their plain color (texture fetches carry no parameter gradients),
and the conic-singularity apex nudge + D_EPS root sorting are omitted
(measure-zero sets where the gradient is undefined anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from quadray_tpu.scene.compile import (
    SceneArrays, PROP_LIGHT, PROP_METAL, PROP_OPAQUE, PROP_REFLECT,
    PROP_REFRACT, PROP_DIFFUSE, PROP_SPECULAR, PROP_GAMMA, PROP_FRESNEL)
from quadray_tpu.ops.trace import TraceConfig

F32 = jnp.float32
I32 = jnp.int32
BIG = 1e30


def _sdiv(num, den, fallback=BIG):
    bad = jnp.abs(den) < 1e-30
    return jnp.where(bad, fallback, num / jnp.where(bad, 1.0, den))


def _root(num, den):
    nz = num == 0.0
    den = jnp.where(nz, 1.0, den)
    ok = den != 0.0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), BIG), ok


@partial(jax.jit, static_argnames=("cfg",))
def replay_color(sc: SceneArrays, org, dirs, t_min, paths,
                 cfg: TraceConfig = TraceConfig()):
    """Differentiable color along saved paths.

    org (N,3) or (3,), dirs (N,3), paths (K,N) i32 path records.
    Returns (N,3) linear colors. Differentiable w.r.t. every float
    leaf of ``sc`` (surface transforms/coefficients, materials, lights,
    ambient)."""
    N = dirs.shape[0]
    K = paths.shape[0]
    NS = sc.s_pos.shape[0]
    NM = sc.m_props.shape[0]
    NL = sc.l_pos.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))

    # everything runs on (R, 128) lane-major tiles: 1-D (N,) layouts on
    # TPU can land sublane-major and waste the whole vector unit (the
    # round-4/5 replay cost was exactly this), and tiled shapes keep
    # every elementwise chain on dense (8, 128) vregs
    npad = -(-N // 128) * 128
    pad = npad - N
    R = npad // 128

    def _tile2(a, fill=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(R, 128)

    # differentiable per-surface float table (NS, 19):
    # pos 0-2, inv 3-11, sci 12-14, scjh 15-17, sciw 18
    stab = jnp.concatenate([
        sc.s_pos, sc.s_inv.reshape(NS, 9), sc.s_sci, sc.s_scjh,
        sc.s_sciw[:, None]], axis=1).astype(F32)
    # per-material float table (NM, 10): col 0-2, dff, spc, pow, rfl,
    # trn, rfr, ext
    mtab = jnp.stack([
        sc.m_col[:, 0], sc.m_col[:, 1], sc.m_col[:, 2], sc.m_dff,
        sc.m_spc, sc.m_pow, sc.m_rfl, sc.m_trn, sc.m_rfr, sc.m_ext],
        axis=1).astype(F32)

    kind_t = sc.s_kind
    props_t = sc.m_props
    mat_t = sc.s_mat
    use_gamma = sc.use_gamma > 0.0
    use_fresnel = sc.use_fresnel > 0.0
    amb_r, amb_g, amb_b = sc.amb_col[0], sc.amb_col[1], sc.amb_col[2]

    # float-table row lookup: one-hot CONTRACTION, not take. XLA lowers
    # the backward of a take into a scatter-add over the table rows,
    # which TPU executes as a serialized update stream — measured ~80 ms
    # per step on 384k rays (the entire round-4/5 training cost). The
    # one-hot contraction's backward is a dense multiply+reduce the VPU
    # eats in well under a millisecond for the small tables here; it is
    # O(N * NS) memory, so fall back to take-gathers for very large
    # scenes (where the emit kernel dominates anyway).
    def _onehot(idx, nt):
        """(NT, R, 128) f32 one-hot of idx (R, 128)."""
        return (idx[None, :, :] == jnp.arange(nt, dtype=I32)
                [:, None, None]).astype(F32)

    def _rows(tableT, idx, oh=None):
        """tableT (F, NT); idx (R, 128) -> (F, R, 128) gathered rows."""
        nt = tableT.shape[1]
        if nt <= 64:
            if oh is None:
                oh = _onehot(idx, nt)
            return jnp.tensordot(tableT, oh, axes=1)  # (F, R, 128)
        return tableT[:, idx]

    def _irow(vec_i, idx, oh):
        """Integer column lookup via the shared one-hot (exact for
        values < 2^24); falls back to take when one-hot is off."""
        if oh is None:
            return vec_i[idx]
        return jnp.tensordot(vec_i.astype(F32), oh,
                             axes=1).astype(vec_i.dtype)

    orgT = org.T
    dirsT = dirs.T
    ox, oy, oz = (_tile2(orgT[0]), _tile2(orgT[1]),
                  _tile2(orgT[2]))
    # pad lanes get dir (1,1,1), not 0: a zero direction makes every
    # dot/eta chain degenerate at exactly the values whose gradients
    # blow up; pad records are 0 (no hit) so the value never matters
    dx, dy, dz = (_tile2(dirsT[0], 1.0), _tile2(dirsT[1], 1.0),
                  _tile2(dirsT[2], 1.0))
    one = jnp.ones((R, 128), F32)
    thr_r = thr_g = thr_b = one
    acc_r = acc_g = acc_b = jnp.zeros((R, 128), F32)
    stabT = stab.T                                   # (19, NS)
    mtabT = mtab.T                                   # (10, NM)

    for k in range(K):
        rec = _tile2(paths[k], 0)
        srf = rec & 0xFFF
        sidep = ((rec >> 12) & 1) == 1
        sf = jnp.where(sidep, 1.0, -1.0)
        kindc = (rec >> 13) & 3
        hit = ((rec >> 15) & 1) != 0
        hitf = hit.astype(F32)

        ohS = _onehot(srf, NS) if NS <= 64 else None
        P = _rows(stabT, srf, ohS)                       # (19, R, 128)
        px, py, pz = P[0], P[1], P[2]
        (i00, i01, i02, i10, i11, i12, i20, i21, i22) = (
            P[3], P[4], P[5], P[6], P[7], P[8],
            P[9], P[10], P[11])
        sx, sy, sz_ = P[12], P[13], P[14]
        jx, jy, jz = P[15], P[16], P[17]
        sw = P[18]

        rx, ry, rz = ox - px, oy - py, oz - pz
        lx = i00 * rx + i01 * ry + i02 * rz
        ly = i10 * rx + i11 * ry + i12 * rz
        lz = i20 * rx + i21 * ry + i22 * rz
        ex = i00 * dx + i01 * dy + i02 * dz
        ey = i10 * dx + i11 * dy + i12 * dz
        ez = i20 * dx + i21 * dy + i22 * dz

        skind = _irow(kind_t, srf, ohS)
        is_pl = skind == 1
        is_tp = skind == 3

        # quadric roots, side slot picked by the SAVED side (slot a =
        # outer/entering, slot b = inner/leaving)
        a = sx * ex * ex + sy * ey * ey + sz_ * ez * ez
        b = ((sx * lx - jx) * ex + (sy * ly - jy) * ey
             + (sz_ * lz - jz) * ez)
        c = (sx * lx * lx + sy * ly * ly + sz_ * lz * lz
             - 2.0 * (jx * lx + jy * ly + jz * lz) - sw)
        cross = lx * ez - lz * ex
        disc = jnp.where(is_tp, jnp.abs(sx * sz_) * cross * cross,
                         b * b - a * c)
        # sanitize the sqrt input: plane lanes carry a degenerate
        # quadric (disc == 0) whose sqrt has an infinite derivative, and
        # inf * 0 through the jnp.where select poisons the WHOLE
        # gradient with NaN; the floor also caps the (measure-zero)
        # tangent-ray derivative
        disc = jnp.where(is_pl, 1.0, jnp.maximum(disc, 1e-20))
        sq = jnp.sqrt(disc)
        sgn_b = jnp.where(b >= 0.0, 1.0, -1.0)
        qq = -(b + sgn_b * sq)
        b_pos = b > 0.0
        t1, _ = _root(jnp.where(b_pos, qq, c), jnp.where(b_pos, a, qq))
        t2, _ = _root(jnp.where(b_pos, c, qq), jnp.where(b_pos, qq, a))
        t_qd = jnp.where(sidep, t1, t2)
        t_pl = _sdiv(-lz, ez, 0.0)
        t = jnp.where(is_pl, t_pl, t_qd)
        t = jnp.where(hit, t, 0.0)

        hx = lx + t * ex
        hy = ly + t * ey
        hz = lz + t * ez
        wx = ox + t * dx
        wy = oy + t * dy
        wz = oz + t * dz

        gx = jnp.where(is_pl, 0.0, sx * hx - jx)
        gy = jnp.where(is_pl, 0.0, sy * hy - jy)
        gz = jnp.where(is_pl, 1.0, sz_ * hz - jz)
        nx = (i00 * gx + i10 * gy + i20 * gz) * sf
        ny = (i01 * gx + i11 * gy + i21 * gz) * sf
        nz = (i02 * gx + i12 * gy + i22 * gz) * sf
        nn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                       1e-30))
        nx, ny, nz = nx * nn, ny * nn, nz * nn

        midx = jnp.where(sidep, _irow(mat_t[:, 0], srf, ohS),
                         _irow(mat_t[:, 1], srf, ohS))
        ohM = _onehot(midx, NM) if NM <= 64 else None
        M = _rows(mtabT, midx, ohM)                       # (10, R, 128)
        mc_r, mc_g, mc_b = M[0], M[1], M[2]
        m_dff, m_spc, m_pow = M[3], M[4], M[5]
        m_rfl, m_trn, m_rfr, m_ext = M[6], M[7], M[8], M[9]
        props = _irow(props_t, midx, ohM)
        bit = lambda p: (props & p) != 0
        gam = bit(PROP_GAMMA) & use_gamma
        mc_r = jnp.where(gam, mc_r * mc_r, mc_r)
        mc_g = jnp.where(gam, mc_g * mc_g, mc_g)
        mc_b = jnp.where(gam, mc_b * mc_b, mc_b)

        col_r = mc_r * amb_r
        col_g = mc_g * amb_g
        col_b = mc_b * amb_b
        metal = bit(PROP_METAL)
        for l in range(NL):
            lon = sc.l_on[l]
            lvx = sc.l_pos[l, 0] - wx
            lvy = sc.l_pos[l, 1] - wy
            lvz = sc.l_pos[l, 2] - wz
            lcr = sc.l_col[l, 0] * lon
            lcg = sc.l_col[l, 1] * lon
            lcb = sc.l_col[l, 2] * lon
            r_dot = lvx * nx + lvy * ny + lvz * nz
            hm = ((rec >> (16 + l)) & 1) == 0
            r2 = lvx * lvx + lvy * lvy + lvz * lvz
            r = jnp.sqrt(jnp.maximum(r2, 1e-30))
            attn = jax.lax.rsqrt(jnp.maximum(
                sc.l_cnt[l] + sc.l_lnr[l] * r + sc.l_qdr[l] * r2, 1e-30))
            dfs = jnp.where(hm & bit(PROP_DIFFUSE),
                            r_dot / r * attn * m_dff, 0.0)
            rlx = lvx - 2.0 * r_dot * nx
            rly = lvy - 2.0 * r_dot * ny
            rlz = lvz - 2.0 * r_dot * nz
            sdot = rlx * dx + rly * dy + rlz * dz
            d2 = dx * dx + dy * dy + dz * dz
            cosr = sdot * jax.lax.rsqrt(jnp.maximum(d2 * r2, 1e-30))
            spc_on = hm & (sdot > 0.0) & bit(PROP_SPECULAR)
            cosr = jnp.clip(jnp.where(spc_on, cosr, 1.0), 1e-6, 1.0)
            spc = jnp.where(spc_on,
                            jnp.exp(m_pow * jnp.log(cosr)) * m_spc, 0.0)
            tm_ = dfs + spc
            col_r = col_r + jnp.where(metal, mc_r * lcr * tm_,
                                      mc_r * lcr * dfs + lcr * spc)
            col_g = col_g + jnp.where(metal, mc_g * lcg * tm_,
                                      mc_g * lcg * dfs + lcg * spc)
            col_b = col_b + jnp.where(metal, mc_b * lcb * tm_,
                                      mc_b * lcb * dfs + lcb * spc)

        emis = bit(PROP_LIGHT)
        col_r = jnp.where(emis, mc_r, col_r)
        col_g = jnp.where(emis, mc_g, col_g)
        col_b = jnp.where(emis, mc_b, col_b)

        # Fresnel / refraction continuation weights (TR + RF sections)
        dl = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                       1e-30))
        rhx, rhy, rhz = dx * dl, dy * dl, dz * dl
        dot = rhx * nx + rhy * ny + rhz * nz
        eta = m_rfr
        ksn = 1.0 - eta * eta + (eta * dot) ** 2
        refracts = bit(PROP_REFRACT)
        tir = (ksn < 0.0) & refracts
        # 1e-20 floor, not 0: for eta == 1 materials ksn == dot^2, which
        # is EXACTLY 0 on grazing/degenerate lanes — jnp.maximum splits
        # the gradient at the tie and sqrt'(0) = inf turns it into NaN
        # that poisons the whole psum'd gradient (round-5 multi-shard
        # finding); the floor perturbs sqk by <= 1e-10
        sqk = jnp.sqrt(jnp.maximum(ksn, 1e-20))
        rfx = jnp.where(refracts, eta * rhx - nx * (eta * dot + sqk), rhx)
        rfy = jnp.where(refracts, eta * rhy - ny * (eta * dot + sqk), rhy)
        rfz = jnp.where(refracts, eta * rhz - nz * (eta * dot + sqk), rhz)
        fres_lanes = bit(PROP_FRESNEL) & ~bit(PROP_OPAQUE) & use_fresnel
        rs = _sdiv(eta * dot + sqk, eta * dot - sqk, 1.0)
        rp = _sdiv(dot + eta * sqk, dot - eta * sqk, 1.0)
        Fr = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
        Fr = jnp.where(fres_lanes, Fr, 0.0)
        # TIR reflectivity fold only under Fresnel (tracer.cpp:3268-3301
        # is inside RT_FEAT_FRESNEL; see ops/trace.py fresnel_terms)
        Fr = jnp.where(tir & fres_lanes, 1.0, Fr)
        c_trn = jnp.where(tir, 0.0, m_trn * (1.0 - Fr))
        c_rfl = m_rfl + m_trn * Fr
        # RF-section Fresnel for opaque reflective Fresnel materials
        rf_mask = (bit(PROP_OPAQUE) & bit(PROP_REFLECT)
                   & bit(PROP_FRESNEL) & use_fresnel)
        rcp = _sdiv(jnp.ones_like(m_rfr), m_rfr, 0.0)
        ext2 = m_ext * m_ext
        t2m = 2.0 * dot * rcp
        c2 = dot * dot
        gg = rcp * rcp + ext2
        x0 = c2 + gg
        x1 = c2 * gg + 1.0
        f_metal = jnp.abs(-0.5 * (_sdiv(x0 + t2m, x0 - t2m, 1.0)
                                  + _sdiv(x1 + t2m, x1 - t2m, 1.0)))
        rs_o = _sdiv(eta * dot + sqk, eta * dot - sqk, 1.0)
        rp_o = _sdiv(dot + eta * sqk, dot - eta * sqk, 1.0)
        f_plain = jnp.abs(-0.5 * (rs_o * rs_o + rp_o * rp_o))
        f_rf = jnp.where(metal, f_metal, f_plain)
        c_rfl = jnp.where(rf_mask, m_rfl * f_rf, c_rfl)

        lw = jnp.maximum(1.0 - m_trn - m_rfl, 0.0)
        acc_r = acc_r + hitf * thr_r * col_r * lw
        acc_g = acc_g + hitf * thr_g * col_g * lw
        acc_b = acc_b + hitf * thr_b * col_b * lw

        if k + 1 == K:
            break
        # continuation (saved branch kind)
        is_rfl = kindc == 1
        is_trn = kindc == 2
        cont = kindc > 0
        ddn = dx * nx + dy * ny + dz * nz
        mrx = dx - 2.0 * ddn * nx
        mry = dy - 2.0 * ddn * ny
        mrz = dz - 2.0 * ddn * nz
        dx = jnp.where(is_rfl, mrx, jnp.where(is_trn, rfx, dx))
        dy = jnp.where(is_rfl, mry, jnp.where(is_trn, rfy, dy))
        dz = jnp.where(is_rfl, mrz, jnp.where(is_trn, rfz, dz))
        wsel = jnp.where(is_rfl, c_rfl, jnp.where(is_trn, c_trn, 1.0))
        thr_r = jnp.where(cont, thr_r * wsel, thr_r)
        thr_g = jnp.where(cont, thr_g * wsel, thr_g)
        thr_b = jnp.where(cont, thr_b * wsel, thr_b)
        ox = jnp.where(cont, wx, ox)
        oy = jnp.where(cont, wy, oy)
        oz = jnp.where(cont, wz, oz)

    return jnp.stack([acc_r.reshape(-1)[:N], acc_g.reshape(-1)[:N],
                      acc_b.reshape(-1)[:N]], axis=-1)
