"""Whitted ray tracer — pure-jnp reference implementation.

This is the semantic core of the framework: the TPU-native re-design of the
reference's render0 megakernel (tracer.cpp:1081-5405). Key transfers:

  * SIMD ray packet (4-16 lanes) -> flat lane dim of N rays (whole frame or
    tile); WMASK/TMASK divergence masks -> boolean arrays + jnp.where.
  * per-object rt_ELEM list walk -> dense broadcast over the padded surface
    axis NS (brute force; SURVEY.md §2.7 row "work culling").
  * unified quadric solver with stable b-mixed Vieta roots
    (tracer.cpp:4378-4547): here F(p) = sci.p^2 - 2 scjh.p - sciw in the
    canonical frame, roots of a t^2 + 2 b t + c via q = -(b + sign(b)sqrt(d)).
  * recursion context stack (RT_STACK_STEP push/pop, tracer.cpp:664-665)
    -> iterative loop with a per-lane branch stack: each bounce continues
    with one branch (reflection) and pushes the other (refraction) with its
    throughput; contributions are linear so the result is identical.
  * CHECK_SIDE exact self-intersection skip (tracer.cpp:523-540): a
    secondary ray from surface s side d can re-hit s only on side d when
    reflected (PASS_BACK) and only on side 1-d when refracted (PASS_THRU);
    no epsilon offsets anywhere.
  * custom clipping with boolean accum segments (CC_clp/CC_acc,
    tracer.cpp:1929-2160): fixed-width clip programs with ENTER/LEAVE ops.
  * hard shadows via any-hit pass over the surface axis with the reference's
    blocker rule (CHECK_SHAD, tracer.cpp:549-589): emissive surfaces and
    unbent fully-transparent surfaces don't block.
  * lights: ambient/diffuse/specular with 1/sqrt(cnt + lnr r + qdr r^2)
    attenuation and metal/plain blending (tracer.cpp:2709-3180).
  * Fresnel: exact dielectric reflectance + TIR transfer trn->rfl
    (tracer.cpp:3280-3424); Schlick via TraceConfig(schlick=True)
    (tracer.cpp:3355-3381); metal fast/slow conductor reflectance and the
    plain-opaque reflectivity Fresnel (tracer.cpp:3671-3830).

The Pallas megakernel (ops/pallas_kernel.py) implements the same math with
explicit VMEM tiling; this module is the "reference target" the kernels are
differentially tested against, and the default differentiable path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quadray_tpu.scene.compile import (
    SceneArrays, PROP_LIGHT, PROP_METAL, PROP_OPAQUE, PROP_REFLECT,
    PROP_REFRACT, PROP_DIFFUSE, PROP_SPECULAR, PROP_TEXTURE, PROP_GAMMA,
    PROP_FRESNEL, PROP_TRANSP, CLIP_SURF, CLIP_ENTER, CLIP_LEAVE)

F32 = jnp.float32
I32 = jnp.int32
BIG = jnp.float32(1e30)


def set_element(dtype) -> None:
    """RT_ELEMENT analog (rtbase.h:331-361): switch the jnp reference
    tracer's element type. The reference ships an fp32/fp64 binary
    matrix (core_make_x64.mk:44 x64f32/x64f64); here the same tracer
    code runs in either precision — float64 requires
    ``jax.config.update('jax_enable_x64', True)`` first. Jit caches key
    on input dtypes, so both tiers coexist in one process; scene tables
    must be upcast by the caller (see tests/test_fp64.py)."""
    global F32, BIG
    F32 = dtype
    BIG = dtype(1e30)
# All K=3 geometry contractions are written as EXPLICIT elementwise
# mul/add chains (never einsum/matmul): XLA:TPU lowers matmuls to MXU
# passes whose rounding differs from IEEE mul+add by ~1 ulp, which is
# enough to flip exact boundary cases the reference relies on (e.g.
# test11 places lights exactly on pane planes; the shadow hit must land
# exactly at t == t_max == 1 to be excluded). Elementwise VPU f32 ops are
# IEEE-exact and bit-identical between CPU, TPU-XLA, and Mosaic, keeping
# all three paths in exact agreement.
def _apply3(m, vx, vy, vz):
    """y_i = sum_j m[..., i, j] v_j with a fixed (left-to-right) add
    order matching the Pallas kernel's scalar expansion."""
    yx = m[..., 0, 0] * vx + m[..., 0, 1] * vy + m[..., 0, 2] * vz
    yy = m[..., 1, 0] * vx + m[..., 1, 1] * vy + m[..., 1, 2] * vz
    yz = m[..., 2, 0] * vx + m[..., 2, 1] * vy + m[..., 2, 2] * vz
    return jnp.stack([yx, yy, yz], axis=-1)


def _apply3t(m, vx, vy, vz):
    """Transposed apply: y_i = sum_j m[..., j, i] v_j (normal transform)."""
    yx = m[..., 0, 0] * vx + m[..., 1, 0] * vy + m[..., 2, 0] * vz
    yy = m[..., 0, 1] * vx + m[..., 1, 1] * vy + m[..., 2, 1] * vz
    yz = m[..., 0, 2] * vx + m[..., 1, 2] * vy + m[..., 2, 2] * vz
    return jnp.stack([yx, yy, yz], axis=-1)
D_EPS = 1e-11   # RT_DEPS_THRESHOLD (object.h:41): near-zero determinant
T_EPS = 1e-7    # RT_TEPS_THRESHOLD (object.h:42): root sorting / apex nudge


class TraceConfig(NamedTuple):
    depth: int = 10          # RT_STACK_DEPTH (tracer.h:46)
    max_segments: int = 48   # iteration cap for the branch-stack loop
    stack: int = 10          # branch-stack capacity per lane
    cutoff: float = 1.0 / 1024.0  # throughput cutoff for continuations
    d_eps: float = 0.0       # determinant epsilon (srf_D_EPS analog)
    schlick: bool = False    # RT_FEAT_SCHLICK: Schlick instead of exact
    # dielectric Fresnel on the transparency path
    unroll: int = 16         # kernel surface groups up to this size are
    # unrolled (static SMEM offsets, hoistable out of the segment loop)
    cull: bool = True        # kernel bounding-sphere block culling (the
    # AR_ptr whole-sublist skip analog, tracer.cpp:3953-4056): skip a
    # surface's solver entirely when no ray in the on-chip block can
    # reach its world bounding sphere
    cand: bool = True        # per-block compacted surface candidate
    # lists for the primary segment (the 8x8-tile tilebuffer candidate
    # list analog, engine.cpp:3129-3253, at screen-tile granularity):
    # the peeled first segment loops over len(candidates[block])
    # surfaces instead of NS. Ignored when cull is False
    lsort: bool = True       # static per-(receiver-surface, light)
    # shadow blocker masks (the lsort per-light shadow list analog,
    # engine.cpp:2456-2757): a blocker can occlude light L for hits on
    # surface R only if its sphere meets the capsule hull of (L, R's
    # sphere); the kernel ANDs the union of the block's receiver masks
    # into the shadow reach bitmask. Ignored when cull is False
    sub: int = 64            # kernel block height in sublanes: one
    # on-chip block = sub*128 rays = a tile_shape(fsaa, sub*128) screen
    # window. 64 amortizes per-surface scalar work over 8192 rays; 8
    # gives 32x32-px windows (tighter bundles, finer retirement) at 8x
    # the scalar overhead per ray
    chunk: int = 32          # two-tier guard granularity: the runtime
    # reach masks are also evaluated per CHUNK of `chunk` sublane rows
    # (chunk*128 rays); a surface reachable by only SOME chunks runs
    # its solver on just those row slices — a finer-grained echo of the
    # reference's 4-16-ray-packet sphere skip (AR_ptr,
    # tracer.cpp:3953-4056). A surface reachable by ALL chunks takes
    # the single full-block body (no extra cost on coherent segments).
    # Measured (r5, NS>=104 scenes): each chunk body re-pays the
    # per-surface scalar/setup cost, so fine granularity is mostly
    # self-canceling — chunk=32 (2 halves) wins ~3-8% on test13/demo03,
    # 16 is neutral, 8 loses. 0, or sub % chunk != 0, disables the
    # second tier


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _eval_implicit(kind, sci, scjh, sciw, p):
    """F(p) per surface kind: plane -> p_k; quadric -> sci.p^2-2 scjh.p-sciw.
    Shapes: kind (...,), sci/scjh (..., 3), sciw (...,), p (..., 3)."""
    quad = (jnp.sum(sci * p * p, -1) - 2.0 * jnp.sum(scjh * p, -1) - sciw)
    return jnp.where(kind == 1, p[..., 2], quad)


def _safe_div(num, den, fallback=BIG):
    bad = jnp.abs(den) < 1e-30
    return jnp.where(bad, fallback, num / jnp.where(bad, 1.0, den))


def intersect(sc: SceneArrays, org, dirs, t_min, t_max,
              origin_srf, origin_side, pass_thru,
              shadow: bool = False, origin_loc=None):
    """Nearest valid hit over all surfaces.

    org/dirs (N,3); t_min/t_max (N,); origin_srf (N,) i32 (-1 none);
    origin_side (N,) i32 (+1 outer/-1 inner); pass_thru (N,) bool.
    origin_loc (N,3) optional: the LOCAL (canonical-frame, apex-adjusted)
    hit point on the originating surface; when given, the re-test of that
    surface uses it as the local ray origin instead of re-transforming
    the world origin (the reference's secondary-ray local-diff reuse,
    tracer.cpp:1350-1373 + 2269-2284 — fp-exact self-reintersection, which
    decides root selection on TIR/grazing continuations).

    Returns dict with t (N,), srf (N,) i32 (-1 miss), side (N,) i32,
    x (N,3) world hit, p (N,3) local hit, n (N,3) unit shading normal
    (facing the incoming ray), hit (N,) bool.
    When ``shadow`` is True, only surfaces that block light are considered
    (CHECK_SHAD rule) and the cheapest any-hit result is returned.
    """
    NS = sc.s_pos.shape[0]
    # world->canonical: o_l, d_l (N, NS, 3)
    rel = org[:, None, :] - sc.s_pos[None, :, :]
    inv_b = sc.s_inv[None, :, :, :]                  # (1, NS, 3, 3)
    o_l = _apply3(inv_b, rel[..., 0], rel[..., 1], rel[..., 2])
    d_l = _apply3(inv_b, dirs[:, None, 0], dirs[:, None, 1],
                  dirs[:, None, 2])
    if origin_loc is not None:
        own = (jnp.arange(NS, dtype=I32)[None, :]
               == origin_srf[:, None])               # (N, NS)
        o_l = jnp.where(own[..., None], origin_loc[:, None, :], o_l)

    sci = sc.s_sci[None, :, :]
    scjh = sc.s_scjh[None, :, :]
    kind = sc.s_kind[None, :]                       # (1, NS)

    # quadric: F(o + t d) = a t^2 + 2 b t + c (tracer.cpp:4388-4447)
    a = jnp.sum(sci * d_l * d_l, -1)
    b = jnp.sum((sci * o_l - scjh) * d_l, -1)
    c = _eval_implicit(kind, sci, scjh, sc.s_sciw[None, :], o_l)

    is_plane = kind == 1
    is_tp = kind == 3

    # determinant; for the degenerate two-plane (hypercylinder with hyp=0,
    # i^2 = rat^2 k^2) the reference computes it in exact factored form
    # |sci_i*sci_k|*(dff_i*ray_k - dff_k*ray_i)^2 (TP_ptr "d" section,
    # tracer.cpp:4239-4246), sidestepping b^2-a*c cancellation
    cross = (o_l[..., 0] * d_l[..., 2] - o_l[..., 2] * d_l[..., 0])
    disc_tp = jnp.abs(sci[..., 0] * sci[..., 2]) * cross * cross
    disc = jnp.where(is_tp, disc_tp, b * b - a * c)
    quad_ok = disc >= 0.0
    # double-where keeps sqrt's gradient finite on miss lanes
    sq = jnp.where(disc > 0.0,
                   jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0)), 0.0)
    # stable b-mixed roots (tracer.cpp:4518-4547): q = -(b + sign(b) sq);
    # the ENTERING root (F' = -2|sq| < 0, i.e. the outer-side hit) is
    # q/a when b > 0 else c/q — assigned structurally, never re-derived
    # from the gradient at the hit point (QD_rc1/QD_rc2 always bind root 1
    # to SIDE_OUTER and root 2 to SIDE_INNER, tracer.cpp:4695-4820)
    sgn_b = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -(b + sgn_b * sq)
    b_pos = b > 0.0

    def _root(num, den):
        """nan-root handling (tracer.cpp:4585-4600): zero numerator ->
        root 0; zero denominator (nonzero numerator) -> invalid."""
        nz = num == 0.0
        den = jnp.where(nz, 1.0, den)
        ok = den != 0.0
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), BIG), ok

    t1, ok1 = _root(jnp.where(b_pos, q, c), jnp.where(b_pos, a, q))
    t2, ok2 = _root(jnp.where(b_pos, c, q), jnp.where(b_pos, q, a))

    # root sorting for near-zero determinant (tracer.cpp:4572-4623):
    # when 0 <= d < D_EPS and the roots are out of order w.r.t. sign(a),
    # replace them by mid -+ |T_EPS*t1| so outer stays in front
    dmask = quad_ok & (disc < D_EPS) & ~is_plane
    sgn_a = jnp.where(a >= 0.0, 1.0, -1.0)
    u = (t1 - t2) * sgn_a
    fm = u >= 0.0
    tdff = jnp.where(fm, -0.5 * u - jnp.abs(T_EPS * t1), 0.0) * sgn_a
    tdff = jnp.where(dmask & ok1 & ok2, tdff, 0.0)
    t1 = t1 + tdff
    t2 = t2 - tdff

    # plane: t = -o_k / d_k (tracer.cpp:4062-4210 in axis-mapped frame);
    # side from ray direction against +K (outer/inner split PL_ptr)
    t_pl = _safe_div(-o_l[..., 2], d_l[..., 2])
    # division-free exact t-window test for plane roots: TPU f32 division
    # is not correctly rounded (x/x can yield 0.99999994), which flips
    # exact boundary cases the reference depends on — e.g. test11 places
    # lights exactly on pane planes, so the shadow hit must land exactly
    # at t == t_max == 1 and be excluded by the strict compare. Comparing
    # num vs t*den (sign-aware) uses only IEEE-exact mul/cmp.
    num_pl = -o_l[..., 2]
    den_pl = d_l[..., 2]
    pos_d = den_pl > 0.0
    tmin_d = t_min[:, None] * den_pl
    tmax_d = t_max[:, None] * den_pl
    win_pl = (den_pl != 0.0) \
        & jnp.where(pos_d, num_pl > tmin_d, num_pl < tmin_d) \
        & jnp.where(pos_d, num_pl < tmax_d, num_pl > tmax_d)

    root_a = jnp.where(is_plane, t_pl, jnp.where(quad_ok & ok1, t1, BIG))
    root_b = jnp.where(is_plane, BIG, jnp.where(quad_ok & ok2, t2, BIG))
    roots = jnp.stack([root_a, root_b], axis=-1)     # (N, NS, 2)

    # structural side per root: slot 0 = outer (+1), slot 1 = inner (-1);
    # planes take the ray-vs-K sign for their single root
    side_pl = jnp.where(d_l[..., 2] < 0.0, 1, -1)
    side_q = jnp.broadcast_to(jnp.array([1, -1], jnp.int32), roots.shape)
    side_r = jnp.where(is_plane[..., None], side_pl[..., None], side_q)

    # local + world hit points per root
    p_r = o_l[:, :, None, :] + roots[..., None] * d_l[:, :, None, :]
    x_r = org[:, None, None, :] + roots[..., None] * dirs[:, None, None, :]

    # conic singularity solver (CC_glb, tracer.cpp:1706-1860): when the
    # determinant was near zero and the hit lies within sqrt(T_EPS) of the
    # apex of a cone-like surface, the point used for clipping (and the
    # normal/UV derived from it) is replaced by a T_EPS-sized nudge from
    # the apex along the surface toward the ray origin, with side- and
    # sign(a)-dependent sign flips
    if True:
        sing = sc.s_sing[None, :, None]              # (1, NS, 1)
        cyl = sing == 2
        r2loc = jnp.sum(p_r * p_r, -1)
        hm = (sing > 0) & dmask[..., None] & (r2loc < T_EPS)
        sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
        o3 = o_l[:, :, None, :]
        ratio = jnp.abs(_safe_div(
            sci[..., 0] + jnp.where(cyl[..., 0], 0.0, sci[..., 1]),
            sci[..., 2], 0.0))[..., None]            # (N?, NS, 1)
        ratio = jnp.broadcast_to(ratio, hm.shape)
        acc = jnp.where(cyl, 1.0, 2.0)
        inv_r = T_EPS * jax.lax.rsqrt(jnp.maximum(ratio + acc, 1e-30))
        inner = side_r < 0
        a_neg = (a < 0.0)[..., None]
        ij_flip = jnp.where(inner & ~a_neg, -1.0, 1.0)
        k_flip = jnp.where(~inner & a_neg, -1.0, 1.0)
        adj_i = sgn(o3[..., 0]) * ij_flip * inv_r
        adj_j = jnp.where(cyl, 0.0, sgn(o3[..., 1]) * ij_flip * inv_r)
        adj_k = (sgn(o3[..., 2]) * k_flip * jnp.sqrt(ratio) * inv_r)
        adj = jnp.stack([adj_i, adj_j, adj_k], axis=-1)
        p_r = jnp.where(hm[..., None], adj, p_r)
        x_adj = sc.s_pos[None, :, None, :] + _apply3(
            sc.s_fwd[None, :, None, :, :],
            adj[..., 0], adj[..., 1], adj[..., 2])
        x_r = jnp.where(hm[..., None], x_adj, x_r)

    # gradient at the (possibly adjusted) hit point: g = sci p - scjh
    # (plane: +K); drives the shading normal
    g_r = jnp.where(is_plane[..., None, None],
                    jnp.array([0.0, 0.0, 1.0], F32),
                    sci[:, :, None, :] * p_r - scjh[:, :, None, :])

    # validity: t window (strict, tracer.cpp CC_clp depth test); planes
    # use the division-free window above
    in_win = (roots > t_min[:, None, None]) & (roots < t_max[:, None, None])
    pl_sl0 = is_plane[..., None] & jnp.array([True, False])[None, None, :]
    valid = jnp.where(pl_sl0, win_pl[..., None], in_win)
    valid &= jnp.isfinite(roots) & (roots < BIG)
    valid &= sc.s_kind[None, :, None] > 0            # padding

    # axis clips in canonical frame (CX/CY/CZ min/max, tracer.cpp:1883-1927)
    cmin = sc.s_cmin[None, :, None, :]
    cmax = sc.s_cmax[None, :, None, :]
    valid &= jnp.all((p_r >= cmin) & (p_r <= cmax), axis=-1)

    # custom clip programs with accum segments (CC_cyc, tracer.cpp:1939-2160)
    NC = sc.c_op.shape[1]
    mask = valid
    saved = jnp.ones_like(valid)
    for j in range(NC):
        opj = sc.c_op[:, j]                          # (NS,)
        refj = jnp.maximum(sc.c_ref[:, j], 0)
        sidej = sc.c_side[:, j]
        # clipper's implicit value at the candidate hit point
        relc = x_r - sc.s_pos[refj][None, :, None, :]
        pc = _apply3(sc.s_inv[refj][None, :, None, :, :],
                     relc[..., 0], relc[..., 1], relc[..., 2])
        v = _eval_implicit(sc.s_kind[refj][None, :, None],
                           sc.s_sci[refj][None, :, None, :],
                           sc.s_scjh[refj][None, :, None, :],
                           sc.s_sciw[refj][None, :, None], pc)
        keep = jnp.where(sidej[None, :, None] >= 0.0, v <= 0.0, v >= 0.0)
        is_srf = (opj == CLIP_SURF)[None, :, None]
        is_ent = (opj == CLIP_ENTER)[None, :, None]
        is_lve = (opj == CLIP_LEAVE)[None, :, None]
        saved = jnp.where(is_ent, mask, saved)
        mask = jnp.where(is_srf, mask & keep,
                         jnp.where(is_ent, jnp.ones_like(mask),
                                   jnp.where(is_lve, saved & ~mask, mask)))
    valid = mask

    # exact self-intersection skip (CHECK_SIDE, tracer.cpp:523-540)
    srf_ids = jnp.arange(NS, dtype=I32)[None, :, None]
    same = srf_ids == origin_srf[:, None, None]
    allowed = jnp.where(pass_thru[:, None, None],
                        side_r != origin_side[:, None, None],
                        side_r == origin_side[:, None, None])
    valid &= ~same | allowed

    if shadow:
        # blocker rule (CHECK_SHAD): emissive and unbent fully-transparent
        # surfaces don't occlude
        mat_idx = jnp.where(side_r > 0, sc.s_mat[None, :, None, 0],
                            sc.s_mat[None, :, None, 1])
        props = sc.m_props[mat_idx]
        emissive = (props & PROP_LIGHT) != 0
        transp = (props & PROP_TRANSP) != 0
        refract = (props & PROP_REFRACT) != 0
        blocks = ~emissive & ~(transp & ~refract)
        valid &= blocks
        return jnp.any(valid, axis=(1, 2))

    t_cand = jnp.where(valid, roots, BIG).reshape(-1, NS * 2)
    best = jnp.argmin(t_cand, axis=1)                # (N,)
    t = jnp.take_along_axis(t_cand, best[:, None], 1)[:, 0]
    hit = t < BIG
    bs = (best // 2).astype(I32)
    br = best % 2
    srf = jnp.where(hit, bs, -1)

    lanes = jnp.arange(t.shape[0])
    take = lambda arr: arr[lanes, bs, br]
    side = take(side_r)
    p = take(p_r)
    x = take(x_r)
    g = take(g_r)

    # world normal: n = inv^T g, normalized, flipped to the hit side
    inv_s = sc.s_inv[bs]                             # (N, 3, 3)
    n_w = _apply3t(inv_s, g[..., 0], g[..., 1], g[..., 2])
    n_w = n_w * side[:, None].astype(F32)
    n_w = n_w * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(n_w * n_w, -1, keepdims=True), 1e-30))
    return dict(t=t, srf=srf, side=side, x=x, p=p, n=n_w, hit=hit)


# ---------------------------------------------------------------------------
# materials + shading
# ---------------------------------------------------------------------------

def material_index(sc: SceneArrays, srf, side):
    s = jnp.maximum(srf, 0)
    return jnp.where(side > 0, sc.s_mat[s, 0], sc.s_mat[s, 1])


def texture_color(sc: SceneArrays, midx, p_local):
    """Texture fetch (MT_tex, tracer.cpp:2297-2321): integer mask/shift
    addressing over pow-2 dims; UV = local I,J; gamma decode x^2 when the
    GAMMA prop is on (PAINT_COLX, tracer.cpp:664-673)."""
    props = sc.m_props[midx]
    base = sc.m_tex_base[midx]
    u = (p_local[..., 0] - sc.m_tex_off[midx, 0])
    v = (p_local[..., 1] - sc.m_tex_off[midx, 1])
    xdim = (sc.m_tex_xmask[midx] + 1).astype(F32)
    ydim = (sc.m_tex_ymask[midx] + 1).astype(F32)
    ix = jnp.floor(u * xdim / sc.m_tex_scl[midx, 0]).astype(I32)
    iy = jnp.floor(v * ydim / sc.m_tex_scl[midx, 1]).astype(I32)
    ix &= sc.m_tex_xmask[midx]
    iy &= sc.m_tex_ymask[midx]
    idx = jnp.maximum(base, 0) + (iy << sc.m_tex_xshift[midx]) + ix
    texel = sc.tex_data[idx]
    col = jnp.where((base >= 0)[..., None], texel, sc.m_col[midx])
    gamma = ((props & PROP_GAMMA) != 0) & (sc.use_gamma > 0)
    return jnp.where(gamma[..., None], col * col, col)


def shade(sc: SceneArrays, cfg: TraceConfig, x, p, n, ray_d, srf, side, hit):
    """Local color: ambient + per-light diffuse/specular with hard shadows
    (LT_reg..LT_end, tracer.cpp:2709-3180)."""
    midx = material_index(sc, srf, side)
    props = sc.m_props[midx]
    tex = texture_color(sc, midx, p)

    emissive = (props & PROP_LIGHT) != 0
    col = tex * sc.amb_col[None, :]

    NL = sc.l_pos.shape[0]
    zero_t = jnp.zeros_like(x[:, 0])
    for li in range(NL):
        lvec = sc.l_pos[li][None, :] - x                 # L = pos - hit
        r_dot = jnp.sum(lvec * n, -1)
        lit = (r_dot > 0.0) & (sc.l_on[li] > 0) & hit
        # shadow any-hit along hit -> light, t in (0, 1) (lgt_T_MAX = 1)
        occ = intersect(sc, x, lvec, zero_t, jnp.ones_like(zero_t),
                        srf, side, jnp.zeros_like(lit), shadow=True,
                        origin_loc=p)
        hm = lit & ~occ
        r2 = jnp.sum(lvec * lvec, -1)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        attn = jax.lax.rsqrt(jnp.maximum(
            sc.l_cnt[li] + sc.l_lnr[li] * r + sc.l_qdr[li] * r2, 1e-30))
        dfs = jnp.where(hm & ((props & PROP_DIFFUSE) != 0),
                        r_dot / r * attn * sc.m_dff[midx], 0.0)
        # specular: reflect L about n, dot with view ray
        rl = lvec - 2.0 * r_dot[:, None] * n
        sdot = jnp.sum(rl * ray_d, -1)
        cosr = sdot * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(ray_d * ray_d, -1) * r2, 1e-30))
        spc_on = hm & (sdot > 0.0) & ((props & PROP_SPECULAR) != 0)
        cosr = jnp.clip(jnp.where(spc_on, cosr, 1.0), 1e-6, 1.0)
        spc = jnp.where(spc_on,
                        jnp.power(cosr, sc.m_pow[midx]) * sc.m_spc[midx],
                        0.0)
        lcol = sc.l_col[li][None, :]
        metal = (props & PROP_METAL) != 0
        contrib_metal = tex * lcol * (dfs + spc)[:, None]
        contrib_plain = tex * lcol * dfs[:, None] + lcol * spc[:, None]
        col = col + jnp.where(metal[:, None], contrib_metal, contrib_plain)

    return jnp.where(emissive[:, None], tex, col)


def fresnel_metal_fast(dot, rcp, ext2):
    """Approximate conductor reflectance (FRESNEL_METAL fast, the default
    build variant; tracer.cpp:3730-3752). dot = cos(incidence) with sign
    (negative: shading normal faces the ray); rcp = 1/rfr (mat_C_RCP);
    ext2 = ext^2 (mat_EXT_2)."""
    t = 2.0 * dot * rcp
    c2 = dot * dot
    g = rcp * rcp + ext2
    x0 = c2 + g
    x1 = c2 * g + 1.0
    rs = _safe_div(x0 + t, x0 - t, 1.0)
    rp = _safe_div(x1 + t, x1 - t, 1.0)
    return jnp.abs(-0.5 * (rs + rp))


def fresnel_metal_slow(dot, rcp, ext2):
    """Exact conductor reflectance via the a^2/b^2 formulation
    (FRESNEL_METAL_SLOW, tracer.cpp:3682-3726)."""
    c2 = dot * dot
    sin2 = 1.0 - c2
    n2 = rcp * rcp
    t0 = n2 - ext2 - sin2
    u = jnp.sqrt(t0 * t0 + 4.0 * n2 * ext2)
    a2 = jnp.abs(0.5 * (t0 + u))
    twoac = 2.0 * jnp.sqrt(a2) * dot               # negative
    rs = _safe_div(c2 + u + twoac, c2 + u - twoac, 1.0)
    rp_f = _safe_div(c2 * u + sin2 * sin2 + twoac * sin2,
                     c2 * u + sin2 * sin2 - twoac * sin2, 1.0)
    return jnp.abs(-0.5 * (rs + rs * rp_f))


def fresnel_schlick(dot, eta, sq):
    """Schlick approximation (RT_FEAT_SCHLICK, tracer.cpp:3355-3381):
    R0 + (1-R0)(1-cos)^5, with the exit-side cosine (the refraction
    sqrt) when eta > 1."""
    x = jnp.where(eta > 1.0, 1.0 - sq, 1.0 + dot)
    r = _safe_div(eta - 1.0, eta + 1.0, 1.0)
    r0 = r * r
    x5 = (x * x) * (x * x) * x
    return r0 + (1.0 - r0) * x5


def fresnel_terms(sc: SceneArrays, midx, d, n,
                  schlick: bool = False):
    """Effective reflect/refract weights + refraction direction
    (TR section, tracer.cpp:3182-3424): Snell with ratio eta = m_rfr, TIR
    folds transparency into reflectivity, exact dielectric (or Schlick)
    Fresnel moves trn*F into rfl when enabled; plus the RF-section
    reflectivity Fresnel for OPAQUE reflective materials
    (tracer.cpp:3671-3830): metal fast formula for metals, the plain
    dielectric formula otherwise, scaling c_rfl by F."""
    props = sc.m_props[midx]
    eta = sc.m_rfr[midx]
    trn = sc.m_trn[midx]
    rfl = sc.m_rfl[midx]

    dlen = jax.lax.rsqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-30))
    rhat = d * dlen[:, None]
    dot = jnp.sum(rhat * n, -1)                      # negative (n faces ray)
    k = 1.0 - eta * eta + (eta * dot) ** 2
    refracts = (props & PROP_REFRACT) != 0
    tir = (k < 0.0) & refracts
    sq = jnp.where(k > 0.0, jnp.sqrt(jnp.where(k > 0.0, k, 1.0)), 0.0)
    refr_dir = jnp.where(refracts[:, None],
                         eta[:, None] * rhat
                         - n * (eta * dot + sq)[:, None],
                         rhat)

    fres_prop = ((props & PROP_FRESNEL) != 0) & (sc.use_fresnel > 0)
    fres_on = fres_prop & ((props & PROP_OPAQUE) == 0)
    if schlick:
        F = fresnel_schlick(dot, eta, sq)
    else:
        # exact dielectric reflectance (tracer.cpp:3383-3401)
        rs = _safe_div(eta * dot + sq, eta * dot - sq, 1.0)
        rp = _safe_div(dot + eta * sq, dot - eta * sq, 1.0)
        F = 0.5 * (rs * rs + rp * rp)
    F = jnp.clip(F, 0.0, 1.0)
    F = jnp.where(fres_on, F, 0.0)
    # total internal reflection folds transparency into reflectivity
    # ONLY under Fresnel (tracer.cpp:3268-3301 is inside
    # RT_FEAT_FRESNEL): without it the reference's refraction sqrt goes
    # NaN for TIR lanes and the transmitted ray hits nothing — TIR
    # lanes transmit zero and gain NO reflectivity (root cause of the
    # round-4 demo02 band and the test13 TIR region)
    F = jnp.where(tir & fres_on, 1.0, F)

    c_trn = trn * (1.0 - F)
    c_rfl = rfl + trn * F
    c_trn = jnp.where(tir, 0.0, c_trn)

    # RF-section Fresnel: OPAQUE + REFLECT materials scale c_rfl by F
    # (metal fast for metals — the default build has FRESNEL_METAL=1,
    # FRESNEL_METAL_SLOW=0 — else the plain dielectric formula)
    rf_on = fres_prop & ((props & PROP_OPAQUE) != 0) & \
        ((props & PROP_REFLECT) != 0)
    rcp = _safe_div(jnp.ones_like(eta), eta, 0.0)    # mat_C_RCP = 1/rfr
    ext2 = sc.m_ext[midx] ** 2                       # mat_EXT_2
    f_metal = fresnel_metal_fast(dot, rcp, ext2)
    rs_o = _safe_div(eta * dot + sq, eta * dot - sq, 1.0)
    rp_o = _safe_div(dot + eta * sq, dot - eta * sq, 1.0)
    f_plain = jnp.abs(-0.5 * (rs_o * rs_o + rp_o * rp_o))
    f_rf = jnp.where((props & PROP_METAL) != 0, f_metal, f_plain)
    c_rfl = jnp.where(rf_on, rfl * f_rf, c_rfl)
    return c_rfl, c_trn, refr_dir, tir


# ---------------------------------------------------------------------------
# the iterative Whitted loop
# ---------------------------------------------------------------------------

def _onehot(i, d):
    return jax.nn.one_hot(i, d, dtype=jnp.bool_)


@partial(jax.jit, static_argnames=("cfg",))
def trace_rays(sc: SceneArrays, org, dirs, t_min, cfg: TraceConfig):
    """Trace N rays to completion; returns (N, 3) linear radiance."""
    N = dirs.shape[0]
    D = cfg.stack

    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))

    state = dict(
        org=org.astype(F32), dir=dirs.astype(F32),
        thr=jnp.ones((N, 3), F32),
        depth=jnp.zeros((N,), I32),
        osrf=jnp.full((N,), -1, I32), oside=jnp.ones((N,), I32),
        thru=jnp.zeros((N,), jnp.bool_),
        oloc=jnp.zeros((N, 3), F32),
        tmin=t_min.astype(F32),
        active=jnp.ones((N,), jnp.bool_),
        acc=jnp.zeros((N, 3), F32),
        sp=jnp.zeros((N,), I32),
        st_org=jnp.zeros((N, D, 3), F32), st_dir=jnp.zeros((N, D, 3), F32),
        st_thr=jnp.zeros((N, D, 3), F32), st_depth=jnp.zeros((N, D), I32),
        st_srf=jnp.zeros((N, D), I32), st_side=jnp.zeros((N, D), I32),
        st_oloc=jnp.zeros((N, D, 3), F32),
        it=jnp.zeros((), I32),
    )

    def cond(st):
        return jnp.any(st["active"]) & (st["it"] < cfg.max_segments)

    body = _make_body(sc, cfg, N, D)
    out = jax.lax.while_loop(cond, body, state)
    return out["acc"]


def _make_body(sc: SceneArrays, cfg: TraceConfig, N: int, D: int):
    """One bounce of the iterative Whitted loop (shared by the while_loop
    inference path and the scan-based differentiable path)."""

    def body(st):
        act = st["active"]
        h = intersect(sc, st["org"], st["dir"], st["tmin"],
                      jnp.full((N,), BIG), st["osrf"], st["oside"],
                      st["thru"], origin_loc=st["oloc"])
        hit = h["hit"] & act
        local = shade(sc, cfg, h["x"], h["p"], h["n"], st["dir"],
                      h["srf"], h["side"], hit)
        midx = material_index(sc, h["srf"], h["side"])
        c_rfl, c_trn, refr_dir, _ = fresnel_terms(sc, midx, st["dir"],
                                                  h["n"], cfg.schlick)
        # local color weight uses the ORIGINAL material rfl/trn (TR_mix
        # loads mat_C_TRN/mat_C_RFL, tracer.cpp:3566-3571), NOT the
        # Fresnel-modulated values — they only scale sub-ray returns.
        # Identical for the transparency path (the Fresnel transfer is
        # energy-conserving) but not for metal reflectivity Fresnel.
        local_w = jnp.maximum(1.0 - sc.m_trn[midx] - sc.m_rfl[midx], 0.0)
        acc = st["acc"] + jnp.where(hit[:, None],
                                    st["thr"] * local * local_w[:, None],
                                    0.0)

        # continuations
        deep_ok = st["depth"] < cfg.depth
        thr_rfl = st["thr"] * c_rfl[:, None]
        thr_trn = st["thr"] * c_trn[:, None]
        go_rfl = hit & deep_ok & (jnp.max(thr_rfl, -1) > cfg.cutoff)
        go_trn = hit & deep_ok & (jnp.max(thr_trn, -1) > cfg.cutoff)

        ddotn = jnp.sum(st["dir"] * h["n"], -1)
        refl_dir = st["dir"] - 2.0 * ddotn[:, None] * h["n"]

        # push refraction branch where both continue
        push = go_rfl & go_trn & (st["sp"] < D)
        oh = _onehot(jnp.where(push, st["sp"], D), D)  # (N, D) false if !push
        put = lambda stk, val: jnp.where(
            oh[..., None] if stk.ndim == 3 else oh,
            val[:, None, :] if stk.ndim == 3 else val[:, None], stk)
        st_org = put(st["st_org"], h["x"])
        st_dir = put(st["st_dir"], refr_dir)
        st_thr = put(st["st_thr"], thr_trn)
        st_depth = put(st["st_depth"], st["depth"] + 1)
        st_srf = put(st["st_srf"], h["srf"])
        st_side = put(st["st_side"], h["side"])
        st_oloc = put(st["st_oloc"], h["p"])
        sp = st["sp"] + push.astype(I32)

        # continue with reflection if live, else refraction, else pop
        cont = go_rfl | go_trn
        use_rfl = go_rfl
        n_org = h["x"]
        n_dir = jnp.where(use_rfl[:, None], refl_dir, refr_dir)
        n_thr = jnp.where(use_rfl[:, None], thr_rfl, thr_trn)
        n_depth = st["depth"] + 1
        n_osrf = h["srf"]
        n_oside = h["side"]
        n_thru = ~use_rfl

        # pop for lanes that don't continue
        can_pop = act & ~cont & (sp > 0)
        psp = jnp.maximum(sp - 1, 0)
        grab = lambda stk: jnp.take_along_axis(
            stk, psp[:, None, None] if stk.ndim == 3 else psp[:, None],
            1)[:, 0]
        p_org, p_dir, p_thr = grab(st_org), grab(st_dir), grab(st_thr)
        p_depth, p_srf, p_side = grab(st_depth), grab(st_srf), grab(st_side)
        p_oloc = grab(st_oloc)

        sel3 = lambda c, a_, b_: jnp.where(c[:, None], a_, b_)
        new = dict(
            org=sel3(cont, n_org, jnp.where(can_pop[:, None], p_org,
                                            st["org"])),
            dir=sel3(cont, n_dir, jnp.where(can_pop[:, None], p_dir,
                                            st["dir"])),
            thr=sel3(cont, n_thr, jnp.where(can_pop[:, None], p_thr,
                                            st["thr"])),
            depth=jnp.where(cont, n_depth, jnp.where(can_pop, p_depth,
                                                     st["depth"])),
            osrf=jnp.where(cont, n_osrf, jnp.where(can_pop, p_srf,
                                                   st["osrf"])),
            oside=jnp.where(cont, n_oside, jnp.where(can_pop, p_side,
                                                     st["oside"])),
            oloc=sel3(cont, h["p"], jnp.where(can_pop[:, None], p_oloc,
                                              st["oloc"])),
            thru=jnp.where(cont, n_thru, can_pop),  # popped = refraction
            tmin=jnp.where(cont | can_pop, 0.0, st["tmin"]),
            active=act & (cont | can_pop),
            acc=acc,
            sp=jnp.where(can_pop, psp, sp),
            st_org=st_org, st_dir=st_dir, st_thr=st_thr,
            st_depth=st_depth, st_srf=st_srf, st_side=st_side,
            st_oloc=st_oloc,
            it=st["it"] + 1,
        )
        return new

    return body


@partial(jax.jit, static_argnames=("cfg",))
def trace_rays_diff(sc: SceneArrays, org, dirs, t_min, cfg: TraceConfig):
    """Differentiable variant of trace_rays: fixed-trip-count scan instead
    of while_loop so reverse-mode AD works (inverse rendering). Same body;
    always runs cfg.max_segments iterations."""
    N = dirs.shape[0]
    D = cfg.stack
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    state = dict(
        org=org.astype(F32), dir=dirs.astype(F32),
        thr=jnp.ones((N, 3), F32),
        depth=jnp.zeros((N,), I32),
        osrf=jnp.full((N,), -1, I32), oside=jnp.ones((N,), I32),
        thru=jnp.zeros((N,), jnp.bool_),
        oloc=jnp.zeros((N, 3), F32),
        tmin=t_min.astype(F32),
        active=jnp.ones((N,), jnp.bool_),
        acc=jnp.zeros((N, 3), F32),
        sp=jnp.zeros((N,), I32),
        st_org=jnp.zeros((N, D, 3), F32), st_dir=jnp.zeros((N, D, 3), F32),
        st_thr=jnp.zeros((N, D, 3), F32), st_depth=jnp.zeros((N, D), I32),
        st_srf=jnp.zeros((N, D), I32), st_side=jnp.zeros((N, D), I32),
        st_oloc=jnp.zeros((N, D, 3), F32),
        it=jnp.zeros((), I32),
    )
    body = _make_body(sc, cfg, N, D)

    def scan_body(st, _):
        return body(st), None

    out, _ = jax.lax.scan(scan_body, state, None, length=cfg.max_segments)
    return out["acc"]


def render(sc: SceneArrays, width: int, height: int, fsaa: int = 1,
           cfg: TraceConfig = TraceConfig()):
    """Render a full frame: (H, W, 3) linear float radiance in [0, inf)."""
    from quadray_tpu.ops.rays import camera_rays, resolve_aa
    org, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm,
                            sc.cam_pov, width, height, fsaa)
    n = dirs.shape[0]
    t_min = jnp.full((n,), sc.cam_pov, F32)
    cols = trace_rays(sc, org, dirs, t_min, cfg)
    cols = jnp.clip(cols, 0.0, 1.0)
    return resolve_aa(cols, width, height, fsaa)


def to_frame(img, use_gamma) -> jnp.ndarray:
    """Convert linear radiance to uint8 frame with the reference's
    approximate gamma encode sqrt(x) (FRAME_COLX, tracer.cpp:988-997)."""
    img = jnp.clip(img, 0.0, 1.0)
    img = jnp.where(use_gamma > 0, jnp.sqrt(img), img)
    return jnp.round(img * 255.0).astype(jnp.uint8)
