"""Pallas TPU megakernel: the whole Whitted trace in one kernel.

The TPU re-design of render0 (tracer.cpp:1081-5405): where the reference
keeps 4-16 rays in SIMD registers and walks pointer lists, this kernel
keeps a (SUB, 128) tile of rays on-chip and runs the iterative
branch-stack Whitted loop with semantics IDENTICAL to ops/trace.py (the
differentially-tested reference implementation): one HBM read of the rays
and one write of the colors per block.

Structure specialization (the TPU analog of the reference's per-surface
tag dispatch AR/PL/TP/QD, tracer.cpp:1341-1592, and its per-light shadow
lists, engine.cpp:2456-2757): the kernel is compiled per scene STRUCTURE
— per-surface solver kind, singularity flag, clip-program length, shadow
blocker-ness, material property bits, light count — while all FLOATS
(transforms, coefficients, colors) stay dynamic SMEM reads, so animated
frames reuse the compile cache. Concretely:

  * surfaces are permuted into contiguous classes (plane/quadric x
    has-singularity x has-clips), each traversed by a fori_loop with a
    body that only contains the code that class needs;
  * within each class, shadow BLOCKERS come first, so the per-light
    shadow pass walks a prefix of each class (CHECK_SHAD, evaluated
    statically per material on the host);
  * clip programs run with their actual per-surface trip count (dynamic
    fori bound) instead of the padded maximum;
  * material property bits are static: flag vectors (emissive / metal /
    diffuse / specular / refracting / fresnel) are built from `bmat == m`
    compares over the static subset, and whole blocks (Fresnel,
    refraction, the continuation stack machinery) drop out of scenes
    whose materials cannot trigger them;
  * lights and the material one-hot are unrolled over the real counts.

Root semantics ported 1:1 from ops/trace.py (itself matching
tracer.cpp:4378-4623):
  * stable b-mixed Vieta roots with the nan-root rule (zero numerator ->
    root 0; zero denominator -> invalid),
  * structural sides (slot a = outer/entering, slot b = inner/leaving;
    planes take the ray-vs-K sign),
  * two-plane degenerate determinant in exact factored form,
  * near-zero-determinant root sorting with D_EPS/T_EPS,
  * conic-singularity apex adjustment of the clip/normal point,
  * division-free sign-aware t-window for plane roots (TPU f32 division
    is not correctly rounded),
  * nearest-hit tie-break on the ORIGINAL surface id so the permutation
    is invisible (matches the jnp path's argmin order).

VMEM budget: the while-loop carry holds ~18 ray tiles plus (when any
material can spawn both a reflection and a refraction branch) a branch
stack of cfg.stack x 12 (SUB, 128) f32 tiles; at SUB=64, stack=10 that
is ~4.6 MB before temporaries. render_pallas falls back to the jnp
renderer for scenes the kernel does not support.
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
    SceneArrays, PROP_LIGHT, PROP_METAL, PROP_OPAQUE, PROP_REFLECT,
    PROP_REFRACT, PROP_DIFFUSE, PROP_SPECULAR, PROP_TEXTURE, PROP_FRESNEL,
    PROP_TRANSP, PROP_GAMMA, CLIP_SURF, CLIP_ENTER, CLIP_LEAVE, CLIP_NONE)
from quadray_tpu.ops.trace import TraceConfig, D_EPS, T_EPS
from quadray_tpu.ops.pt import PT_SHALLOW, PT_STACK as PT_SD

F32 = jnp.float32
I32 = jnp.int32
BIG = 1e30

SUB = 64          # default sublanes per block -> block = SUB*128 rays
#                   (TraceConfig.sub overrides per dispatch: 64 = a
#                   64x128-px screen window amortizing per-surface
#                   scalar work over 8192 rays; 8 = 32x32-px windows
#                   with tighter bundles but 8x the scalar overhead)
LANES = 128
BLOCK = SUB * LANES

PF = 44           # per-surface floats: pos 0-2, inv 3-11, sci 12-14,
#                   scjh 15-17, sciw 18, cmin 19-21, cmax 22-24, fwd 25-33,
#                   bounding sphere cx cy cz r2 34-37, PT emission
#                   outer rgb 38-40 / inner rgb 41-43
CF = 22           # per-clip-entry floats
MF = 14           # per-material floats: col 0-2, dff/spc/pow 3-5,
#                   rfl/trn/rfr/ext 6-9, tex scl 10-11, tex off 12-13
LF = 10           # per-light floats

# texel u8 -> f32 decode LUT; MUST be built with the same numpy f32
# division as scene.compile._texture_array so kernel texels match the
# jnp path's tex_data bit-exactly (TPU f32 division rounds differently)
_TEX_LUT = (np.arange(256, dtype=np.float32) / 255.0).reshape(2, 128)

# sp_i columns
(SI_KIND, SI_MO, SI_MI, SI_BLK, SI_SING, SI_NCL, SI_OID,
 SI_BND) = range(8)


class PackedScene(NamedTuple):
    sp_f: jnp.ndarray    # (NS, PF) f32, permuted by struct.perm
    sp_i: jnp.ndarray    # (NS, 8) i32: kind, mo, mi, blk, sing, ncl,
    #                      origid, bounded
    cl_f: jnp.ndarray    # (NS, NC*CF) f32 pre-gathered clip tables
    mat_f: jnp.ndarray   # (NM, MF) f32
    lg_f: jnp.ndarray    # (NL, LF) f32
    misc: jnp.ndarray    # (8,) f32: amb_rgb, use_gamma, use_fresnel, pad
    tex_pk: jnp.ndarray  # (G, 128) i32 texture atlas, u8 rgb packed
    tex_lut: jnp.ndarray  # (2, 128) f32 u8 -> f32 texel decode LUT
    bsph_t: jnp.ndarray  # (4, 1, NSR*128) f32 transposed bounding-
    #                      sphere table (cx/cy/cz/rs, lane-major surface
    #                      order, rs = +inf for unbounded rows): feeds
    #                      the kernel's VECTORIZED per-call reach mask
    #                      (a (rows x surfaces) VPU pass instead of
    #                      per-surface scalar cone math)
    shad_msk: jnp.ndarray  # (NS, max(1, NL*NW)) i32 per-(receiver
    #                      surface, light) shadow blocker bitmasks (the
    #                      lsort analog, engine.cpp:2456-2757): bit b of
    #                      word l*NW+w = permuted surface 32w+b can
    #                      occlude light l for hit points on this row's
    #                      surface (sphere-vs-capsule hull, conservative)
    cont_msk: jnp.ndarray  # (NS, 2*NW) i32 per-(surface, hit side)
    #                      secondary-ray candidate bitmasks (the lst_p
    #                      rfl/rfr list analog, tracer.h:955-968): bit b
    #                      of word side*NW+w = a continuation ray leaving
    #                      this row's surface on that side may hit
    #                      permuted surface 32w+b. PLANE originators
    #                      prune by halfspace (reflections stay on the
    #                      hit side, transmissions cross); quadrics and
    #                      non-continuing materials conservatively keep
    #                      everything / nothing


class Group(NamedTuple):
    """One contiguous class of surfaces in the permuted tables."""
    is_plane: bool
    has_sing: bool
    has_clips: bool
    start: int
    count: int       # all surfaces of the class
    n_block: int     # leading shadow blockers of the class


class KernelStruct(NamedTuple):
    """Static (hashable) scene structure the kernel specializes on."""
    ns: int                 # padded table height
    nc: int                 # clip program width
    nm: int                 # real material count
    nl: int                 # real light count
    groups: tuple           # tuple[Group]
    perm: tuple             # permuted-row -> original surface id
    ncl: tuple              # per PERMUTED row: clip entries
    blk: tuple              # per PERMUTED row: blocker side bits
    props: tuple            # per material: property bits
    gamma_on: bool
    fres_on: bool
    any_cont: bool          # any material reflects or transmits
    can_push: bool          # any material can spawn BOTH branches (needs
    # the branch stack); False drops all push/pop machinery
    tex: tuple              # per textured material: (mat_idx, base,
    # xmask, ymask, xshift) — static pow-2 addressing (tracer.cpp:2297)
    tex_rows: int           # texture table height G (128 texels per row)
    bnd: tuple              # per PERMUTED row: 1 = finite world bounding
    # sphere exists (culling layer; AR_ptr skip analog)
    emis_rows: tuple        # (permuted_row, origid) of surfaces with a
    # LIGHT-tagged side (PT emission lookup, s_emis)


def _mat_blocks(props: np.ndarray) -> np.ndarray:
    """CHECK_SHAD blocker rule per material (tracer.cpp:549-589):
    emissive and unbent fully-transparent surfaces don't occlude."""
    return (((props & PROP_LIGHT) == 0)
            & ~(((props & PROP_TRANSP) != 0)
                & ((props & PROP_REFRACT) == 0)))


def scene_struct(sc: SceneArrays) -> KernelStruct:
    """Extract the static structure (host-side numpy)."""
    from quadray_tpu.scene.compile import host_view
    sc = host_view(sc)
    kind = np.asarray(sc.s_kind)
    sing = np.asarray(sc.s_sing)
    cop = np.asarray(sc.c_op)
    props = np.asarray(sc.m_props)
    smat = np.asarray(sc.s_mat)
    NS, NC = cop.shape

    nz = cop != CLIP_NONE
    ncl = np.where(nz.any(1), NC - np.argmax(nz[:, ::-1], axis=1), 0)
    mb = _mat_blocks(props)
    blk = mb[smat[:, 0]].astype(np.int32) + 2 * mb[smat[:, 1]].astype(
        np.int32)

    perm: list = []
    groups: list = []
    for is_plane in (True, False):
        for has_sing in ((False,) if is_plane else (False, True)):
            for has_clips in (False, True):
                sel = ((kind > 0)
                       & ((kind == 1) == is_plane)
                       & ((sing > 0) == has_sing)
                       & ((ncl > 0) == has_clips))
                ids = np.nonzero(sel)[0]
                if ids.size == 0:
                    continue
                blockers = ids[blk[ids] != 0]
                rest = ids[blk[ids] == 0]
                groups.append(Group(is_plane, has_sing, has_clips,
                                    len(perm), int(ids.size),
                                    int(blockers.size)))
                perm.extend(int(i) for i in blockers)
                perm.extend(int(i) for i in rest)
    # pad rows keep table height NS
    padding = [i for i in range(NS) if kind[i] == 0]
    perm.extend(padding)
    perm_a = np.array(perm, np.int32)

    l_on = np.asarray(sc.l_on)
    nl = int(l_on.sum())
    # the kernel unrolls lights over the first nl table rows; compile_scene
    # guarantees active lights form a contiguous prefix — fail loudly if a
    # different SceneArrays producer ever violates that
    assert np.all(l_on[:nl] == 1) and np.all(l_on[nl:] == 0), \
        "active lights must form a contiguous prefix of the light tables"
    any_cont = bool(np.any(((props & PROP_REFLECT) != 0)
                           | ((props & PROP_OPAQUE) == 0)))
    fres_on = bool(np.asarray(sc.use_fresnel) > 0)
    # both branches (reflect AND transmit) can fire only for materials with
    # trn>0 and a reflective term (rfl>0, or Fresnel moving trn*F into rfl)
    can_push = bool(np.any(
        ((props & PROP_OPAQUE) == 0)
        & (((props & PROP_REFLECT) != 0)
           | (fres_on & ((props & PROP_FRESNEL) != 0)))))
    t_base = np.asarray(sc.m_tex_base)
    t_xm = np.asarray(sc.m_tex_xmask)
    t_ym = np.asarray(sc.m_tex_ymask)
    t_xs = np.asarray(sc.m_tex_xshift)
    tex = tuple(
        (int(m), int(t_base[m]), int(t_xm[m]), int(t_ym[m]), int(t_xs[m]))
        for m in range(props.shape[0])
        if (props[m] & PROP_TEXTURE) and t_base[m] >= 0)
    t_len = int(sc.tex_data.shape[0])
    g = -(-t_len // LANES)
    tex_rows = max(8, (g + 7) & ~7)  # pad to 8-sublane tiles
    return KernelStruct(
        ns=NS, nc=NC, nm=int(props.shape[0]), nl=nl,
        groups=tuple(groups), perm=tuple(int(i) for i in perm_a),
        ncl=tuple(int(v) for v in ncl[perm_a]),
        blk=tuple(int(v) for v in blk[perm_a]),
        props=tuple(int(p) for p in props),
        gamma_on=bool(np.asarray(sc.use_gamma) > 0),
        fres_on=fres_on,
        any_cont=any_cont,
        can_push=can_push,
        tex=tex,
        tex_rows=tex_rows,
        bnd=tuple(int(v) for v in np.asarray(sc.s_bnd)[perm_a]),
        emis_rows=tuple(
            (int(r), int(perm_a[r])) for r in range(NS)
            if kind[perm_a[r]] > 0
            and ((props[smat[perm_a[r], 0]] | props[smat[perm_a[r], 1]])
                 & PROP_LIGHT)))


class _SceneCache:
    """Bounded identity-keyed cache over whole SceneArrays pytrees.

    Keyed on the identity of EVERY leaf, so a SceneArrays derived via
    _replace (even of a single field) misses and recomputes instead of
    silently reusing stale data; bounded LRU so long animations don't
    retain every frame's device buffers."""

    def __init__(self, fn, maxlen: int = 8):
        from collections import OrderedDict
        self._fn = fn
        self._maxlen = maxlen
        self._entries = OrderedDict()

    def __call__(self, sc: SceneArrays, *args):
        leaves = jax.tree_util.tree_leaves(sc)
        key = tuple(id(leaf) for leaf in leaves) + tuple(
            id(a) for a in args)
        ent = self._entries.get(key)
        if ent is not None and all(a is b for a, b in zip(ent[0], leaves)):
            self._entries.move_to_end(key)
            return ent[1]
        val = self._fn(sc, *args)
        self._entries[key] = (leaves, val)
        while len(self._entries) > self._maxlen:
            self._entries.popitem(last=False)
        return val


_get_struct = _SceneCache(scene_struct)


def pack_scene(sc: SceneArrays, struct: KernelStruct) -> PackedScene:
    NS = sc.s_pos.shape[0]
    NC = sc.c_op.shape[1]
    perm = jnp.asarray(np.array(struct.perm, np.int32))
    sp_f = jnp.concatenate([
        sc.s_pos, sc.s_inv.reshape(NS, 9), sc.s_sci, sc.s_scjh,
        sc.s_sciw[:, None],
        jnp.clip(sc.s_cmin, -BIG, BIG), jnp.clip(sc.s_cmax, -BIG, BIG),
        sc.s_fwd.reshape(NS, 9), sc.s_bsph,
        sc.s_emis.reshape(NS, 6),
    ], axis=1).astype(F32)[perm]
    # static columns (blocker bits, clip counts, original ids) come from
    # the struct — they are already in permuted order
    sp_i = jnp.concatenate([
        sc.s_kind[perm][:, None], sc.s_mat[perm],
        jnp.asarray(np.array(struct.blk, np.int32))[:, None],
        sc.s_sing[perm][:, None],
        jnp.asarray(np.array(struct.ncl, np.int32))[:, None],
        perm[:, None], sc.s_bnd[perm][:, None]], axis=1).astype(I32)
    ref = jnp.maximum(sc.c_ref, 0)
    cl_f = jnp.concatenate([
        sc.s_pos[ref], sc.s_inv[ref].reshape(NS, NC, 9), sc.s_sci[ref],
        sc.s_scjh[ref], sc.s_sciw[ref][..., None],
        sc.s_kind[ref][..., None].astype(F32),
        sc.c_side[..., None],
        sc.c_op[..., None].astype(F32),
    ], axis=2).astype(F32)[perm].reshape(NS, NC * CF)
    mat_f = jnp.stack([
        sc.m_col[:, 0], sc.m_col[:, 1], sc.m_col[:, 2], sc.m_dff, sc.m_spc,
        sc.m_pow, sc.m_rfl, sc.m_trn, sc.m_rfr, sc.m_ext,
        sc.m_tex_scl[:, 0], sc.m_tex_scl[:, 1],
        sc.m_tex_off[:, 0], sc.m_tex_off[:, 1]], axis=1)
    lg_f = jnp.concatenate([
        sc.l_pos, sc.l_col, sc.l_cnt[:, None], sc.l_lnr[:, None],
        sc.l_qdr[:, None], sc.l_on[:, None]], axis=1).astype(F32)
    misc = jnp.concatenate([
        sc.amb_col, sc.use_gamma[None], sc.use_fresnel[None],
        jnp.zeros((3,), F32)])
    # texture atlas packed for in-kernel gather: u8 rgb in one i32 per
    # texel, 128 texels per row (tex_data is u8/255 so this is lossless;
    # the kernel decodes through the same-division LUT)
    G = struct.tex_rows
    k8 = jnp.round(sc.tex_data * 255.0).astype(I32)
    pk = (k8[:, 0] << 16) | (k8[:, 1] << 8) | k8[:, 2]
    pad = G * LANES - pk.shape[0]
    tex_pk = jnp.concatenate([pk, jnp.zeros((pad,), I32)]).reshape(G, LANES)
    # transposed sphere table for the vectorized reach mask: component
    # rows per 128-surface word; rs pre-sqrt'd; unbounded rows get
    # rs = +inf so every comparison degrades to "reach"
    NSR = -(-NS // LANES)
    npad = NSR * LANES - NS
    bperm = sc.s_bsph[perm]
    bnd_p = sc.s_bnd[perm]
    rs = jnp.where(bnd_p > 0, jnp.sqrt(bperm[:, 3]), jnp.inf)
    comp = jnp.stack([bperm[:, 0], bperm[:, 1], bperm[:, 2], rs])  # (4,NS)
    if npad:
        comp = jnp.concatenate(
            [comp, jnp.zeros((4, npad), F32)], axis=1)
    bsph_t = comp.reshape(4, 1, NSR * LANES)
    # lsort analog (engine.cpp:2456-2757): blocker b can occlude light l
    # for hit points on receiver r only if b's sphere meets the capsule
    # hull of (l.pos -> r's sphere center, radius = r's radius) — the
    # hull of a point and a sphere is contained in that capsule. Rows
    # with unbounded receivers/blockers conservatively keep every bit.
    NW = -(-NS // 32)
    NL = struct.nl
    if NL > 0:
        cb = bperm[:, :3]                                # (NS, 3)
        rb = jnp.where(bnd_p > 0, jnp.sqrt(bperm[:, 3]), jnp.inf)
        words = []
        nb32 = NW * 32
        pad32 = nb32 - NS
        bitpos = jnp.arange(nb32, dtype=I32) % 32
        for l in range(NL):
            p = sc.l_pos[l]                              # (3,)
            u = bperm[:, :3] - p[None, :]                # (NS, 3) recv
            uu = jnp.maximum(jnp.sum(u * u, axis=1), 1e-30)
            lc = cb[None, :, :] - p[None, None, :]       # (1, NS, 3)
            tp = jnp.clip(jnp.sum(lc * u[:, None, :], axis=2)
                          / uu[:, None], 0.0, 1.0)       # (NSr, NSb)
            q = lc - tp[..., None] * u[:, None, :]
            dist2 = jnp.sum(q * q, axis=2)
            re = rs[:, None] + rb[None, :] + 1e-3        # recv + blk
            occ = ~(dist2 > re * re)                     # inf-safe
            occ = occ | (bnd_p[None, :] == 0)            # unbounded blk
            occ = occ.astype(I32)
            if pad32:
                occ = jnp.concatenate(
                    [occ, jnp.zeros((NS, pad32), I32)], axis=1)
            w = (occ << bitpos[None, :]).reshape(NS, NW, 32).sum(2)
            words.append(w)
        shad_msk = jnp.concatenate(words, axis=1).astype(I32)
    else:
        shad_msk = jnp.zeros((NS, 1), I32)
    # lst_p analog (tracer.h:955-968, traversed at the rfl/rfr ENTERs,
    # tracer.cpp:3486-3554): static per-(surface, hit side) candidate
    # masks for continuation rays. A ray REFLECTED off a plane stays in
    # the closed halfspace of its hit side; a TRANSMITTED ray crosses
    # it — so plane originators keep only surfaces whose sphere meets
    # the halfspace(s) their materials can actually send rays into.
    # Curved originators and unbounded targets conservatively keep
    # everything; materials that cannot continue contribute nothing.
    nb32c = (-(-NS // 32)) * 32
    bitc = jnp.arange(nb32c, dtype=I32) % 32
    kind_p = sc.s_kind[perm]
    nrm = sc.s_inv[perm][:, 2, :]
    nrm = nrm * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(nrm * nrm, axis=1, keepdims=True), 1e-30))
    cb_all = bperm[:, :3]
    rb_all = jnp.where(bnd_p > 0, jnp.sqrt(bperm[:, 3]), jnp.inf)
    dvec = cb_all[None, :, :] - sc.s_pos[perm][:, None, :]
    signed = jnp.sum(dvec * nrm[:, None, :], axis=2)  # (NSr, NSb)
    distb = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, axis=2), 0.0))
    slack = rb_all[None, :] + 1e-3 + 1e-3 * distb
    Hp = ~(signed < -slack)       # NaN-safe: degrade to reach
    Hm = ~(signed > slack)
    fres_s = sc.use_fresnel > 0
    sides_masks = []
    for si in range(2):
        pm = sc.m_props[sc.s_mat[perm][:, si]]
        can_rfl = ((pm & PROP_REFLECT) != 0) | (
            fres_s & ((pm & PROP_OPAQUE) == 0))
        can_trn = (pm & PROP_OPAQUE) == 0
        same, opp = (Hp, Hm) if si == 0 else (Hm, Hp)
        mk = (can_rfl[:, None] & same) | (can_trn[:, None] & opp)
        anyc = can_rfl | can_trn
        mk = jnp.where((kind_p == 1)[:, None], mk, anyc[:, None])
        mk = mk | (bnd_p[None, :] == 0)
        mk = (mk & anyc[:, None]).astype(I32)
        padc = nb32c - NS
        if padc:
            mk = jnp.concatenate(
                [mk, jnp.zeros((NS, padc), I32)], axis=1)
        sides_masks.append(
            (mk << bitc[None, :]).reshape(NS, nb32c // 32, 32).sum(2))
    cont_msk = jnp.concatenate(sides_masks, axis=1).astype(I32)
    return PackedScene(sp_f, sp_i, cl_f, mat_f, lg_f, misc,
                       tex_pk, jnp.asarray(_TEX_LUT), bsph_t, shad_msk,
                       cont_msk)


def kernel_supported(sc: SceneArrays) -> bool:
    """All scene features are kernel-supported since textures landed
    (pow-2 mask/shift UV addressing + in-kernel atlas gather)."""
    del sc
    return True


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


def _n_chunks(struct: KernelStruct, cfg: TraceConfig) -> int:
    """Number of two-tier guard chunks per block (1 = single-tier).
    Mirrors the kernel's per_row gate: fine-grained guards only pay on
    many-surface scenes, and chunk must evenly split the block."""
    nreal = sum(g.count for g in struct.groups)
    if (cfg.cull and cfg.chunk > 0 and nreal > cfg.unroll
            and cfg.sub % cfg.chunk == 0 and cfg.sub // cfg.chunk > 1):
        return cfg.sub // cfg.chunk
    return 1


def _make_kernel(struct: KernelStruct, cfg: TraceConfig,
                 emit_state: bool = False, resume: bool = False,
                 emit_paths: int = 0, pt: bool = False,
                 use_cand: int = 0):
    """emit_state: besides colors, write the 18-tile resumable ray state
    (two-round compacted tracing); resume: initialize the ray state from
    extra input tiles instead of fresh primary rays. Both require
    can_push=False (the branch stack cannot spill).

    emit_paths=K: besides colors, write K per-segment path-record tiles
    (i32): bits 0-11 hit surface ORIGINAL id, 12 side(+1), 13-14 the
    continuation kind (0 stop / 1 reflect / 2 transmit), 15 hit flag,
    16+l per-light occlusion. Consumed by ops/replay.py for trace-replay
    differentiation (the discrete path is detached; the arithmetic is
    replayed differentiably). Requires can_push=False (the record is one
    linear chain per lane).

    pt: the progressive path tracer INSIDE the megakernel (the reference
    runs PT inside render0, tracer.cpp:2374-2703): per-lane 32-bit LCG
    (matched constants, tracer.h:48-53), emission gathered at every hit,
    single sampled continuation (reflect/transmit by Fresnel weight,
    else cosine-hemisphere diffuse) with the diffuse-property gate and
    below-split-depth Russian roulette — the ops/pt.py estimator
    semantics, lane-for-lane. Extra seed input/output tile; works for
    every scene (a sampled path never needs the branch stack)."""
    assert not ((emit_state or resume) and struct.can_push)
    assert not (emit_paths and struct.can_push)
    assert not (pt and (emit_state or resume or emit_paths))
    # path records pack per-light occlusion into bits 16+l; more lights
    # would shift past bit 31 and corrupt the surface-id/side/kind bits
    # ops/replay.py consumes
    assert not (emit_paths and struct.nl > 16), (
        f"emit_paths supports at most 16 lights, scene has {struct.nl}")
    # VMEM budget guard (the while-loop carry is the dominant resident):
    # ~23 ray-state tiles + 15*stack branch-stack tiles when can_push,
    # plus 14 scratch tiles, at SUB x 128 x 4 B each. Fails loudly with
    # the knob to turn instead of a late Mosaic allocation error.
    tiles = 23 + 14 + (15 * cfg.stack if struct.can_push else 0)
    if pt:
        # PT split-tree state: 26 ray tiles + 16-tile sibling slots
        tiles = 26 + 14 + 16 * PT_SD
    vmem_mb = tiles * cfg.sub * LANES * 4 / 2**20
    assert vmem_mb < 96, (
        f"kernel carry needs ~{vmem_mb:.0f} MiB VMEM "
        f"(stack={cfg.stack}, can_push={struct.can_push}); lower "
        "TraceConfig.stack or TraceConfig.sub")
    D = cfg.stack
    NC = struct.nc
    NM = struct.nm
    NL = struct.nl
    props_t = struct.props
    cull_on = cfg.cull and any(struct.bnd)
    NSP = struct.ns
    NSR = -(-NSP // LANES)   # 128-surface words in the reach vector
    NW = -(-NSP // 32)       # 32-bit umask words
    NG = len(struct.groups)
    # static shadow-blocker masks only pay off when shadows run (PT has
    # no shadow pass) and the blocker set is large enough to prune
    nreal_ls = sum(g.count for g in struct.groups)
    lsort_on = (cull_on and cfg.lsort and struct.nl > 0 and not pt
                and nreal_ls > cfg.unroll)
    # static secondary-ray candidate masks (lst_p analog): continuation
    # rays always originate from the immediately-preceding segment's
    # commits, which only holds for the single-branch chain (branch
    # stacks and PT sibling stacks pop rays from OLDER segments)
    cont_on = (cull_on and cfg.lsort and not pt
               and not struct.can_push and nreal_ls > cfg.unroll)
    # two-tier chunk guards (see TraceConfig.chunk): NCH sub-blocks of
    # CH sublane rows each get their own reach bitmask. Resume kernels
    # can run on re-tiled blocks whose height differs from cfg.sub, so
    # they stay single-tier
    NCH = 1 if resume else _n_chunks(struct, cfg)
    CH = cfg.sub // NCH
    assert not (use_cand and resume)

    def mats_with(bit):
        return [m for m in range(NM) if props_t[m] & bit]

    def flag_vec(bit, bmat):
        """Per-lane bool: material property, from the static subset."""
        ms = mats_with(bit)
        if not ms:
            return None
        v = bmat == ms[0]
        for m in ms[1:]:
            v = v | (bmat == m)
        return v

    def mats_with_all(*bits):
        return [m for m in range(NM)
                if all(props_t[m] & b for b in bits)]

    def flag_vec_of(ms, bmat):
        if not ms:
            return None
        v = bmat == ms[0]
        for m in ms[1:]:
            v = v | (bmat == m)
        return v

    any_refract = bool(mats_with(PROP_REFRACT))
    any_fresnel = struct.fres_on and bool(mats_with(PROP_FRESNEL))
    rf_fres_mats = (mats_with_all(PROP_OPAQUE, PROP_REFLECT, PROP_FRESNEL)
                    if struct.fres_on else [])
    any_rf_fresnel = bool(rf_fres_mats)
    any_metal = bool(mats_with(PROP_METAL))
    any_emissive = bool(mats_with(PROP_LIGHT))
    any_gamma = struct.gamma_on and bool(mats_with(PROP_GAMMA))
    any_cont = struct.any_cont
    any_tex = bool(struct.tex)

    def kernel(sp_f, sp_i, cl_f, mat_f, lg_f, misc, *more):
        if lsort_on:
            # scalar-prefetch: per-(receiver surface, light) shadow
            # blocker bitmasks (PackedScene.shad_msk)
            shad_ref = more[0]
            more = more[1:]
        if cont_on:
            # scalar-prefetch: per-(surface, side) continuation masks
            # (PackedScene.cont_msk)
            cont_ref = more[0]
            more = more[1:]
        if use_cand:
            # 7th scalar-prefetch operand: per-block candidate table
            # (use_cand rows of [NG+1 group boundaries | compacted
            # permuted surface indices]); rows repeat with period
            # use_cand so multi-frame dispatches share one frame's table
            cand_ref = more[0]
            more = more[1:]
        if resume:
            # next scalar-prefetch operand: the active-block list (used
            # only by the index_maps; ignored here)
            more = more[1:]
        # nearest-hit/occlusion state lives in scratch VMEM refs mutated
        # in place (the STORE_SIMD masked-store design, tracer.cpp:641-
        # 643) instead of fori_loop value carries: a culled surface then
        # skips ALL work — carried values would be copied through both
        # lax.cond branches (13 tiles/surface), erasing the cull win
        if emit_paths:
            rec_s = more[-1]
            more = more[:-1]
        if cont_on:
            # double-buffered NW-word SMEM union of the committed
            # surfaces' continuation masks: rfn_s accumulates during a
            # segment's nearest pass, rfc_s is consumed by the NEXT
            # segment's nearest reach mask
            rfn_s = more[-1]
            rfc_s = more[-2]
            more = more[:-2]
        if lsort_on:
            # NL*NW-word SMEM scratch: union over the block's committed
            # receiver surfaces of their per-light blocker masks
            shu_s = more[-1]
            more = more[:-1]
        if cull_on:
            # NW-word SMEM bitmask: the per-call vectorized reach mask,
            # consumed by per-surface scalar bit tests
            umask_s = more[-1]
            more = more[:-1]
        (t_s, srf_s, side_s, hwx_s, hwy_s, hwz_s, hnx_s, hny_s, hnz_s,
         mat_s, hlx_s, hly_s, hlz_s, occ_s) = more[-14:]
        more = more[:-14]
        if pt:
            (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r, sd0_r,
             tex_r, lut_r) = more[:10]
            rest_refs = more[10:]
        else:
            (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r,
             tex_r, lut_r) = more[:9]
            rest_refs = more[9:]
        if cull_on:
            bsph_r = rest_refs[0]
            rest_refs = rest_refs[1:]
        if cont_on:
            # the first nearest pass has no originator info: it swaps
            # in this all-ones buffer and accumulates the real union
            for w_ in range(NCH * NW):
                rfn_s[w_] = -1

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

        def clip_program(s, ncl_s, v, wx, wy, wz):
            """Custom clip program (CC_cyc, tracer.cpp:1939-2160) with the
            per-surface dynamic trip count."""
            def per_clip(j, cm):
                # i1 vectors can't be scf carries; use i32
                mask = cm[0] != 0
                saved = cm[1] != 0
                C = clipentry(s, j)
                cx, cy, cz = to_local(C, wx, wy, wz)
                val = implicit(C, C["kind"] == 1.0, cx, cy, cz)
                pos = C["side"] >= 0.0
                keep = ((pos & (val <= 0.0)) | (~pos & (val >= 0.0)))
                is_s = C["op"] == float(CLIP_SURF)
                is_e = C["op"] == float(CLIP_ENTER)
                is_l = C["op"] == float(CLIP_LEAVE)
                is_n = ~(is_s | is_e | is_l)
                # bool selects as logical ops (no i1 select_n in Mosaic)
                saved = (is_e & mask) | (~is_e & saved)
                mask = ((is_s & mask & keep) | is_e
                        | (is_l & saved & ~mask) | (is_n & mask))
                return mask.astype(I32), saved.astype(I32)

            vm, _ = jax.lax.fori_loop(
                0, ncl_s, per_clip,
                (v.astype(I32), jnp.ones(v.shape, I32)))
            return vm != 0

        # ---- per-class surface bodies --------------------------------
        def make_body(grp: Group, shadow, rays, part=None):
            """part=None: full-block body. part=ci: the body operates on
            chunk ci's (CH, 128) row slice only — same math, same
            commit semantics, an exact row-subset of the full body."""
            sl = slice(None) if part is None else \
                slice(part * CH, (part + 1) * CH)
            if part is not None:
                rays = tuple(a[sl] for a in rays)
            (ox, oy, oz, dx, dy, dz, tmn, tmx, osrf, oside, thru,
             olx, oly, olz, wmask) = rays

            def body(s):
                g = lambda k: sp_f[s, k]
                P = dict(px=g(0), py=g(1), pz=g(2),
                         i00=g(3), i01=g(4), i02=g(5), i10=g(6), i11=g(7),
                         i12=g(8), i20=g(9), i21=g(10), i22=g(11))
                lx, ly, lz = to_local(P, ox, oy, oz)
                ex, ey, ez = lin(P, dx, dy, dz)
                origid = sp_i[s, SI_OID]
                # secondary-ray local-diff reuse (tracer.cpp:1350-1373):
                # the re-test of the originating surface uses the exact
                # stored local hit as its local origin
                same = osrf == origid
                lx = jnp.where(same, olx, lx)
                ly = jnp.where(same, oly, ly)
                lz = jnp.where(same, olz, lz)

                def commit(v, t, side, wx, wy, wz, nx, ny, nz,
                           hx, hy, hz):
                    """Masked in-place best-hit update (STORE_SIMD under
                    TMASK, tracer.cpp:641-643); tie-break on the
                    ORIGINAL surface id so the class permutation is
                    invisible (matches the jnp path's argmin order)."""
                    t = jnp.where(v, t, BIG)
                    bt = t_s[sl]
                    bsrf = srf_s[sl]
                    # (t < BIG) keeps misses (t == bt == BIG) from
                    # overwriting the stored best hit
                    better = (t < BIG) & (
                        (t < bt) | ((t == bt) & (origid < bsrf)))

                    # the 13-tile masked store only runs when some lane
                    # actually improves — surfaces that pass the reach
                    # guard but lose everywhere skip ~2/3 of their cost
                    # chunks whose union the commit folds into: the
                    # chunk being processed, or every chunk for the
                    # full-block body
                    cis = range(NCH) if part is None else (part,)

                    @pl.when(jnp.any(better))
                    def _():
                        if lsort_on:
                            # fold this receiver's per-light blocker
                            # masks into the chunk unions (consumed by
                            # the shadow passes of this segment)
                            for l_ in range(NL):
                                for ci_ in cis:
                                    for w_ in range(NW):
                                        i_ = (l_ * NCH + ci_) * NW + w_
                                        shu_s[i_] = (shu_s[i_]
                                                     | shad_ref[
                                                         s, l_ * NW + w_])
                        if cont_on and not shadow:
                            # fold this surface's per-side continuation
                            # masks into the NEXT segment's union
                            any_o = jnp.any(better & (side > 0))
                            any_i = jnp.any(better & (side < 0))

                            @pl.when(any_o)
                            def _():
                                for ci_ in cis:
                                    for w_ in range(NW):
                                        i_ = ci_ * NW + w_
                                        rfn_s[i_] = (rfn_s[i_]
                                                     | cont_ref[s, w_])

                            @pl.when(any_i)
                            def _():
                                for ci_ in cis:
                                    for w_ in range(NW):
                                        i_ = ci_ * NW + w_
                                        rfn_s[i_] = (rfn_s[i_]
                                                     | cont_ref[s,
                                                                NW + w_])
                        midx = jnp.where(side > 0, sp_i[s, SI_MO],
                                         sp_i[s, SI_MI])
                        sel = lambda a_, r_: jnp.where(better, a_, r_[sl])
                        t_s[sl] = jnp.where(better, t, bt)
                        srf_s[sl] = jnp.where(better, origid, bsrf)
                        side_s[sl] = sel(side, side_s)
                        hwx_s[sl] = sel(wx, hwx_s)
                        hwy_s[sl] = sel(wy, hwy_s)
                        hwz_s[sl] = sel(wz, hwz_s)
                        hnx_s[sl] = sel(nx, hnx_s)
                        hny_s[sl] = sel(ny, hny_s)
                        hnz_s[sl] = sel(nz, hnz_s)
                        mat_s[sl] = sel(midx, mat_s)
                        # local hit rides along: texture UV + the
                        # origin_loc of any continuation ray
                        # (local-diff reuse)
                        hlx_s[sl] = sel(hx, hlx_s)
                        hly_s[sl] = sel(hy, hly_s)
                        hlz_s[sl] = sel(hz, hlz_s)

                if grp.is_plane:
                    # plane root + ray-sign side (tracer.cpp:4062-4210)
                    t = _sdiv(-lz, ez)
                    side = jnp.where(ez < 0.0, 1, -1).astype(I32)
                    # division-free t-window (see trace.py win_pl)
                    pos_d = ez > 0.0
                    tmin_d = tmn * ez
                    tmax_d = tmx * ez
                    win = (ez != 0.0) \
                        & ((pos_d & (-lz > tmin_d))
                           | (~pos_d & (-lz < tmin_d))) \
                        & ((pos_d & (-lz < tmax_d))
                           | (~pos_d & (-lz > tmax_d)))
                    hx = lx + t * ex
                    hy = ly + t * ey
                    hz = lz + t * ez
                    wx = ox + t * dx
                    wy = oy + t * dy
                    wz = oz + t * dz
                    v = wmask & win
                    v &= (hx >= g(19)) & (hx <= g(22))
                    v &= (hy >= g(20)) & (hy <= g(23))
                    v &= (hz >= g(21)) & (hz <= g(24))
                    if grp.has_clips:
                        v = clip_program(s, sp_i[s, SI_NCL], v, wx, wy, wz)
                    # CHECK_SIDE exact self-intersection skip
                    v &= ~same | (thru ^ (side == oside))

                    if shadow:
                        blk = sp_i[s, SI_BLK]
                        souter = side > 0
                        blocks = ((souter & ((blk & 1) != 0))
                                  | (~souter & ((blk & 2) != 0)))
                        occ_s[sl] = occ_s[sl] | (v & blocks).astype(I32)
                        return
                    # plane world normal = third row of inv, side-flipped
                    sf = side.astype(F32)
                    commit(v, t, side, wx, wy, wz,
                           P["i20"] * sf, P["i21"] * sf, P["i22"] * sf,
                           hx, hy, hz)
                    return

                # ---- quadric / two-plane class -----------------------
                Q = dict(sx=g(12), sy=g(13), sz=g(14),
                         jx=g(15), jy=g(16), jz=g(17), sw=g(18))
                kind = sp_i[s, SI_KIND]
                is_tp = kind == 3
                a = (Q["sx"] * ex * ex + Q["sy"] * ey * ey
                     + Q["sz"] * ez * ez)
                b = ((Q["sx"] * lx - Q["jx"]) * ex
                     + (Q["sy"] * ly - Q["jy"]) * ey
                     + (Q["sz"] * lz - Q["jz"]) * ez)
                c = (Q["sx"] * lx * lx + Q["sy"] * ly * ly
                     + Q["sz"] * lz * lz
                     - 2.0 * (Q["jx"] * lx + Q["jy"] * ly + Q["jz"] * lz)
                     - Q["sw"])
                # two-plane exact factored determinant (tracer.cpp:4239-46)
                cross = lx * ez - lz * ex
                disc_tp = jnp.abs(Q["sx"] * Q["sz"]) * cross * cross
                disc = jnp.where(is_tp, disc_tp, b * b - a * c)
                quad_ok = disc >= 0.0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                # stable b-mixed roots (tracer.cpp:4518-4547): slot a =
                # entering/outer, slot b = leaving/inner, structurally
                sgn_b = jnp.where(b >= 0.0, 1.0, -1.0)
                qq = -(b + sgn_b * sq)
                b_pos = b > 0.0
                t1, ok1 = _root(jnp.where(b_pos, qq, c),
                                jnp.where(b_pos, a, qq))
                t2, ok2 = _root(jnp.where(b_pos, c, qq),
                                jnp.where(b_pos, qq, a))
                # near-zero-determinant root sorting (tracer.cpp:4572-4623)
                dmask = quad_ok & (disc < D_EPS)
                sgn_a = jnp.where(a >= 0.0, 1.0, -1.0)
                u = (t1 - t2) * sgn_a
                fm = u >= 0.0
                tdff = jnp.where(fm, -0.5 * u - jnp.abs(T_EPS * t1),
                                 0.0) * sgn_a
                tdff = jnp.where(dmask & ok1 & ok2, tdff, 0.0)
                t1 = t1 + tdff
                t2 = t2 - tdff

                root_a = jnp.where(quad_ok & ok1, t1, BIG)
                root_b = jnp.where(quad_ok & ok2, t2, BIG)

                if grp.has_sing:
                    # conic-singularity scalars (CC_glb,
                    # tracer.cpp:1706-1860)
                    sing = sp_i[s, SI_SING]
                    cyl = sing == 2
                    ratio_n = Q["sx"] + jnp.where(cyl, 0.0, Q["sy"])
                    bad_rz = jnp.abs(Q["sz"]) < 1e-30
                    ratio = jnp.abs(jnp.where(
                        bad_rz, 0.0,
                        ratio_n / jnp.where(bad_rz, 1.0, Q["sz"])))
                    acc_c = jnp.where(cyl, 1.0, 2.0)
                    inv_r = T_EPS * jax.lax.rsqrt(
                        jnp.maximum(ratio + acc_c, 1e-30))
                    sqrt_ratio = jnp.sqrt(ratio)
                sgn = lambda v_: jnp.where(v_ >= 0.0, 1.0, -1.0)

                def hitdata(t, inner):
                    """Hit point (with apex adjustment), world point,
                    gradient — per root slot. `inner` is a Python bool."""
                    hx = lx + t * ex
                    hy = ly + t * ey
                    hz = lz + t * ez
                    wx = ox + t * dx
                    wy = oy + t * dy
                    wz = oz + t * dz
                    if grp.has_sing:
                        r2loc = hx * hx + hy * hy + hz * hz
                        hm = dmask & (r2loc < T_EPS)
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
                        awx = (P["px"] + g(25) * adj_i + g(26) * adj_j
                               + g(27) * adj_k)
                        awy = (P["py"] + g(28) * adj_i + g(29) * adj_j
                               + g(30) * adj_k)
                        awz = (P["pz"] + g(31) * adj_i + g(32) * adj_j
                               + g(33) * adj_k)
                        wx = jnp.where(hm, awx, wx)
                        wy = jnp.where(hm, awy, wy)
                        wz = jnp.where(hm, awz, wz)
                    gx = Q["sx"] * hx - Q["jx"]
                    gy = Q["sy"] * hy - Q["jy"]
                    gz = Q["sz"] * hz - Q["jz"]
                    return hx, hy, hz, wx, wy, wz, gx, gy, gz

                def validity(t, side_val, hx, hy, hz, wx, wy, wz):
                    v = wmask & (t > tmn) & (t < tmx) & (t < BIG)
                    v &= (hx >= g(19)) & (hx <= g(22))
                    v &= (hy >= g(20)) & (hy <= g(23))
                    v &= (hz >= g(21)) & (hz <= g(24))
                    if grp.has_clips:
                        v = clip_program(s, sp_i[s, SI_NCL], v, wx, wy, wz)
                    v &= ~same | (thru ^ (side_val == oside))
                    return v

                ha = hitdata(root_a, inner=False)
                hb = hitdata(root_b, inner=True)
                side_a = jnp.full(ox.shape, 1, I32)
                side_b = jnp.full(ox.shape, -1, I32)
                va = validity(root_a, side_a, *ha[:6])
                vb = validity(root_b, side_b, *hb[:6])

                if shadow:
                    blk = sp_i[s, SI_BLK]
                    occ_s[sl] = (occ_s[sl]
                                 | (va & ((blk & 1) != 0)).astype(I32)
                                 | (vb & ((blk & 2) != 0)).astype(I32))
                    return

                # per-surface nearest valid root, then one masked update
                pick_b = vb & (~va | (root_b < root_a))
                sel_ab = lambda fa, fb: jnp.where(pick_b, fb, fa)
                t = sel_ab(jnp.where(va, root_a, BIG),
                           jnp.where(vb, root_b, BIG))
                side = sel_ab(side_a, side_b)
                gx = sel_ab(ha[6], hb[6])
                gy = sel_ab(ha[7], hb[7])
                gz = sel_ab(ha[8], hb[8])
                # world normal = inv^T grad, flipped to hit side
                nwx = (P["i00"] * gx + P["i10"] * gy + P["i20"] * gz)
                nwy = (P["i01"] * gx + P["i11"] * gy + P["i21"] * gz)
                nwz = (P["i02"] * gx + P["i12"] * gy + P["i22"] * gz)
                sf = side.astype(F32)
                commit(t < BIG, t, side,
                       sel_ab(ha[3], hb[3]), sel_ab(ha[4], hb[4]),
                       sel_ab(ha[5], hb[5]),
                       nwx * sf, nwy * sf, nwz * sf,
                       sel_ab(ha[0], hb[0]), sel_ab(ha[1], hb[1]),
                       sel_ab(ha[2], hb[2]))
                return

            return body

        # ---- intersect: nearest hit / shadow any-hit over all groups --
        def intersect(ox, oy, oz, dx, dy, dz, tmn, tmx,
                      osrf, oside, thru, olx, oly, olz, shadow, wmask,
                      primary=False, light=0):
            # primary+candidates: the peeled first segment loops over
            # the precomputed per-block candidate list (the tilebuffer
            # per-tile object list analog, engine.cpp:3129-3253) — no
            # runtime guard needed at all. Otherwise (secondary
            # segments, shadow rays) the reach of ALL surfaces is
            # evaluated in ONE vectorized pass against the transposed
            # sphere table and packed into an SMEM bitmask; per-surface
            # guards are then a scalar bit test.
            cand_mode = bool(use_cand) and primary and not shadow
            guard_on = cull_on and not cand_mode
            if cont_on and not shadow:
                # consume the previous segment's union; start the next
                for w_ in range(NCH * NW):
                    rfc_s[w_] = rfn_s[w_]
                    rfn_s[w_] = 0
            if guard_on:
                # PER-ROW ray-bundle bounds (the reference tests its
                # 4-16-ray packets against array bounding spheres —
                # AR_ptr, tracer.cpp:3953-4056; one origin-box +
                # direction-cone / endpoint-capsule per 128-lane row
                # restores that packet-granularity for divergent
                # secondary bundles): a surface is skipped only when NO
                # row's bundle can reach it. Inactive lanes are
                # excluded; fully-inactive rows contribute nothing;
                # every comparison is written so NaN/inf degrades to
                # "reach" (never to a wrong skip).
                NSL = NSR * LANES
                # small scenes don't amortize the (rows x surfaces)
                # matrix: collapse to one block-wide bundle
                per_row = sum(
                    g.count for g in struct.groups) > cfg.unroll
                if per_row:
                    row_act = jnp.any(wmask, axis=1, keepdims=True)

                    def mnr(a):
                        return jnp.min(jnp.where(wmask, a, BIG), axis=1,
                                       keepdims=True)

                    def mxr(a):
                        return jnp.max(jnp.where(wmask, a, -BIG),
                                       axis=1, keepdims=True)

                    def sumr(a):
                        return jnp.sum(jnp.where(wmask, a, 0.0), axis=1,
                                       keepdims=True)

                    def minr(a, fill):
                        return jnp.min(jnp.where(wmask, a, fill),
                                       axis=1, keepdims=True)
                else:
                    row_act = jnp.any(wmask).reshape(1, 1)

                    def mnr(a):
                        return jnp.min(
                            jnp.where(wmask, a, BIG)).reshape(1, 1)

                    def mxr(a):
                        return jnp.max(
                            jnp.where(wmask, a, -BIG)).reshape(1, 1)

                    def sumr(a):
                        return jnp.sum(
                            jnp.where(wmask, a, 0.0)).reshape(1, 1)

                    def minr(a, fill):
                        return jnp.min(
                            jnp.where(wmask, a, fill)).reshape(1, 1)

                oxm, oxM = mnr(ox), mxr(ox)
                oym, oyM = mnr(oy), mxr(oy)
                ozm, ozM = mnr(oz), mxr(oz)
                c0x = 0.5 * (oxm + oxM)                    # (S, 1)
                c0y = 0.5 * (oym + oyM)
                c0z = 0.5 * (ozm + ozM)
                r0 = 0.5 * jnp.sqrt((oxM - oxm) ** 2 + (oyM - oym) ** 2
                                    + (ozM - ozm) ** 2)
                r0 = r0 * 1.0005 + 1e-4
                scx = bsph_r[0]                            # (1, NSL)
                scy = bsph_r[1]
                scz = bsph_r[2]
                srs = bsph_r[3]           # radius, +inf when unbounded
                lcx = scx - c0x                            # (S, NSL)
                lcy = scy - c0y
                lcz = scz - c0z
                if shadow:
                    exm, exM = mnr(ox + dx), mxr(ox + dx)
                    eym, eyM = mnr(oy + dy), mxr(oy + dy)
                    ezm, ezM = mnr(oz + dz), mxr(oz + dz)
                    c1x = 0.5 * (exm + exM)
                    c1y = 0.5 * (eym + eyM)
                    c1z = 0.5 * (ezm + ezM)
                    r1 = 0.5 * jnp.sqrt((exM - exm) ** 2
                                        + (eyM - eym) ** 2
                                        + (ezM - ezm) ** 2)
                    ux, uy, uz = c1x - c0x, c1y - c0y, c1z - c0z
                    uu = ux * ux + uy * uy + uz * uz
                    brad = jnp.maximum(r0, r1 * 1.0005 + 1e-4)
                    tp = jnp.clip((lcx * ux + lcy * uy + lcz * uz)
                                  / jnp.maximum(uu, 1e-30), 0.0, 1.0)
                    qx = lcx - tp * ux
                    qy = lcy - tp * uy
                    qz = lcz - tp * uz
                    dist2 = qx * qx + qy * qy + qz * qz
                    re = srs + brad
                    reach_rows = ~(dist2 > re * re)
                else:
                    ilen = jax.lax.rsqrt(jnp.maximum(
                        dx * dx + dy * dy + dz * dz, 1e-30))
                    dhx = dx * ilen
                    dhy = dy * ilen
                    dhz = dz * ilen
                    sx = sumr(dhx)
                    sy = sumr(dhy)
                    sz = sumr(dhz)
                    an = jax.lax.rsqrt(jnp.maximum(
                        sx * sx + sy * sy + sz * sz, 1e-30))
                    bax, bay, baz = sx * an, sy * an, sz * an
                    cosmin = minr(dhx * bax + dhy * bay + dhz * baz,
                                  1.0)
                    cosw = jnp.clip(cosmin - 1e-4, -1.0, 1.0)
                    sinw = jnp.sqrt(jnp.maximum(1.0 - cosw * cosw, 0.0))
                    d_ax = lcx * bax + lcy * bay + lcz * baz
                    dist2 = lcx * lcx + lcy * lcy + lcz * lcz
                    perp = jnp.sqrt(jnp.maximum(
                        dist2 - d_ax * d_ax, 0.0))
                    # signed distance to the cone boundary in the
                    # (axial, radial) plane; negative = inside cone
                    e = perp * cosw - d_ax * sinw
                    reach_rows = ~(e > srs + r0)
                act_reach = reach_rows & row_act           # (S, NSL)
                # pack reach bits into NW 32-bit SMEM words; shadow
                # passes AND in the static per-light blocker union
                # accumulated by this segment's nearest-pass commits
                w_of = jax.lax.broadcasted_iota(
                    I32, (1, NSL), 1) // 32
                b_of = jax.lax.broadcasted_iota(
                    I32, (1, NSL), 1) % 32
                if NCH > 1:
                    # two-tier: per-CHUNK words at [(1+ci)*NW], the OR
                    # (any) at [0] driving the outer skip, the AND (all)
                    # at [(1+NCH)*NW] driving the full-block fast path
                    cvals = []
                    for ci in range(NCH):
                        r_c = jnp.max(
                            act_reach[ci * CH:(ci + 1) * CH].astype(I32),
                            axis=0, keepdims=True)         # (1, NSL)
                        cvals.append(r_c << b_of)
                    for w in range(NW):
                        sel = w_of == w
                        words = []
                        for ci in range(NCH):
                            word = jnp.sum(jnp.where(sel, cvals[ci], 0))
                            if lsort_on and shadow:
                                word = word & shu_s[
                                    (light * NCH + ci) * NW + w]
                            if cont_on and not shadow:
                                word = word & rfc_s[ci * NW + w]
                            umask_s[(1 + ci) * NW + w] = word
                            words.append(word)
                        anyw = words[0]
                        allw = words[0]
                        for word in words[1:]:
                            anyw = anyw | word
                            allw = allw & word
                        umask_s[w] = anyw
                        umask_s[(1 + NCH) * NW + w] = allw
                else:
                    reach = jnp.max(act_reach.astype(I32),
                                    axis=0, keepdims=True)  # (1, NSL)
                    val = reach << b_of
                    for w in range(NW):
                        word = jnp.sum(jnp.where(w_of == w, val, 0))
                        if lsort_on and shadow:
                            word = word & shu_s[light * NW + w]
                        if cont_on and not shadow:
                            word = word & rfc_s[w]
                        umask_s[w] = word

            rays = (ox, oy, oz, dx, dy, dz, tmn, tmx, osrf, oside, thru,
                    olx, oly, olz, wmask)
            zs = jnp.zeros(ox.shape, F32)
            zis = jnp.zeros(ox.shape, I32)
            if shadow:
                occ_s[:] = zis
            else:
                t_s[:] = jnp.full(ox.shape, BIG, F32)
                srf_s[:] = zis + 0x7FFFFFF
                side_s[:] = zis + 1
                for r_ in (hwx_s, hwy_s, hwz_s, hnx_s, hny_s, hnz_s,
                           hlx_s, hly_s, hlz_s):
                    r_[:] = zs
                mat_s[:] = zis
                if lsort_on:
                    for i_ in range(NL * NCH * NW):
                        shu_s[i_] = 0

            def bit_ok(s):
                return ((umask_s[s // 32] >> (s % 32)) & 1) != 0

            def bit_all(s):
                return ((umask_s[(1 + NCH) * NW + s // 32]
                         >> (s % 32)) & 1) != 0

            def bit_chunk(ci, s):
                return ((umask_s[(1 + ci) * NW + s // 32]
                         >> (s % 32)) & 1) != 0

            two_tier = guard_on and NCH > 1
            if cand_mode:
                ib = pl.program_id(0) % use_cand
            for gi, grp in enumerate(struct.groups):
                n = grp.n_block if shadow else grp.count
                if n == 0:
                    continue
                body = make_body(grp, shadow, rays)
                if two_tier:
                    # second tier: a surface reachable by EVERY chunk
                    # takes the one full-block body; otherwise only the
                    # reaching chunks' (CH, 128) bodies run
                    bodies_c = [make_body(grp, shadow, rays, part=ci)
                                for ci in range(NCH)]

                    def guarded(s, body=body, bodies_c=bodies_c):
                        @pl.when(bit_all(s))
                        def _():
                            body(s)

                        @pl.when(~bit_all(s))
                        def _():
                            for ci in range(NCH):
                                pl.when(bit_chunk(ci, s))(
                                    lambda ci=ci: bodies_c[ci](s))
                else:
                    def guarded(s, body=body):
                        body(s)
                if cand_mode:
                    lo = cand_ref[ib, gi]
                    hi = cand_ref[ib, gi + 1]

                    def cand_body(j, c, body=body):
                        body(cand_ref[ib, NG + 1 + j])
                        return c
                    jax.lax.fori_loop(lo, hi, cand_body, 0)
                elif guard_on:
                    if n <= cfg.unroll:
                        for s in range(grp.start, grp.start + n):
                            pl.when(bit_ok(s))(lambda s=s: guarded(s))
                    else:
                        # word-skip scan: 32 surfaces per zero umask
                        # word cost ONE scalar test (deep-tail segments
                        # have mostly-zero words); non-zero words test
                        # bits from the loaded word, not SMEM reloads.
                        # Shadow passes add the reference's full-mask
                        # early-out (CHECK_MASK(OO_out, FULL),
                        # tracer.cpp:575-588): once every lane needing
                        # the test is occluded, the rest of the blocker
                        # list is skipped — occ is saturated, so this
                        # cannot change the result
                        if shadow:
                            # evaluated once per blocker group: at 8k
                            # lanes full occlusion is rare, so the
                            # reduce is hoisted out of the word loop
                            any_open = jnp.any(wmask & (occ_s[:] == 0))
                        for w in range(grp.start // 32,
                                       -(-(grp.start + n) // 32)):
                            b_lo = max(grp.start - w * 32, 0)
                            b_hi = min(grp.start + n - w * 32, 32)
                            word = umask_s[w]
                            go = word != 0
                            if shadow:
                                go = go & any_open

                            @pl.when(go)
                            def _(w=w, b_lo=b_lo, b_hi=b_hi, word=word):
                                def bit_body(b, c, w=w, word=word):
                                    pl.when(((word >> b) & 1) != 0)(
                                        lambda: guarded(w * 32 + b))
                                    return c
                                jax.lax.fori_loop(b_lo, b_hi, bit_body,
                                                  0)
                elif n <= cfg.unroll:
                    # unroll: constant surface indices make every sp_f/sp_i
                    # access a static SMEM offset Mosaic can hoist out of
                    # the segment while_loop (they are loop-invariant)
                    for s in range(grp.start, grp.start + n):
                        body(s)
                else:
                    def loop_body(s, c, body=body):
                        body(s)
                        return c
                    jax.lax.fori_loop(grp.start, grp.start + n,
                                      loop_body, 0)
            if shadow:
                return occ_s[:]
            return (t_s[:], srf_s[:], side_s[:], hwx_s[:], hwy_s[:],
                    hwz_s[:], hnx_s[:], hny_s[:], hnz_s[:], mat_s[:],
                    hlx_s[:], hly_s[:], hlz_s[:])

        # ---- material params per ray (unrolled one-hot over NM) -------
        def mat_params(midx):
            outs = None
            for m in range(NM):
                selF = (midx == m).astype(F32)
                vals = [selF * mat_f[m, k] for k in range(10)]
                outs = vals if outs is None else [
                    o + v_ for o, v_ in zip(outs, vals)]
            return tuple(outs)

        # ---- texture fetch (MT_tex, tracer.cpp:2297-2321) -------------
        def tex_fetch(bmat, hlx, hly, mc_r, mc_g, mc_b):
            """Pow-2 mask/shift UV addressing per textured material
            (static constants), then one packed-u8 atlas gather: the
            dynamic row loop spans only the texture rows the block
            actually touches (ray coherence keeps that small), with a
            128-wide lane gather per row. The reference does a per-lane
            scalar fetch loop instead (PAINT_FRAG, tracer.cpp:653-662)."""
            shape = bmat.shape
            idx = jnp.zeros(shape, I32)
            texmask = jnp.zeros(shape, jnp.bool_)
            for (m, base, xm, ym, xs) in struct.tex:
                lane = bmat == m
                u = hlx - mat_f[m, 12]
                v = hly - mat_f[m, 13]
                ix = jnp.floor(u * float(xm + 1) / mat_f[m, 10]) \
                    .astype(I32) & xm
                iy = jnp.floor(v * float(ym + 1) / mat_f[m, 11]) \
                    .astype(I32) & ym
                id_m = base + (iy << xs) + ix
                idx = jnp.where(lane, id_m, idx)
                texmask = texmask | lane
            lo = idx & (LANES - 1)
            hi = idx >> 7
            # row-loop bounds over textured lanes only; empty -> no trips
            hmin = jnp.min(jnp.where(texmask, hi, jnp.int32(0x7FFFFFF)))
            hmax = jnp.max(jnp.where(texmask, hi, jnp.int32(-1)))

            def row(r, acc):
                rowv = jnp.broadcast_to(tex_r[pl.ds(r, 1), :], shape)
                g = jnp.take_along_axis(rowv, lo, axis=1)
                return jnp.where(hi == r, g, acc)

            texv = jax.lax.fori_loop(hmin, hmax + 1, row,
                                     jnp.zeros(shape, I32))
            lut0 = jnp.broadcast_to(lut_r[pl.ds(0, 1), :], shape)
            lut1 = jnp.broadcast_to(lut_r[pl.ds(1, 1), :], shape)

            def dec(k):
                k7 = k & 127
                return jnp.where(k >= 128,
                                 jnp.take_along_axis(lut1, k7, axis=1),
                                 jnp.take_along_axis(lut0, k7, axis=1))

            t_r = dec((texv >> 16) & 255)
            t_g = dec((texv >> 8) & 255)
            t_b = dec(texv & 255)
            return (jnp.where(texmask, t_r, mc_r),
                    jnp.where(texmask, t_g, mc_g),
                    jnp.where(texmask, t_b, mc_b))

        # ---- PT main loop (ops/pt.py estimator, lane-for-lane) --------
        if pt:
            ox = ox_r[:]
            oy = oy_r[:]
            oz = oz_r[:]
            dx = dx_r[:]
            dy = dy_r[:]
            dz = dz_r[:]
            tmn = tm_r[:]
            seed0 = sd0_r[:]
            shape = ox.shape
            z = jnp.zeros(shape, F32)
            zi = jnp.zeros(shape, I32)
            zb = jnp.zeros(shape, jnp.bool_)
            big_t = jnp.full(shape, BIG, F32)

            lcg_a = jnp.int32(214013)
            lcg_c = jnp.int32(2531011)

            def lcg_uniform(seed):
                seed = seed * lcg_a + lcg_c
                u = (jax.lax.shift_right_logical(seed, 8).astype(F32)
                     * (1.0 / 16777216.0))
                return seed, u

            def pt_body(st, primary=False):
                (ox, oy, oz, dx, dy, dz, tmn, thr_r, thr_g, thr_b,
                 osrf, oside, thru_i, olx, oly, olz, act_i,
                 acc_r, acc_g, acc_b, seed, dep, sp, stk, it) = st
                thru = thru_i != 0
                active = act_i != 0
                hitres = intersect(ox, oy, oz, dx, dy, dz, tmn, big_t,
                                   osrf, oside, thru, olx, oly, olz,
                                   False, active, primary=primary)
                (bt, bsrf, bside, hx, hy, hz, nx, ny, nz, bmat,
                 hlx, hly, hlz) = hitres
                hit = (bt < BIG) & active
                nn = jax.lax.rsqrt(jnp.maximum(
                    nx * nx + ny * ny + nz * nz, 1e-30))
                nx, ny, nz = nx * nn, ny * nn, nz * nn

                (mc_r, mc_g, mc_b, m_dff, m_spc, m_pow, m_rfl, m_trn,
                 m_rfr, m_ext) = mat_params(bmat)
                if any_tex:
                    mc_r, mc_g, mc_b = tex_fetch(bmat, hlx, hly,
                                                 mc_r, mc_g, mc_b)
                if any_gamma:
                    gam = flag_vec(PROP_GAMMA, bmat)
                    mc_r = jnp.where(gam, mc_r * mc_r, mc_r)
                    mc_g = jnp.where(gam, mc_g * mc_g, mc_g)
                    mc_b = jnp.where(gam, mc_b * mc_b, mc_b)

                # emission (array-accumulated light radiance on
                # LIGHT-tagged sides, s_emis / object.cpp:1333-1374)
                em_r, em_g, em_b = z, z, z
                for (row, origid) in struct.emis_rows:
                    m_ = bsrf == origid
                    outer = bside > 0
                    em_r = jnp.where(m_, jnp.where(
                        outer, sp_f[row, 38], sp_f[row, 41]), em_r)
                    em_g = jnp.where(m_, jnp.where(
                        outer, sp_f[row, 39], sp_f[row, 42]), em_g)
                    em_b = jnp.where(m_, jnp.where(
                        outer, sp_f[row, 40], sp_f[row, 43]), em_b)
                hitf = hit
                acc_r = acc_r + jnp.where(hitf, thr_r * em_r, 0.0)
                acc_g = acc_g + jnp.where(hitf, thr_g * em_g, 0.0)
                acc_b = acc_b + jnp.where(hitf, thr_b * em_b, 0.0)

                # Fresnel weights + refraction dir (fresnel_terms
                # semantics: TR section + RF opaque-reflective section)
                dl = jax.lax.rsqrt(jnp.maximum(
                    dx * dx + dy * dy + dz * dz, 1e-30))
                rhx, rhy, rhz = dx * dl, dy * dl, dz * dl
                dot = rhx * nx + rhy * ny + rhz * nz
                eta = m_rfr
                k = 1.0 - eta * eta + (eta * dot) ** 2
                refracts = flag_vec(PROP_REFRACT, bmat)
                if refracts is None:
                    refracts = zb
                tir = (k < 0.0) & refracts
                sq = jnp.sqrt(jnp.maximum(k, 0.0))
                rfx = jnp.where(refracts,
                                eta * rhx - nx * (eta * dot + sq), rhx)
                rfy = jnp.where(refracts,
                                eta * rhy - ny * (eta * dot + sq), rhy)
                rfz = jnp.where(refracts,
                                eta * rhz - nz * (eta * dot + sq), rhz)
                if any_fresnel:
                    fres = flag_vec(PROP_FRESNEL, bmat)
                    opaque = flag_vec(PROP_OPAQUE, bmat)
                    fres_lanes = (fres if opaque is None
                                  else (fres & ~opaque))
                    rs = _sdiv(eta * dot + sq, eta * dot - sq, 1.0)
                    rp = _sdiv(dot + eta * sq, dot - eta * sq, 1.0)
                    Fr = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
                    Fr = jnp.where(fres_lanes, Fr, 0.0)
                else:
                    Fr = z
                if any_fresnel:
                    # TIR folds transparency into reflectivity ONLY
                    # under Fresnel (tracer.cpp:3268-3301 is inside
                    # RT_FEAT_FRESNEL); without it the reference's TIR
                    # lanes transmit zero and gain no reflectivity
                    Fr = jnp.where(tir, 1.0, Fr)
                c_trn = jnp.where(tir, 0.0, m_trn * (1.0 - Fr))
                c_rfl = m_rfl + m_trn * Fr
                if any_rf_fresnel:
                    rcp = _sdiv(jnp.ones_like(m_rfr), m_rfr, 0.0)
                    ext2 = m_ext * m_ext
                    t2 = 2.0 * dot * rcp
                    c2 = dot * dot
                    gg = rcp * rcp + ext2
                    x0 = c2 + gg
                    x1 = c2 * gg + 1.0
                    f_metal = jnp.abs(-0.5 * (
                        _sdiv(x0 + t2, x0 - t2, 1.0)
                        + _sdiv(x1 + t2, x1 - t2, 1.0)))
                    rs_o = _sdiv(eta * dot + sq, eta * dot - sq, 1.0)
                    rp_o = _sdiv(dot + eta * sq, dot - eta * sq, 1.0)
                    f_plain = jnp.abs(-0.5 * (rs_o * rs_o + rp_o * rp_o))
                    metal_f = flag_vec(PROP_METAL, bmat)
                    f_rf = f_plain if metal_f is None else \
                        jnp.where(metal_f, f_metal, f_plain)
                    rf_mask = flag_vec_of(rf_fres_mats, bmat)
                    c_rfl = jnp.where(rf_mask, m_rfl * f_rf, c_rfl)

                # ---- split-tree children (ops/pt.py trace_pt,
                # lane-for-lane: same draw order u1 u2 u_rr u_split) --
                seed, u1 = lcg_uniform(seed)
                seed, u2 = lcg_uniform(seed)
                seed, urr = lcg_uniform(seed)
                seed, usplit = lcg_uniform(seed)

                emissive = flag_vec(PROP_LIGHT, bmat)
                if emissive is None:
                    emissive = zb
                can_rec = hit & ~emissive & (dep < cfg.depth)
                opq = flag_vec(PROP_OPAQUE, bmat)
                if opq is None:
                    opq = zb
                # Fresnel branch weights: both at the top PT_SHALLOW
                # levels, a defensively sampled one below
                # (tracer.cpp:3428-3466); opaque mirrors (RF section)
                # are deterministic, never split
                shallow = dep < PT_SHALLOW
                s_rt = jnp.maximum(c_rfl + c_trn, 1e-30)
                qd = 0.25 + 0.5 * c_rfl / s_rt
                chose_rfl = usplit < qd
                w_rfl = jnp.where(shallow, c_rfl,
                                  jnp.where(chose_rfl, c_rfl / qd, 0.0))
                w_trn = jnp.where(
                    shallow, c_trn,
                    jnp.where(chose_rfl, 0.0,
                              c_trn / jnp.maximum(1.0 - qd, 1e-30)))
                w_rfl = jnp.where(opq, c_rfl, w_rfl)
                w_trn = jnp.where(opq, 0.0, w_trn)

                # diffuse child: RR below split depth
                deep = dep >= (cfg.depth - 5)
                q = jnp.clip(jnp.maximum(jnp.maximum(mc_r, mc_g), mc_b),
                             1e-4, 1.0)
                rr_kill = deep & (urr >= q)
                dq = jnp.where(deep, 1.0 / q, 1.0)
                dm_r = mc_r * m_dff * dq
                dm_g = mc_g * m_dff * dq
                dm_b = mc_b * m_dff * dq
                dif_ok = flag_vec(PROP_DIFFUSE, bmat)
                if dif_ok is None:
                    dif_ok = zb
                have_dif = can_rec & dif_ok & ~rr_kill
                have_trn = can_rec & (w_trn > 0.0)
                have_rfl = can_rec & (w_rfl > 0.0)

                ddn = dx * nx + dy * ny + dz * nz
                mrx = dx - 2.0 * ddn * nx
                mry = dy - 2.0 * ddn * ny
                mrz = dz - 2.0 * ddn * nz
                # cosine-weighted hemisphere about n (ops/pt.py basis)
                near_z = jnp.abs(nz) < 0.9
                ax_ = jnp.where(near_z, 0.0, 1.0)
                azz = jnp.where(near_z, 1.0, 0.0)
                t1x = -azz * ny
                t1y = azz * nx - ax_ * nz
                t1z = ax_ * ny
                t1n = jax.lax.rsqrt(jnp.maximum(
                    t1x * t1x + t1y * t1y + t1z * t1z, 1e-20))
                t1x, t1y, t1z = t1x * t1n, t1y * t1n, t1z * t1n
                t2x = ny * t1z - nz * t1y
                t2y = nz * t1x - nx * t1z
                t2z = nx * t1y - ny * t1x
                rr_ = jnp.sqrt(jnp.maximum(u1, 0.0))
                phi = (2.0 * np.pi) * u2
                xx = rr_ * jnp.cos(phi)
                yy = rr_ * jnp.sin(phi)
                zz2 = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                dfx = t1x * xx + t2x * yy + nx * zz2
                dfy = t1y * xx + t2y * yy + ny * zz2
                dfz = t1z * xx + t2z * yy + nz * zz2

                # continue with the diffuse child; pending siblings
                # pushed rfl-then-trn (transmit pops first) — matches
                # ops/pt.py exactly
                cont_dif = have_dif
                cont_trn = ~cont_dif & have_trn
                cont_rfl = ~cont_dif & ~cont_trn & have_rfl
                cont = cont_dif | cont_trn | cont_rfl

                new_stk = list(stk)
                depf = (dep + 1).astype(F32)
                bsrf_f = bsrf.astype(F32)
                bside_f = bside.astype(F32)
                for pred, pdir, wgt, pthru in (
                        (have_rfl & ~cont_rfl, (mrx, mry, mrz), w_rfl,
                         z),
                        (have_trn & ~cont_trn, (rfx, rfy, rfz), w_trn,
                         z + 1.0)):
                    predk = pred & (sp < PT_SD)
                    vals = (hx, hy, hz, pdir[0], pdir[1], pdir[2],
                            thr_r * wgt, thr_g * wgt, thr_b * wgt,
                            depf, bsrf_f, bside_f, pthru,
                            hlx, hly, hlz)
                    for kk in range(PT_SD):
                        at_k = predk & (sp == kk)
                        new_stk[kk] = tuple(
                            jnp.where(at_k, v_, s_)
                            for v_, s_ in zip(vals, new_stk[kk]))
                    sp = sp + predk.astype(I32)

                n_dx = jnp.where(cont_dif, dfx,
                                 jnp.where(cont_trn, rfx, mrx))
                n_dy = jnp.where(cont_dif, dfy,
                                 jnp.where(cont_trn, rfy, mry))
                n_dz = jnp.where(cont_dif, dfz,
                                 jnp.where(cont_trn, rfz, mrz))
                w_c = jnp.where(cont_trn, w_trn, w_rfl)
                n_tr = jnp.where(cont_dif, thr_r * dm_r, thr_r * w_c)
                n_tg = jnp.where(cont_dif, thr_g * dm_g, thr_g * w_c)
                n_tb = jnp.where(cont_dif, thr_b * dm_b, thr_b * w_c)

                # finished nodes pop a pending sibling
                can_pop = ~cont & (sp > 0)
                psp = jnp.maximum(sp - 1, 0)
                pops = []
                for f in range(16):
                    acc0 = jnp.zeros(shape, F32)
                    for kk in range(PT_SD):
                        acc0 = jnp.where(psp == kk, new_stk[kk][f],
                                         acc0)
                    pops.append(acc0)
                (p_ox, p_oy, p_oz, p_dx, p_dy, p_dz, p_tr, p_tg, p_tb,
                 p_dep, p_srf, p_side, p_thru, p_olx, p_oly,
                 p_olz) = pops

                w2 = lambda c_, a_, b_: jnp.where(c_, a_, b_)
                return (
                    w2(cont, hx, w2(can_pop, p_ox, ox)),
                    w2(cont, hy, w2(can_pop, p_oy, oy)),
                    w2(cont, hz, w2(can_pop, p_oz, oz)),
                    w2(cont, n_dx, w2(can_pop, p_dx, dx)),
                    w2(cont, n_dy, w2(can_pop, p_dy, dy)),
                    w2(cont, n_dz, w2(can_pop, p_dz, dz)),
                    jnp.where(cont | can_pop, 0.0, tmn),
                    w2(cont, n_tr, w2(can_pop, p_tr, thr_r)),
                    w2(cont, n_tg, w2(can_pop, p_tg, thr_g)),
                    w2(cont, n_tb, w2(can_pop, p_tb, thr_b)),
                    w2(cont, bsrf,
                       w2(can_pop, p_srf.astype(I32), osrf)),
                    w2(cont, bside,
                       w2(can_pop, p_side.astype(I32), oside)),
                    (cont_trn | (~cont & can_pop
                                 & (p_thru != 0.0))).astype(I32),
                    w2(cont, hlx, w2(can_pop, p_olx, olx)),
                    w2(cont, hly, w2(can_pop, p_oly, oly)),
                    w2(cont, hlz, w2(can_pop, p_olz, olz)),
                    (cont | can_pop).astype(I32),
                    acc_r, acc_g, acc_b, seed,
                    w2(cont, dep + 1, w2(can_pop, p_dep.astype(I32),
                                         dep)),
                    jnp.where(can_pop, psp, sp),
                    tuple(new_stk), it + 1)

            def pt_cond(st):
                # tree-node cap (matches ops/pt.py): a depth-D path
                # sees D+1 hits; the split tree multiplies node count
                # by < 4 in practice
                return (jnp.any(st[16] != 0)
                        & (st[24] < 6 * (cfg.depth + 1)))

            stk0 = tuple(tuple(z for _ in range(16))
                         for _ in range(PT_SD))
            st0 = (ox, oy, oz, dx, dy, dz, tmn,
                   z + 1.0, z + 1.0, z + 1.0, zi - 1, zi + 1, zi,
                   z, z, z, zi + 1, z, z, z, seed0, zi, zi, stk0,
                   jnp.zeros((), I32))
            if use_cand:
                # peel the primary segment: its nearest-hit pass walks
                # the per-block candidate list instead of all surfaces
                st0 = pt_body(st0, primary=True)
            out = jax.lax.while_loop(pt_cond, pt_body, st0)
            cr_r, cg_r, cb_r, sdo_r = rest_refs[:4]
            cr_r[:] = out[17]
            cg_r[:] = out[18]
            cb_r[:] = out[19]
            sdo_r[:] = out[20]
            return

        # ---- main loop -------------------------------------------------
        if resume:
            (thr_r_r, thg_r, thb_r, dep_r, osrf_r, osd_r, thru_r,
             olx_r, oly_r, olz_r, act_r, ac_r_r, ac_g_r,
             ac_b_r) = rest_refs[:14]
            out_refs = rest_refs[14:]
        else:
            out_refs = rest_refs
        ox = ox_r[:]
        oy = oy_r[:]
        oz = oz_r[:]
        dx = dx_r[:]
        dy = dy_r[:]
        dz = dz_r[:]
        tmn = tm_r[:]
        shape = ox.shape
        if emit_paths:
            rec_s[:] = jnp.zeros((emit_paths,) + shape, I32)
        z = jnp.zeros(shape, F32)
        zi = jnp.zeros(shape, I32)
        zb = jnp.zeros(shape, jnp.bool_)
        big_t = jnp.full(shape, BIG, F32)
        one_t = jnp.full(shape, 1.0, F32)

        amb_r, amb_g, amb_b = misc[0], misc[1], misc[2]

        def shade_and_continue(st, primary=False):
            (ox, oy, oz, dx, dy, dz, tmn, thr_r, thr_g, thr_b, depth,
             osrf, oside, thru_i, olx, oly, olz, active_i,
             acc_r, acc_g, acc_b, sp, stk, it) = st
            thru = thru_i != 0
            active = active_i != 0

            hitres = intersect(
                ox, oy, oz, dx, dy, dz, tmn, big_t, osrf, oside, thru,
                olx, oly, olz, False, active, primary=primary)
            (bt, bsrf, bside, hx, hy, hz, nx, ny, nz, bmat,
             hlx, hly, hlz) = hitres
            hit = (bt < BIG) & active
            # normalize normal
            nn = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                           1e-30))
            nx, ny, nz = nx * nn, ny * nn, nz * nn

            (mc_r, mc_g, mc_b, m_dff, m_spc, m_pow, m_rfl, m_trn, m_rfr,
             m_ext) = mat_params(bmat)
            if any_tex:
                mc_r, mc_g, mc_b = tex_fetch(bmat, hlx, hly,
                                             mc_r, mc_g, mc_b)
            if any_gamma:
                # gamma decode x^2 (PAINT_COLX, tracer.cpp:664-673)
                gam = flag_vec(PROP_GAMMA, bmat)
                mc_r = jnp.where(gam, mc_r * mc_r, mc_r)
                mc_g = jnp.where(gam, mc_g * mc_g, mc_g)
                mc_b = jnp.where(gam, mc_b * mc_b, mc_b)

            col_r = mc_r * amb_r
            col_g = mc_g * amb_g
            col_b = mc_b * amb_b

            diffuse_v = flag_vec(PROP_DIFFUSE, bmat)
            specular_v = flag_vec(PROP_SPECULAR, bmat)
            metal_v = flag_vec(PROP_METAL, bmat)
            occ_rec = zi
            for l in range(NL):
                lpx, lpy, lpz = lg_f[l, 0], lg_f[l, 1], lg_f[l, 2]
                lcr, lcg, lcb = lg_f[l, 3], lg_f[l, 4], lg_f[l, 5]
                cnt, lnr, qdr = lg_f[l, 6], lg_f[l, 7], lg_f[l, 8]
                lvx, lvy, lvz = lpx - hx, lpy - hy, lpz - hz
                r_dot = lvx * nx + lvy * ny + lvz * nz
                lit = (r_dot > 0.0) & hit
                occ = intersect(hx, hy, hz, lvx, lvy, lvz, z, one_t,
                                bsrf, bside, zb, hlx, hly, hlz, True,
                                lit, light=l)
                hm = lit & ~(occ != 0)
                if emit_paths:
                    occ_rec = occ_rec | ((~hm).astype(I32) << (16 + l))
                r2 = lvx * lvx + lvy * lvy + lvz * lvz
                r = jnp.sqrt(jnp.maximum(r2, 1e-30))
                attn = jax.lax.rsqrt(jnp.maximum(
                    cnt + lnr * r + qdr * r2, 1e-30))
                if diffuse_v is not None:
                    dfs = jnp.where(hm & diffuse_v,
                                    r_dot / r * attn * m_dff, 0.0)
                else:
                    dfs = z
                if specular_v is not None:
                    rlx = lvx - 2.0 * r_dot * nx
                    rly = lvy - 2.0 * r_dot * ny
                    rlz = lvz - 2.0 * r_dot * nz
                    sdot = rlx * dx + rly * dy + rlz * dz
                    d2 = dx * dx + dy * dy + dz * dz
                    cosr = sdot * jax.lax.rsqrt(
                        jnp.maximum(d2 * r2, 1e-30))
                    spc_on = hm & (sdot > 0.0) & specular_v
                    cosr = jnp.clip(jnp.where(spc_on, cosr, 1.0),
                                    1e-6, 1.0)
                    spc = jnp.where(
                        spc_on, jnp.exp(m_pow * jnp.log(cosr)) * m_spc,
                        0.0)
                else:
                    spc = z
                if metal_v is not None:
                    tm = dfs + spc
                    col_r = col_r + jnp.where(metal_v, mc_r * lcr * tm,
                                              mc_r * lcr * dfs + lcr * spc)
                    col_g = col_g + jnp.where(metal_v, mc_g * lcg * tm,
                                              mc_g * lcg * dfs + lcg * spc)
                    col_b = col_b + jnp.where(metal_v, mc_b * lcb * tm,
                                              mc_b * lcb * dfs + lcb * spc)
                else:
                    col_r = col_r + mc_r * lcr * dfs + lcr * spc
                    col_g = col_g + mc_g * lcg * dfs + lcg * spc
                    col_b = col_b + mc_b * lcb * dfs + lcb * spc

            if any_emissive:
                emissive = flag_vec(PROP_LIGHT, bmat)
                col_r = jnp.where(emissive, mc_r, col_r)
                col_g = jnp.where(emissive, mc_g, col_g)
                col_b = jnp.where(emissive, mc_b, col_b)

            # Fresnel / refraction (tracer.cpp:3182-3424)
            if any_refract or any_fresnel:
                dl = jax.lax.rsqrt(jnp.maximum(
                    dx * dx + dy * dy + dz * dz, 1e-30))
                rhx, rhy, rhz = dx * dl, dy * dl, dz * dl
                dot = rhx * nx + rhy * ny + rhz * nz
                eta = m_rfr
                k = 1.0 - eta * eta + (eta * dot) ** 2
                refracts = flag_vec(PROP_REFRACT, bmat)
                if refracts is None:
                    refracts = zb
                tir = (k < 0.0) & refracts
                sq = jnp.sqrt(jnp.maximum(k, 0.0))
                rfx = jnp.where(refracts,
                                eta * rhx - nx * (eta * dot + sq), rhx)
                rfy = jnp.where(refracts,
                                eta * rhy - ny * (eta * dot + sq), rhy)
                rfz = jnp.where(refracts,
                                eta * rhz - nz * (eta * dot + sq), rhz)
                if any_fresnel:
                    fres = flag_vec(PROP_FRESNEL, bmat)
                    opaque = flag_vec(PROP_OPAQUE, bmat)
                    fres_lanes = fres if opaque is None else (fres & ~opaque)
                    rs = _sdiv(eta * dot + sq, eta * dot - sq, 1.0)
                    rp = _sdiv(dot + eta * sq, dot - eta * sq, 1.0)
                    Fr = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
                    Fr = jnp.where(fres_lanes, Fr, 0.0)
                else:
                    Fr = z
                if any_fresnel:
                    # TIR folds transparency into reflectivity ONLY
                    # under Fresnel (tracer.cpp:3268-3301 is inside
                    # RT_FEAT_FRESNEL); without it the reference's TIR
                    # lanes transmit zero and gain no reflectivity
                    Fr = jnp.where(tir, 1.0, Fr)
                c_trn = jnp.where(tir, 0.0, m_trn * (1.0 - Fr))
                c_rfl = m_rfl + m_trn * Fr
            else:
                rfx, rfy, rfz = dx, dy, dz
                c_trn = m_trn
                c_rfl = m_rfl

            if any_rf_fresnel:
                # RF-section Fresnel for OPAQUE reflective materials
                # (tracer.cpp:3671-3830): metal fast conductor formula
                # for metals, plain dielectric otherwise; c_rfl *= F
                if not (any_refract or any_fresnel):
                    dl = jax.lax.rsqrt(jnp.maximum(
                        dx * dx + dy * dy + dz * dz, 1e-30))
                    dot = (dx * nx + dy * ny + dz * nz) * dl
                    eta = m_rfr
                    k = 1.0 - eta * eta + (eta * dot) ** 2
                    sq = jnp.sqrt(jnp.maximum(k, 0.0))
                rcp = _sdiv(jnp.ones_like(m_rfr), m_rfr, 0.0)
                ext2 = m_ext * m_ext
                t2 = 2.0 * dot * rcp
                c2 = dot * dot
                gg = rcp * rcp + ext2
                x0 = c2 + gg
                x1 = c2 * gg + 1.0
                f_metal = jnp.abs(-0.5 * (
                    _sdiv(x0 + t2, x0 - t2, 1.0)
                    + _sdiv(x1 + t2, x1 - t2, 1.0)))
                rs_o = _sdiv(eta * dot + sq, eta * dot - sq, 1.0)
                rp_o = _sdiv(dot + eta * sq, dot - eta * sq, 1.0)
                f_plain = jnp.abs(-0.5 * (rs_o * rs_o + rp_o * rp_o))
                metal_f = flag_vec(PROP_METAL, bmat)
                f_rf = f_plain if metal_f is None else \
                    jnp.where(metal_f, f_metal, f_plain)
                rf_mask = flag_vec_of(rf_fres_mats, bmat)
                c_rfl = jnp.where(rf_mask, m_rfl * f_rf, c_rfl)

            # local weight from ORIGINAL material rfl/trn (TR_mix,
            # tracer.cpp:3566-3571), not the Fresnel-modulated values
            lw = jnp.maximum(1.0 - m_trn - m_rfl, 0.0)
            acc_r = acc_r + jnp.where(hit, thr_r * col_r * lw, 0.0)
            acc_g = acc_g + jnp.where(hit, thr_g * col_g * lw, 0.0)
            acc_b = acc_b + jnp.where(hit, thr_b * col_b * lw, 0.0)

            def record_path(kind):
                """Per-segment path record for trace-replay autodiff
                (see _make_kernel docstring for the bit layout)."""
                packed = ((jnp.where(hit, bsrf, 0) & 0xFFF)
                          | jnp.where(bside > 0, 1 << 12, 0)
                          | (kind << 13)
                          | jnp.where(hit, 1 << 15, 0)
                          | occ_rec)
                packed = jnp.where(active, packed, 0)
                # static-index conditional writes: a dynamic-index
                # store on the leading scratch axis lowers to scalar
                # element traffic (measured ~75x the whole render cost)
                for kk in range(emit_paths):
                    @pl.when(it == kk)
                    def _(kk=kk):
                        rec_s[kk] = packed

            if not any_cont:
                if emit_paths:
                    record_path(zi)
                # no material reflects or transmits: single segment
                return (ox, oy, oz, dx, dy, dz, tmn, thr_r, thr_g, thr_b,
                        depth, osrf, oside, thru_i, olx, oly, olz, zi,
                        acc_r, acc_g, acc_b, sp, stk, it + 1)

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

            cont = go_rfl | go_trn
            use_rfl = go_rfl
            n_ox, n_oy, n_oz = hx, hy, hz
            n_dx = jnp.where(use_rfl, rlx2, rfx)
            n_dy = jnp.where(use_rfl, rly2, rfy)
            n_dz = jnp.where(use_rfl, rlz2, rfz)
            n_tr = jnp.where(use_rfl, trl_r, trn_r)
            n_tg = jnp.where(use_rfl, trl_g, trn_g)
            n_tb = jnp.where(use_rfl, trl_b, trn_b)
            w2 = lambda c_, a_, b_: jnp.where(c_, a_, b_)

            if not struct.can_push:
                # no material can spawn both branches: the stack can never
                # hold anything, so push/pop machinery drops out entirely
                ox2 = w2(cont, n_ox, ox)
                oy2 = w2(cont, n_oy, oy)
                oz2 = w2(cont, n_oz, oz)
                dx2 = w2(cont, n_dx, dx)
                dy2 = w2(cont, n_dy, dy)
                dz2 = w2(cont, n_dz, dz)
                tr2 = w2(cont, n_tr, thr_r)
                tg2 = w2(cont, n_tg, thr_g)
                tb2 = w2(cont, n_tb, thr_b)
                dep2 = w2(cont, depth + 1, depth)
                osrf2 = w2(cont, bsrf, osrf)
                osd2 = w2(cont, bside, oside)
                thru2 = (cont & ~use_rfl).astype(I32)
                tmn2 = jnp.where(cont, 0.0, tmn)
                act2 = (active & cont).astype(I32)
                ol2x = w2(cont, hlx, olx)
                ol2y = w2(cont, hly, oly)
                ol2z = w2(cont, hlz, olz)
                if emit_paths:
                    record_path(jnp.where(cont,
                                          jnp.where(use_rfl, 1, 2), 0))
                return (ox2, oy2, oz2, dx2, dy2, dz2, tmn2, tr2, tg2,
                        tb2, dep2, osrf2, osd2, thru2, ol2x, ol2y, ol2z,
                        act2, acc_r, acc_g, acc_b, sp, stk, it + 1)

            push = go_rfl & go_trn & (sp < D)
            new_stk = []
            vals = (hx, hy, hz, rfx, rfy, rfz, trn_r, trn_g, trn_b,
                    (depth + 1).astype(F32), bsrf.astype(F32),
                    bside.astype(F32), hlx, hly, hlz)
            for kk in range(D):
                at_k = push & (sp == kk)
                slot = stk[kk]
                new_stk.append(tuple(
                    jnp.where(at_k, v, sl) for v, sl in zip(vals, slot)))
            sp2 = sp + push.astype(I32)

            can_pop = active & ~cont & (sp2 > 0)
            psp = jnp.maximum(sp2 - 1, 0)
            pops = []
            for f in range(15):
                acc0 = jnp.zeros(shape, F32)
                for kk in range(D):
                    acc0 = jnp.where(psp == kk, new_stk[kk][f], acc0)
                pops.append(acc0)
            (p_ox, p_oy, p_oz, p_dx, p_dy, p_dz, p_tr, p_tg, p_tb,
             p_dep, p_srf, p_side, p_olx, p_oly, p_olz) = pops

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
            ol2x = w2(cont, hlx, w2(can_pop, p_olx, olx))
            ol2y = w2(cont, hly, w2(can_pop, p_oly, oly))
            ol2z = w2(cont, hlz, w2(can_pop, p_olz, olz))

            return (ox2, oy2, oz2, dx2, dy2, dz2, tmn2, tr2, tg2, tb2,
                    dep2, osrf2, osd2, thru2, ol2x, ol2y, ol2z, act2,
                    acc_r, acc_g, acc_b, sp3, tuple(new_stk), it + 1)

        # stack only materializes when both branches can fire at once
        ND = D if (any_cont and struct.can_push) else 1
        stk0 = tuple(tuple(z for _ in range(15)) for _ in range(ND))
        if resume:
            # accumulators resume from the emitted values so the whole
            # multi-round color sum is the SAME f32 addition chain as
            # the monolithic kernel (bitwise-identical output)
            st0 = (ox, oy, oz, dx, dy, dz, tmn,
                   thr_r_r[:], thg_r[:], thb_r[:], dep_r[:], osrf_r[:],
                   osd_r[:], thru_r[:],
                   olx_r[:], oly_r[:], olz_r[:],
                   act_r[:], ac_r_r[:], ac_g_r[:], ac_b_r[:], zi, stk0,
                   jnp.zeros((), I32))
        else:
            st0 = (ox, oy, oz, dx, dy, dz, tmn,
                   z + 1.0, z + 1.0, z + 1.0, zi, zi - 1, zi + 1, zi,
                   z, z, z,
                   zi + 1, z, z, z, zi, stk0,
                   jnp.zeros((), I32))

        def cond(st):
            return jnp.any(st[17] != 0) & (st[23] < cfg.max_segments)

        if use_cand:
            # peel the primary segment (candidate-list nearest hit)
            st0 = shade_and_continue(st0, primary=True)
        out = jax.lax.while_loop(cond, shade_and_continue, st0)
        cr_r, cg_r, cb_r = out_refs[:3]
        cr_r[:] = out[18]
        cg_r[:] = out[19]
        cb_r[:] = out[20]
        if emit_state:
            for ref, val in zip(out_refs[3:], out[:21]):
                ref[:] = val
        if emit_paths:
            for k in range(emit_paths):
                out_refs[3 + k][:] = rec_s[k]

    return kernel


def _hit_scratch(sub: int):
    """Scratch VMEM for the in-place nearest-hit/occlusion state
    (t, srf, side, hw xyz, hn xyz, mat, hl xyz, occ) — see _make_kernel."""
    f = pltpu.VMEM((sub, LANES), F32)
    i = pltpu.VMEM((sub, LANES), I32)
    return [f, i, i, f, f, f, f, f, f, i, f, f, f, i]


def _build_candidates(ps: PackedScene, struct: KernelStruct, tiles,
                      period: int, sub: int):
    """Per-block compacted surface candidate lists for the PRIMARY
    segment (the stile/tilebuffer analog, engine.cpp:1956-2128 +
    3129-3253, computed as one jnp pass): for each of ``period`` ray
    blocks, bound the block's rays by an origin box + direction cone
    (the same predicate as the kernel's runtime guard, with extra slack
    so fp divergence between this pass and the kernel can never drop a
    reachable surface), test every surface's world bounding sphere, and
    compact the survivors into per-group index runs.

    Returns (period, NG+1+NSP) i32 rows:
      [0 : NG+1]  per-group candidate boundaries (prefix offsets)
      [NG+1 :  ]  candidate permuted-row indices, ascending (group
                  runs are contiguous because groups are contiguous
                  in permuted order)
    """
    NSP = struct.ns
    NG = len(struct.groups)
    nreal = sum(g.count for g in struct.groups)
    rows = period * sub
    ox, oy, oz, dx, dy, dz, tm = [t[:rows].reshape(period, sub * LANES)
                                  for t in tiles]
    w = tm < BIG

    def mn(a):
        return jnp.min(jnp.where(w, a, BIG), axis=1)

    def mx(a):
        return jnp.max(jnp.where(w, a, -BIG), axis=1)

    oxm, oxM = mn(ox), mx(ox)
    oym, oyM = mn(oy), mx(oy)
    ozm, ozM = mn(oz), mx(oz)
    c0 = jnp.stack([oxm + oxM, oym + oyM, ozm + ozM], -1) * 0.5
    r0 = 0.5 * jnp.sqrt((oxM - oxm) ** 2 + (oyM - oym) ** 2
                        + (ozM - ozm) ** 2)
    r0 = r0 * 1.0005 + 1e-4
    ilen = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30))
    dhx, dhy, dhz = dx * ilen, dy * ilen, dz * ilen
    sx = jnp.sum(jnp.where(w, dhx, 0.0), axis=1)
    sy = jnp.sum(jnp.where(w, dhy, 0.0), axis=1)
    sz = jnp.sum(jnp.where(w, dhz, 0.0), axis=1)
    an = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-30))
    ax, ay, az = sx * an, sy * an, sz * an
    cosmin = jnp.min(jnp.where(
        w, dhx * ax[:, None] + dhy * ay[:, None] + dhz * az[:, None],
        1.0), axis=1)
    # 3e-4 angular slack (vs the kernel guard's 1e-4): the candidate
    # set must be a superset of any runtime-guard decision
    cosw = jnp.clip(cosmin - 3e-4, -1.0, 1.0)
    sinw = jnp.sqrt(jnp.maximum(1.0 - cosw * cosw, 0.0))

    lc = ps.sp_f[None, :, 34:37] - c0[:, None, :]       # (period, NSP, 3)
    rs = jnp.sqrt(ps.sp_f[:, 37])[None, :]
    d = (lc[..., 0] * ax[:, None] + lc[..., 1] * ay[:, None]
         + lc[..., 2] * az[:, None])
    dist2 = jnp.sum(lc * lc, axis=-1)
    perp = jnp.sqrt(jnp.maximum(dist2 - d * d, 0.0))
    e = perp * cosw[:, None] - d * sinw[:, None]
    reach = ~(e > rs + r0[:, None] + 1e-3)
    bnd = jnp.asarray(np.array(struct.bnd, np.int32))[None, :]
    reach = reach | (bnd == 0)
    real = (jnp.arange(NSP, dtype=I32) < nreal)[None, :]
    reach = reach & real
    # a block with no active lanes has degenerate stats: keep everything
    reach = reach | ~jnp.any(w, axis=1)[:, None] & real
    # NaN anywhere in the stats must degrade to "reach"
    finite = jnp.isfinite(e)
    reach = reach | (~finite & real)

    ridx = jnp.arange(NSP, dtype=I32)[None, :]
    key = jnp.where(reach, ridx, ridx + NSP)
    order = jnp.argsort(key, axis=1).astype(I32)        # (period, NSP)
    pref = jnp.cumsum(reach.astype(I32), axis=1)
    starts = [g.start for g in struct.groups] + [nreal]
    bcols = [jnp.zeros((period,), I32) if s == 0 else pref[:, s - 1]
             for s in starts]
    bounds = jnp.stack(bcols, axis=1)                    # (period, NG+1)
    return jnp.concatenate([bounds, order], axis=1)


def _cand_period(struct: KernelStruct, cfg: TraceConfig, R: int,
                 period: int = 0, sub: int = SUB) -> int:
    """Static candidate-table period (0 = disabled): candidates need a
    many-surface scene, culling enabled, and an SMEM-sized table."""
    nreal = sum(g.count for g in struct.groups)
    if not (cfg.cull and cfg.cand and any(struct.bnd)
            and nreal > cfg.unroll):
        return 0
    if period <= 0:
        period = R // sub
    cw = len(struct.groups) + 1 + struct.ns
    if period * cw * 4 > 448 * 1024:   # SMEM budget
        return 0
    return period


_pack_jit = jax.jit(pack_scene, static_argnames=("struct",))

# packed-scene cache: packing costs ~1 ms of XLA gathers per call on TPU,
# so it must run once per SceneArrays, not once per frame (the per-frame
# reserve/release analog, system.h)
_get_packed = _SceneCache(_pack_jit)


def _scene_specs(ps: PackedScene, cull_on: bool, lsort_on: bool = False,
                 cont_on: bool = False, chunks: int = 1):
    """(extra input specs, extra scratch) shared by every dispatch:
    texture atlas + LUT (+ transposed sphere table, the SMEM umask
    scratch, the shadow-union scratch, and the double-buffered
    continuation-union scratch when culling). ``chunks`` = _n_chunks:
    the two-tier guard multiplies the umask / union scratch widths."""
    G = ps.tex_pk.shape[0]
    tex_spec = pl.BlockSpec((G, LANES), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    lut_spec = pl.BlockSpec((2, LANES), lambda i, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    specs = [tex_spec, lut_spec]
    scratch = []
    if cull_on:
        NSL = ps.bsph_t.shape[2]
        specs.append(pl.BlockSpec((4, 1, NSL),
                                  lambda i, *_: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
        nw = -(-NSL // 32)
        usz = (2 + chunks) * nw if chunks > 1 else nw
        scratch.append(pltpu.SMEM((usz,), I32))
    if lsort_on:
        scratch.append(pltpu.SMEM((ps.shad_msk.shape[1] * chunks,), I32))
    if cont_on:
        NW_ = -(-ps.bsph_t.shape[2] // 32)
        scratch.append(pltpu.SMEM((chunks * NW_,), I32))
        scratch.append(pltpu.SMEM((chunks * NW_,), I32))
    return specs, scratch


def _static_gates(struct: KernelStruct, cfg: TraceConfig,
                  pt: bool = False):
    """(cull_on, lsort_on, cont_on) — must mirror _make_kernel."""
    cull_on = cfg.cull and any(struct.bnd)
    nreal = sum(g.count for g in struct.groups)
    lsort_on = (cull_on and cfg.lsort and struct.nl > 0 and not pt
                and nreal > cfg.unroll)
    cont_on = (cull_on and cfg.lsort and not pt
               and not struct.can_push and nreal > cfg.unroll)
    return cull_on, lsort_on, cont_on


def _scene_args(ps: PackedScene, cull_on: bool):
    return ((ps.tex_pk, ps.tex_lut, ps.bsph_t) if cull_on
            else (ps.tex_pk, ps.tex_lut))


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret",
                                   "cand_period"))
def _trace_tiled(ps: PackedScene, ox, oy, oz, dx, dy, dz, tm,
                 struct: KernelStruct, cfg: TraceConfig, interpret: bool,
                 cand_period: int = 0):
    """Pallas dispatch on pre-tiled (R, 128) ray components; returns the
    three (R, 128) color component tiles. cand_period > 0 feeds the
    kernel per-block primary candidate lists built from the first
    cand_period blocks' rays (blocks repeat with that period, e.g. the
    bench's K concatenated identical frames)."""
    R = ox.shape[0]
    sub = cfg.sub
    assert R % sub == 0, f"ray tiles must pad to sub={sub} rows, got {R}"
    grid = R // sub
    cull_on, lsort_on, cont_on = _static_gates(struct, cfg)
    use_cand = _cand_period(struct, cfg, R, cand_period, sub)
    kern = _make_kernel(struct, cfg, use_cand=use_cand)
    # index_map receives the scalar-prefetch refs after the grid index
    ray_spec = pl.BlockSpec((sub, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    sc_specs, sc_scratch = _scene_specs(ps, cull_on, lsort_on, cont_on,
                                    _n_chunks(struct, cfg))
    npf = 6
    pre = []
    if lsort_on:
        pre.append(ps.shad_msk)
        npf += 1
    if cont_on:
        pre.append(ps.cont_msk)
        npf += 1
    if use_cand:
        tiles7 = (ox, oy, oz, dx, dy, dz, tm)
        pre.append(_build_candidates(ps, struct, tiles7, use_cand, sub))
        npf += 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(grid,),
        in_specs=[ray_spec] * 7 + sc_specs,
        out_specs=[ray_spec] * 3,
        scratch_shapes=_hit_scratch(sub) + sc_scratch,
    )
    out_shape = [jax.ShapeDtypeStruct((R, LANES), F32)] * 3
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.lg_f, ps.misc, *pre,
      ox, oy, oz, dx, dy, dz, tm, *_scene_args(ps, cull_on))


@partial(jax.jit, static_argnames=("struct", "cfg", "k_paths",
                                   "interpret"))
def _trace_tiled_paths(ps: PackedScene, ox, oy, oz, dx, dy, dz, tm,
                       struct: KernelStruct, cfg: TraceConfig,
                       k_paths: int, interpret: bool):
    """Colors + K per-segment path-record tiles (trace-replay autodiff).
    Segments are capped at K so every executed segment is recorded."""
    R = ox.shape[0]
    sub = cfg.sub
    grid = R // sub
    cull_on, lsort_on, cont_on = _static_gates(struct, cfg)
    use_cand = _cand_period(struct, cfg, R, sub=sub)
    cfgk = cfg._replace(max_segments=k_paths)
    kern = _make_kernel(struct, cfgk, emit_paths=k_paths,
                        use_cand=use_cand)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    sc_specs, sc_scratch = _scene_specs(ps, cull_on, lsort_on, cont_on,
                                    _n_chunks(struct, cfg))
    npf = 6
    pre = []
    if lsort_on:
        pre.append(ps.shad_msk)
        npf += 1
    if cont_on:
        pre.append(ps.cont_msk)
        npf += 1
    if use_cand:
        pre.append(_build_candidates(
            ps, struct, (ox, oy, oz, dx, dy, dz, tm), use_cand, sub))
        npf += 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(grid,),
        in_specs=[ray_spec] * 7 + sc_specs,
        out_specs=[ray_spec] * (3 + k_paths),
        scratch_shapes=_hit_scratch(sub) + sc_scratch
        + [pltpu.VMEM((k_paths, sub, LANES), I32)],
    )
    out_shape = ([jax.ShapeDtypeStruct((R, LANES), F32)] * 3
                 + [jax.ShapeDtypeStruct((R, LANES), I32)] * k_paths)
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.lg_f, ps.misc, *pre,
      ox, oy, oz, dx, dy, dz, tm, *_scene_args(ps, cull_on))


def trace_paths(sc: SceneArrays, org, dirs, t_min,
                cfg: TraceConfig = TraceConfig(), k_paths: int = 8,
                interpret: bool = False):
    """Kernel forward that also returns the per-lane path records:
    (colors (N, 3) f32, paths (K, N) i32). Single-branch scenes only
    (can_push falls back is NOT provided — callers gate on struct)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    struct = _get_struct(sc)
    assert not struct.can_push, "trace_paths requires single-branch scenes"
    ps = _get_packed(sc, struct)
    return _prep_and_trace_paths(ps, org, dirs, t_min, struct, cfg,
                                 k_paths, interpret)


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret"))
def _trace_tiled_pt(ps: PackedScene, ox, oy, oz, dx, dy, dz, tm, sd,
                    struct: KernelStruct, cfg: TraceConfig,
                    interpret: bool):
    """PT dispatch: colors + advanced seed tiles."""
    R = ox.shape[0]
    sub = cfg.sub
    grid = R // sub
    cull_on = cfg.cull and any(struct.bnd)
    use_cand = _cand_period(struct, cfg, R, sub=sub)
    kern = _make_kernel(struct, cfg, pt=True, use_cand=use_cand)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    sc_specs, sc_scratch = _scene_specs(ps, cull_on,
                                        chunks=_n_chunks(struct, cfg))
    npf = 6
    pre = []
    if use_cand:
        pre.append(_build_candidates(
            ps, struct, (ox, oy, oz, dx, dy, dz, tm), use_cand, sub))
        npf += 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(grid,),
        in_specs=[ray_spec] * 8 + sc_specs,
        out_specs=[ray_spec] * 4,
        scratch_shapes=_hit_scratch(sub) + sc_scratch,
    )
    out_shape = ([jax.ShapeDtypeStruct((R, LANES), F32)] * 3
                 + [jax.ShapeDtypeStruct((R, LANES), I32)])
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.lg_f, ps.misc, *pre,
      ox, oy, oz, dx, dy, dz, tm, sd, *_scene_args(ps, cull_on))


def trace_pt_pallas(sc: SceneArrays, org, dirs, t_min, seeds,
                    cfg: TraceConfig = TraceConfig(),
                    interpret: bool = False):
    """One path-traced sample per lane through the megakernel's PT mode
    (same signature/semantics as ops.pt.trace_pt): returns
    (radiance (N, 3), advanced seeds)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    struct = _get_struct(sc)
    ps = _get_packed(sc, struct)
    return _prep_and_trace_pt(ps, org, dirs, t_min, seeds, struct, cfg,
                              interpret)


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret"))
def _prep_and_trace_pt(ps: PackedScene, org, dirs, t_min, seeds,
                       struct: KernelStruct, cfg: TraceConfig,
                       interpret: bool):
    N = dirs.shape[0]
    block = cfg.sub * LANES
    npad = ((N + block - 1) // block) * block
    pad = npad - N
    orgT = org.T
    dirsT = dirs.T

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // LANES, LANES)

    sd_i32 = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    tiles = ([prep(orgT[i]) for i in range(3)]
             + [prep(dirsT[i], 1.0) for i in range(3)]
             + [prep(t_min.astype(F32), BIG), prep(sd_i32, 0)])
    cr, cg, cb, sdo = _trace_tiled_pt(ps, *tiles, struct=struct, cfg=cfg,
                                      interpret=interpret)
    cols = jnp.stack([cr.reshape(-1), cg.reshape(-1), cb.reshape(-1)],
                     axis=-1)[:N]
    seeds_out = jax.lax.bitcast_convert_type(
        sdo.reshape(-1)[:N], jnp.uint32)
    return cols, seeds_out


@partial(jax.jit, static_argnames=("width", "height", "spp", "struct",
                                   "cfg", "interpret"))
def _pt_accum_impl(ps: PackedScene, cam, seed_tiles, width, height, spp,
                   struct: KernelStruct, cfg: TraceConfig,
                   interpret: bool):
    """spp progressive PT passes fused in one jit: tiled SoA jittered
    ray gen (pt_camera_rays semantics: two tent-filter draws per pixel
    per pass, then the in-kernel draws) chained through the seed tiles,
    radiance accumulated on device."""
    cam_pos, cam_hor, cam_ver, cam_nrm, cam_pov = cam
    n = width * height
    R = seed_tiles.shape[0]
    idx = (jax.lax.broadcasted_iota(I32, (R, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(I32, (R, LANES), 1))
    valid = idx < n
    xs = (idx % width).astype(F32)
    ys = (idx // width).astype(F32)
    factor = 1.0 / width
    aspect = height / width
    lcg_a = jnp.int32(214013)
    lcg_c = jnp.int32(2531011)

    def lcg_u(s):
        s = s * lcg_a + lcg_c
        return s, (jax.lax.shift_right_logical(s, 8).astype(F32)
                   * (1.0 / 16777216.0))

    def tent(u):
        r = 2.0 * u
        return jnp.where(r < 1.0,
                         jnp.sqrt(jnp.maximum(r, 1e-12)) - 1.0,
                         1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 1e-12)))

    shape = (R, LANES)
    orgt = [jnp.full(shape, cam_pos[c], F32) for c in range(3)]
    tmn = jnp.where(valid, jnp.full(shape, cam_pov, F32), BIG)

    def body(_, carry):
        acc_r, acc_g, acc_b, seeds = carry
        s, ux = lcg_u(seeds)
        s, uy = lcg_u(s)
        jx = tent(ux) * 0.5
        jy = tent(uy) * 0.5
        u = (xs + 0.5 + jx) * factor - 0.5
        v = (ys + 0.5 + jy) * factor - 0.5 * aspect
        dt = [cam_nrm[c] * cam_pov + cam_hor[c] * u + cam_ver[c] * v
              for c in range(3)]
        cr, cg, cb, sdo = _trace_tiled_pt(
            ps, *orgt, *dt, tmn, s, struct=struct, cfg=cfg,
            interpret=interpret)
        return acc_r + cr, acc_g + cg, acc_b + cb, sdo

    z = jnp.zeros(shape, F32)
    return jax.lax.fori_loop(0, spp, body, (z, z, z, seed_tiles))


def render_pt_pallas(sc: SceneArrays, width: int, height: int, seeds,
                     spp: int, cfg: TraceConfig = TraceConfig(),
                     interpret: bool = False):
    """Progressive path-traced render, fully in-kernel: spp 1-sample
    passes accumulated on device (one dispatch). Returns
    ((H, W, 3) mean radiance, advanced (n,) seeds)."""
    struct = _get_struct(sc)
    ps = _get_packed(sc, struct)
    n = width * height
    block = cfg.sub * LANES
    npad = ((n + block - 1) // block) * block
    sd = jax.lax.bitcast_convert_type(seeds, jnp.int32)
    if npad != n:
        sd = jnp.concatenate([sd, jnp.zeros((npad - n,), jnp.int32)])
    sd = sd.reshape(npad // LANES, LANES)
    cam = (sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm, sc.cam_pov)
    ar, ag, ab, sdo = _pt_accum_impl(ps, cam, sd, width, height, spp,
                                     struct, cfg, interpret)
    img = jnp.stack([c.reshape(-1)[:n] for c in (ar, ag, ab)],
                    axis=-1) / float(spp)
    seeds_out = jax.lax.bitcast_convert_type(
        sdo.reshape(-1)[:n], jnp.uint32)
    return img.reshape(height, width, 3), seeds_out


def trace_paths_with_struct(sc: SceneArrays, struct: KernelStruct, org,
                            dirs, t_min, cfg: TraceConfig = TraceConfig(),
                            k_paths: int = 8, interpret: bool = False):
    """trace_paths for callers holding a pre-extracted KernelStruct —
    fully jit-traceable in ``sc`` (the training loop re-packs the scene
    from updated parameters every step)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    ps = pack_scene(sc, struct)
    return _prep_and_trace_paths(ps, org, dirs, t_min, struct, cfg,
                                 k_paths, interpret)


@partial(jax.jit, static_argnames=("struct", "cfg", "k_paths",
                                   "interpret"))
def _prep_and_trace_paths(ps: PackedScene, org, dirs, t_min,
                          struct: KernelStruct, cfg: TraceConfig,
                          k_paths: int, interpret: bool):
    N = dirs.shape[0]
    block = cfg.sub * LANES
    npad = ((N + block - 1) // block) * block
    pad = npad - N
    orgT = org.T
    dirsT = dirs.T

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // LANES, LANES)

    tiles = ([prep(orgT[i]) for i in range(3)]
             + [prep(dirsT[i], 1.0) for i in range(3)]
             + [prep(t_min.astype(F32), BIG)])
    outs = _trace_tiled_paths(ps, *tiles, struct=struct, cfg=cfg,
                              k_paths=k_paths, interpret=interpret)
    cr, cg, cb = outs[:3]
    cols = jnp.stack([cr.reshape(-1), cg.reshape(-1), cb.reshape(-1)],
                     axis=-1)[:N]
    paths = jnp.stack([p.reshape(-1)[:N] for p in outs[3:]], axis=0)
    return cols, paths


_STATE_I32 = (3, 4, 5, 6, 10)   # depth, osrf, oside, thru, active slots
# state tile order: thr r/g/b, depth, osrf, oside, thru, oloc x/y/z,
# active, acc r/g/b


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret",
                                   "cand_period"))
def _trace_tiled_emit(ps: PackedScene, ox, oy, oz, dx, dy, dz, tm,
                      struct: KernelStruct, cfg: TraceConfig,
                      interpret: bool, cand_period: int = 0):
    """Round-1 dispatch: colors + the 18-tile resumable ray state."""
    R = ox.shape[0]
    sub = cfg.sub
    grid = R // sub
    cull_on, lsort_on, cont_on = _static_gates(struct, cfg)
    use_cand = _cand_period(struct, cfg, R, cand_period, sub)
    kern = _make_kernel(struct, cfg, emit_state=True, use_cand=use_cand)
    ray_spec = pl.BlockSpec((sub, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    sc_specs, sc_scratch = _scene_specs(ps, cull_on, lsort_on, cont_on,
                                    _n_chunks(struct, cfg))
    npf = 6
    pre = []
    if lsort_on:
        pre.append(ps.shad_msk)
        npf += 1
    if cont_on:
        pre.append(ps.cont_msk)
        npf += 1
    if use_cand:
        pre.append(_build_candidates(
            ps, struct, (ox, oy, oz, dx, dy, dz, tm), use_cand, sub))
        npf += 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(grid,),
        in_specs=[ray_spec] * 7 + sc_specs,
        out_specs=[ray_spec] * 24,
        scratch_shapes=_hit_scratch(sub) + sc_scratch,
    )
    f32s = jax.ShapeDtypeStruct((R, LANES), F32)
    i32s = jax.ShapeDtypeStruct((R, LANES), I32)
    # colors 3 + state 21: ox..tmn(7 f32), thr(3 f32), depth/osrf/oside/
    # thru(4 i32), oloc(3 f32), active(1 i32), acc rgb(3 f32)
    out_shape = ([f32s] * 3 + [f32s] * 7 + [f32s] * 3 + [i32s] * 4
                 + [f32s] * 3 + [i32s] + [f32s] * 3)
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.lg_f, ps.misc, *pre,
      ox, oy, oz, dx, dy, dz, tm, *_scene_args(ps, cull_on))


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret", "sub"))
def _trace_tiled_resume(ps: PackedScene, state, blist, n_blocks,
                        struct: KernelStruct, cfg: TraceConfig,
                        interpret: bool, sub: int = SUB):
    """Round-2 dispatch: resume IN PLACE over only the blocks that still
    have active lanes — `blist` (scalar-prefetch) maps dynamic grid step
    i to HBM block blist[i], so no ray data moves; retired blocks are
    simply never visited. `sub` can be smaller than the emit round's
    block height: the SAME buffers are just re-tiled into finer blocks,
    giving 64/sub-times finer retirement granularity for the deep tail."""
    R = state[0].shape[0]
    cull_on, lsort_on, cont_on = _static_gates(struct, cfg)
    kern = _make_kernel(struct, cfg, resume=True)
    # blist is always the LAST scalar-prefetch operand
    ray_spec = pl.BlockSpec(
        (sub, LANES),
        lambda i, *pf: (pf[-1][i], 0),
        memory_space=pltpu.VMEM)
    # resume kernels are single-tier (see _make_kernel): chunks=1
    sc_specs, sc_scratch = _scene_specs(ps, cull_on, lsort_on, cont_on)
    out_shape = [jax.ShapeDtypeStruct((R, LANES), F32)] * 3
    # input order must match kernel signature: 7 primary tiles, tex, lut
    # (+ sphere table), then the 14 resume tiles; blist rides as the 7th
    # prefetch operand
    ins = state[:7] + _scene_args(ps, cull_on) + state[7:]
    pre = ((ps.shad_msk,) if lsort_on else ()) + (
        (ps.cont_msk,) if cont_on else ())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7 + len(pre),
        grid=(n_blocks,),
        in_specs=[ray_spec] * 7 + sc_specs + [ray_spec] * 14,
        out_specs=[ray_spec] * 3,
        scratch_shapes=_hit_scratch(sub) + sc_scratch,
    )
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec,
        interpret=interpret,
    )(ps.sp_f, ps.sp_i, ps.cl_f, ps.mat_f, ps.lg_f, ps.misc, *pre,
      blist, *ins)


@partial(jax.jit, static_argnames=("struct", "cfg", "k1", "interpret",
                                   "sub2"))
def _trace_rounds_impl(ps, ox, oy, oz, dx, dy, dz, tm,
                       struct: KernelStruct, cfg: TraceConfig, k1: int,
                       interpret: bool, sub2: int = SUB):
    cfg1 = cfg._replace(max_segments=k1)
    cfg2 = cfg._replace(max_segments=cfg.max_segments - k1)
    outs = _trace_tiled_emit(ps, ox, oy, oz, dx, dy, dz, tm,
                             struct=struct, cfg=cfg1, interpret=interpret)
    cr1, cg1, cb1 = outs[:3]
    state = outs[3:]
    R = cr1.shape[0]
    nb = R // sub2
    # per-(finer-)block any-active flags -> packed block list
    # (deterministic: ascending block order)
    blk_act = (state[17].reshape(nb, sub2 * LANES).max(axis=1)) != 0
    blist = jnp.nonzero(blk_act, size=nb, fill_value=0)[0].astype(I32)
    n_blocks = jnp.maximum(jnp.sum(blk_act.astype(I32)), 1)
    cr2, cg2, cb2 = _trace_tiled_resume(ps, state, blist, n_blocks,
                                        struct=struct, cfg=cfg2,
                                        interpret=interpret, sub=sub2)
    # visited rows carry the CONTINUED accumulation (the resume state
    # now includes the color accumulators, so the multi-round sum is
    # the same f32 addition chain as the monolithic kernel); unvisited
    # blocks hold garbage -> keep round-1 colors
    rowmask = jnp.repeat(blk_act, sub2)[:, None]   # (R, 1)

    def merge(c1, c2):
        return jnp.where(rowmask, c2, c1)

    return merge(cr1, cr2), merge(cg1, cg2), merge(cb1, cb2)


@partial(jax.jit, static_argnames=("struct", "cfg", "k1", "sub2",
                                   "interpret", "cand_period"))
def _trace_wavefront_impl(ps: PackedScene, ox, oy, oz, dx, dy, dz, tm,
                          struct: KernelStruct, cfg: TraceConfig,
                          k1: int, sub2: int, interpret: bool,
                          cand_period: int = 0):
    """Wavefront tracing: primary round + ROW-compacted secondary round.

    The reference culls secondary rays per 4-16-ray packet (AR_ptr
    bounding-sphere skip, tracer.cpp:3953-4056) — tiny packets keep
    bundle tests effective even for divergent rays. Our block is 8,192
    rays, and measurement shows deep scenes keep whole blocks alive with
    rays from a handful of originating surfaces mixed together, so the
    block bundle cone goes wide and the reach guards stop firing. This
    driver restores packet-like coherence by SORTING between rounds:

      1. round 1 renders k1 segments with per-block candidate lists and
         emits the resumable ray state;
      2. the 128-lane state ROWS are sorted by (any-lane-active,
         max active originating surface) — a ~R-key sort + contiguous
         512 B row gathers, O(ms) of XLA work, no Pallas involvement;
      3. round 2 resumes over ceil(active_rows / sub2) DENSE blocks
         (dynamic grid): each block now holds rays that mostly share an
         originating surface, so its bundle cone is tight again, the
         reach bitmask fires, and fully-retired rows are never visited;
      4. round-2 colors are un-permuted and added to round 1's.

    This is the scheduler the reference spreads across ssort/lsort/
    tilebuffer, recast as sort-compact-resume — the idiomatic TPU form.
    """
    cfg1 = cfg._replace(max_segments=min(k1, cfg.max_segments))
    cfg2 = cfg._replace(max_segments=cfg.max_segments - cfg1.max_segments)
    outs = _trace_tiled_emit(ps, ox, oy, oz, dx, dy, dz, tm,
                             struct=struct, cfg=cfg1, interpret=interpret,
                             cand_period=cand_period)
    cr1, cg1, cb1 = outs[:3]
    state = outs[3:]
    if cfg2.max_segments <= 0:
        return cr1, cg1, cb1
    R = cr1.shape[0]
    active = state[17]                       # (R, 128) i32
    osrf = state[11]
    row_act = jnp.any(active != 0, axis=1)
    # compact by ACTIVITY only (stable: surviving rows keep screen
    # order). Grouping rows by originating surface was measured WORSE —
    # it scatters ray origins across the frame, so the resumed blocks'
    # origin boxes blow up and the reach guards stop firing; screen
    # order preserves both origin and direction locality.
    del osrf
    row_key = jnp.where(row_act, 0, 1).astype(I32)
    rowperm = jnp.argsort(row_key, stable=True).astype(I32)
    n_rows = jnp.sum(row_act.astype(I32))
    n_blocks = jnp.maximum(-(-n_rows // sub2), 1)
    stateg = tuple(a[rowperm] for a in state)
    blist = jnp.arange(R // sub2, dtype=I32)
    cr2, cg2, cb2 = _trace_tiled_resume(ps, stateg, blist, n_blocks,
                                        struct=struct, cfg=cfg2,
                                        interpret=interpret, sub=sub2)
    # visited rows carry the CONTINUED accumulation (the resume state
    # includes the color accumulators: same f32 addition chain as the
    # monolithic kernel, bitwise); unvisited rows hold garbage -> keep
    # round-1 colors
    valid = (jnp.arange(R, dtype=I32) < n_blocks * sub2)[:, None]
    inv = jnp.argsort(rowperm).astype(I32)

    def merge(c1, c2):
        return jnp.where(valid[inv], c2[inv], c1)

    return merge(cr1, cr2), merge(cg1, cg2), merge(cb1, cb2)


@partial(jax.jit, static_argnames=("struct", "cfg", "interpret"))
def _prep_and_trace(ps: PackedScene, org, dirs, t_min,
                    struct: KernelStruct, cfg: TraceConfig,
                    interpret: bool):
    N = dirs.shape[0]
    block = cfg.sub * LANES
    npad = ((N + block - 1) // block) * block
    pad = npad - N
    orgT = org.T        # one contiguous transpose beats 3 strided slices
    dirsT = dirs.T

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // LANES, LANES)

    tiles = ([prep(orgT[i]) for i in range(3)]
             + [prep(dirsT[i], 1.0) for i in range(3)]
             + [prep(t_min.astype(F32), BIG)])
    cr, cg, cb = _trace_tiled(ps, *tiles, struct=struct, cfg=cfg,
                              interpret=interpret)
    cols = jnp.stack([cr.reshape(-1), cg.reshape(-1), cb.reshape(-1)],
                     axis=-1)
    return cols[:N]


def trace_rays_pallas(sc: SceneArrays, org, dirs, t_min,
                      cfg: TraceConfig = TraceConfig(),
                      interpret: bool = False):
    """Pallas megakernel entry: same signature/semantics as
    ops.trace.trace_rays. Rays are padded to BLOCK (padding rays get
    t_min = BIG so they never hit)."""
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    struct = _get_struct(sc)
    ps = _get_packed(sc, struct)
    return _prep_and_trace(ps, org, dirs, t_min, struct, cfg, interpret)


def trace_rays_pallas_rounds(sc: SceneArrays, org, dirs, t_min,
                             cfg: TraceConfig = TraceConfig(),
                             k1: int = 4, interpret: bool = False):
    """Two-round compacted tracing for deep single-branch scenes: round 1
    runs the megakernel for k1 segments over all rays and emits the
    resumable ray state; survivors (the deep tail) are compacted to the
    front and round 2 finishes them with a DYNAMIC Pallas grid sized to
    the survivor count — per-lane retirement at round granularity (the
    measured 1.7-3.4x non-retirement waste on demo03/test13). Falls back
    to the monolithic kernel for branch-stack (can_push) scenes."""
    struct = _get_struct(sc)
    if struct.can_push:
        return trace_rays_pallas(sc, org, dirs, t_min, cfg, interpret)
    N = dirs.shape[0]
    if org.ndim == 1:
        org = jnp.broadcast_to(org[None, :], (N, 3))
    ps = _get_packed(sc, struct)
    return _prep_and_trace_rounds(ps, org, dirs, t_min, struct, cfg, k1,
                                  interpret)


@partial(jax.jit, static_argnames=("struct", "cfg", "k1", "interpret"))
def _prep_and_trace_rounds(ps: PackedScene, org, dirs, t_min,
                           struct: KernelStruct, cfg: TraceConfig,
                           k1: int, interpret: bool):
    N = dirs.shape[0]
    block = cfg.sub * LANES
    npad = ((N + block - 1) // block) * block
    pad = npad - N
    orgT = org.T
    dirsT = dirs.T

    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(npad // LANES, LANES)

    tiles = ([prep(orgT[i]) for i in range(3)]
             + [prep(dirsT[i], 1.0) for i in range(3)]
             + [prep(t_min.astype(F32), BIG)])
    cr, cg, cb = _trace_rounds_impl(ps, *tiles, struct=struct, cfg=cfg,
                                    k1=k1, interpret=interpret)
    cols = jnp.stack([cr.reshape(-1), cg.reshape(-1), cb.reshape(-1)],
                     axis=-1)
    return cols[:N]


ROUNDS_K1 = 4     # product-path round-1 segment budget
ROUNDS_SUB2 = 8   # product-path round-2 retirement granularity (rows)

WAVE_K1 = 1       # wavefront round-1 segment budget (primary only)
WAVE_SUB2 = 8     # wavefront round-2 block height (rows)
WAVE_MIN_NS = 32  # wavefront pays off on many-surface scenes only


def use_wavefront(struct: KernelStruct, cfg: TraceConfig) -> bool:
    """Product-path heuristic for sort-compacted wavefront tracing.

    Measured OFF (round 5): with the lsort shadow masks + commit gating
    + the no-Fresnel TIR fix in the monolithic kernel, the wavefront
    rounds LOSE on every target scene (test13 14.1 vs 9.0 ms, demo03
    31.7 vs 15.2 — r5 logs): the boundary sort itself is cheap
    (~0.09 ms/frame) but round 2 re-pays per-block fixed costs over
    mostly-still-active rows (demo03 keeps 90% of rows active after the
    primary segment), and grouping rows by originating surface scatters
    ray origins so the reach guards fire LESS. The machinery stays
    (_trace_wavefront_impl, bitwise-identical by construction) for
    workloads with sparse deep tails."""
    del struct, cfg
    return False


def use_rounds(struct: KernelStruct) -> bool:
    """Product-path heuristic for the two-round in-place retirement.

    Measured OFF (round 4): with block culling in the kernel, the
    retirement rounds LOSE on every deep scene (demo03 59 vs 33 ms,
    test13 14.0 vs 12.3, test14 19.0 vs 18.9 — r4 logs): round-1 must
    write the 18-tile resumable ray state and round-2 re-reads it, and
    the survivors of any workable k1 are scattered across most blocks
    (41-100% of sub2=8 blocks hold at least one deep lane), so almost
    no block retires while the state IO is paid on all of them. The
    monolithic kernel's per-block while-loop early-exit plus
    bounding-sphere culling is strictly faster. The machinery stays
    (trace_rays_pallas_rounds) for workloads with clustered deep tails.
    """
    del struct
    return False


def trace_tiles(ps: PackedScene, tiles, struct: KernelStruct,
                cfg: TraceConfig, interpret: bool = False,
                cand_period: int = 0):
    """Dispatch pre-tiled rays through the product trace path: the
    monolithic megakernel (always — the two-round retirement machinery
    measured slower and is retained only via trace_rays_pallas_rounds;
    see use_rounds) with per-block primary candidate lists when the
    scene is large enough (_cand_period). render_pallas and bench.py
    both go through it. ``cand_period`` overrides the candidate-table
    period for dispatches whose blocks repeat (e.g. K concatenated
    identical frames)."""
    if use_rounds(struct):
        return _trace_rounds_impl(ps, *tiles, struct=struct, cfg=cfg,
                                  k1=ROUNDS_K1, interpret=interpret,
                                  sub2=ROUNDS_SUB2)
    if use_wavefront(struct, cfg):
        return _trace_wavefront_impl(ps, *tiles, struct=struct, cfg=cfg,
                                     k1=WAVE_K1, sub2=WAVE_SUB2,
                                     interpret=interpret,
                                     cand_period=cand_period)
    return _trace_tiled(ps, *tiles, struct=struct, cfg=cfg,
                        interpret=interpret, cand_period=cand_period)


@partial(jax.jit, static_argnames=("width", "height", "fsaa", "struct",
                                   "cfg", "interpret"))
def _render_impl(ps: PackedScene, cam, width, height, fsaa,
                 struct: KernelStruct, cfg: TraceConfig, interpret: bool):
    from quadray_tpu.ops.rays import camera_rays_tiles2d, untile_frame
    cam_pos, cam_hor, cam_ver, cam_nrm, cam_pov = cam
    tiles = camera_rays_tiles2d(cam_pos, cam_hor, cam_ver, cam_nrm,
                                cam_pov, width, height, fsaa,
                                cfg.sub * LANES)
    cr, cg, cb = trace_tiles(ps, tiles, struct, cfg, interpret)
    comps = [untile_frame(c, width, height, fsaa, cfg.sub * LANES)
             for c in (cr, cg, cb)]
    return jnp.stack(comps, axis=-1)


def render_pallas(sc: SceneArrays, width: int, height: int, fsaa: int = 1,
                  cfg: TraceConfig = TraceConfig(),
                  interpret: bool = False, struct: KernelStruct = None):
    """Full-frame fast path: tiled ray gen -> megakernel -> (H, W, 3)
    linear image, all in one jit (no per-frame scene packing, no (N, 3)
    layout round-trips). Every scene feature is kernel-supported; the
    monolithic megakernel is always used (the rounds machinery is
    retained only via trace_rays_pallas_rounds — see use_rounds), with
    per-block primary candidate lists on many-surface scenes. `struct`
    lets callers with per-frame animated SceneArrays reuse the
    time-invariant kernel structure without a device round-trip."""
    struct = struct or _get_struct(sc)
    ps = _get_packed(sc, struct)
    cam = (sc.cam_pos, sc.cam_hor, sc.cam_ver, sc.cam_nrm, sc.cam_pov)
    return _render_impl(ps, cam, width, height, fsaa, struct, cfg,
                        interpret)
