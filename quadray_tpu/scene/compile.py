"""Scene compiler: hierarchy -> flat static-shaped SoA device arrays.

Replaces the reference's per-frame update pipeline (engine.cpp:2976-3332
phases 0.5-3 + object.cpp update_fields/commit_fields) with a single
host-side pass producing a pytree of jnp arrays that the tracer kernels
consume. Differences from the reference, by design (TPU-first):

  * every surface gets one uniform representation: a canonical unit-shape
    implicit ``F(p) = sum(sci*p^2) - 2*sum(scjh*p) - sciw`` plus a full
    affine world->canonical transform (pos + 3x3 linear). This subsumes the
    reference's axis-mapping/sign fastpaths, per-axis scale folding
    (object.cpp:3034-3063) and trnode transform caching — dense 3x3 math is
    effectively free on the TPU VPU and keeps everything differentiable.
  * per-surface lists (clippers with boolean accum markers,
    object.cpp:2382-2454 + engine.cpp:1821-1950) become fixed-width padded
    index arrays (clip programs) evaluated data-parallel.
  * the tilebuffer / sorted-list culling layer (engine.cpp ssort/lsort/
    stile) becomes per-surface world bounding spheres (s_bnd/s_bsph,
    derived from each shape's intrinsic extent ∩ axis clips — the
    rt_Array/adjust_minmax bounds semantics, object.cpp:1830-2320,
    2508-2799); the kernel culls whole ray blocks against them at
    trace time (the AR_ptr skip analog), gated by the tiling opt flag.

All numeric math uses jnp so gradients flow from pixels back to transforms,
shape parameters, materials and lights (inverse rendering).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np

from quadray_tpu.scene import schema as S

F32 = jnp.float32
I32 = jnp.int32

# material property bits (analog of RT_PROP_*, tracer.h)
PROP_LIGHT = 1 << 0      # emissive, unshaded (RT_MAT_LIGHT)
PROP_METAL = 1 << 1      # metal specular blending (RT_MAT_METAL)
PROP_OPAQUE = 1 << 2     # trn == 0
PROP_REFLECT = 1 << 3    # rfl != 0
PROP_REFRACT = 1 << 4    # rfr != 1
PROP_DIFFUSE = 1 << 5
PROP_SPECULAR = 1 << 6
PROP_TEXTURE = 1 << 7
PROP_GAMMA = 1 << 8
PROP_FRESNEL = 1 << 9
PROP_TRANSP = 1 << 10    # trn == 1

# clip program opcodes
CLIP_NONE = 0
CLIP_SURF = 1      # AND with clipper keep-mask
CLIP_ENTER = 2     # open accumulator segment (tracer.cpp:1953-1959)
CLIP_LEAVE = 3     # close segment: mask = saved & ~segment (tracer.cpp:1961-1964)


@chex.dataclass(frozen=True)
class SceneArrays:
    """Flat SoA scene, static shapes; the device-side scene representation."""

    # surfaces, padded to NS
    s_tag: jnp.ndarray     # (NS,) i32 surface tag, -1 = pad
    s_kind: jnp.ndarray    # (NS,) i32 0=pad 1=plane 2=quadric 3=two-plane
    s_sing: jnp.ndarray    # (NS,) i32 conic-singularity flag (msc_p[1],
    # update0 tracer.cpp:5801-5807): 1=cone-like apex, 2=deg. hypercylinder
    s_pos: jnp.ndarray     # (NS,3) world position of local origin
    s_inv: jnp.ndarray     # (NS,3,3) world->canonical linear map
    s_fwd: jnp.ndarray     # (NS,3,3) canonical->world linear map
    s_sci: jnp.ndarray     # (NS,3) quadratic coeffs
    s_scjh: jnp.ndarray    # (NS,3) halved linear coeffs
    s_sciw: jnp.ndarray    # (NS,) constant coeff
    s_cmin: jnp.ndarray    # (NS,3) canonical axis clip min
    s_cmax: jnp.ndarray    # (NS,3) canonical axis clip max
    s_mat: jnp.ndarray     # (NS,2) i32 material index (outer, inner)
    # bounding volumes (culling layer; rt_Array bounds semantics,
    # object.cpp:1830-2320 + per-shape adjust_minmax object.cpp:2508-2799)
    s_bnd: jnp.ndarray     # (NS,) i32 1 = finite world bounding sphere
    s_bsph: jnp.ndarray    # (NS,4) f32 world bounding sphere cx cy cz r2
    s_emis: jnp.ndarray    # (NS,2,3) per-side PT emission radiance
    # (accumulated sibling-light color * 100, object.cpp:1333-1374)
    # clip programs, padded to (NS, NC)
    c_op: jnp.ndarray      # (NS,NC) i32 opcode
    c_ref: jnp.ndarray     # (NS,NC) i32 clipper surface index
    c_side: jnp.ndarray    # (NS,NC) f32 +1 remove-outer / -1 remove-inner
    # materials, padded to NM
    m_props: jnp.ndarray   # (NM,) i32
    m_col: jnp.ndarray     # (NM,3) plain color (linear 0..1)
    m_dff: jnp.ndarray     # (NM,)
    m_spc: jnp.ndarray     # (NM,)
    m_pow: jnp.ndarray     # (NM,) specular power (float; reference 28.4 fx)
    m_rfl: jnp.ndarray     # (NM,)
    m_trn: jnp.ndarray     # (NM,)
    m_rfr: jnp.ndarray     # (NM,) refraction index ratio
    m_ext: jnp.ndarray     # (NM,) extinction (metal Fresnel)
    m_tex_base: jnp.ndarray   # (NM,) i32 offset into tex_data, -1 = none
    m_tex_xmask: jnp.ndarray  # (NM,) i32 width-1
    m_tex_ymask: jnp.ndarray  # (NM,) i32 height-1
    m_tex_xshift: jnp.ndarray  # (NM,) i32 log2(width)
    m_tex_scl: jnp.ndarray    # (NM,2) texel scale (x_dim/sd.scl)
    m_tex_off: jnp.ndarray    # (NM,2) uv offset (sd.pos)
    tex_data: jnp.ndarray     # (T,3) f32 texture atlas
    # lights, padded to NL
    l_pos: jnp.ndarray     # (NL,3)
    l_col: jnp.ndarray     # (NL,3) color * src intensity
    l_cnt: jnp.ndarray     # (NL,) attenuation constant
    l_lnr: jnp.ndarray     # (NL,)
    l_qdr: jnp.ndarray     # (NL,)
    l_on: jnp.ndarray      # (NL,) f32 1.0 active / 0.0 pad
    # camera
    cam_pos: jnp.ndarray   # (3,)
    cam_hor: jnp.ndarray   # (3,)
    cam_ver: jnp.ndarray   # (3,)
    cam_nrm: jnp.ndarray   # (3,)
    cam_pov: jnp.ndarray   # ()
    amb_col: jnp.ndarray   # (3,) accumulated ambient (engine.cpp:3262-3272)
    # feature toggles derived from SceneDef.opts (inverted flags,
    # format.h:59-62): 1.0 = enabled
    use_gamma: jnp.ndarray    # ()
    use_fresnel: jnp.ndarray  # ()


def _deg2rad(x):
    return x * (math.pi / 180.0)


def transform_matrix(trm: S.Transform3D):
    """4x4 world-from-local: T . Rz . Ry . Rx . Scl on column vectors
    (matches rtgeom.cpp:102-163 composition; angles in degrees)."""
    sx, sy, sz = [jnp.asarray(v, F32) for v in trm.scl]
    ax, ay, az = [_deg2rad(jnp.asarray(v, F32)) for v in trm.rot]
    px, py, pz = [jnp.asarray(v, F32) for v in trm.pos]
    cx, sxn = jnp.cos(ax), jnp.sin(ax)
    cy, syn = jnp.cos(ay), jnp.sin(ay)
    cz, szn = jnp.cos(az), jnp.sin(az)
    one = jnp.asarray(1.0, F32)
    zero = jnp.asarray(0.0, F32)
    rx = jnp.stack([
        jnp.stack([one, zero, zero]),
        jnp.stack([zero, cx, -sxn]),
        jnp.stack([zero, sxn, cx])])
    ry = jnp.stack([
        jnp.stack([cy, zero, syn]),
        jnp.stack([zero, one, zero]),
        jnp.stack([-syn, zero, cy])])
    rz = jnp.stack([
        jnp.stack([cz, -szn, zero]),
        jnp.stack([szn, cz, zero]),
        jnp.stack([zero, zero, one])])
    scl = jnp.diag(jnp.stack([sx, sy, sz]))
    # full-precision matmuls: XLA:TPU's default would use bf16 MXU passes
    # and corrupt the world->canonical transforms (see ops/trace.py P_HI)
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    lin = mm(mm(mm(rz, ry), rx), scl)
    m = jnp.zeros((4, 4), F32)
    m = m.at[:3, :3].set(lin)
    m = m.at[:3, 3].set(jnp.stack([px, py, pz]))
    m = m.at[3, 3].set(1.0)
    return m


def _inv3(m):
    """Closed-form 3x3 inverse (adjugate/det). Elementwise only: keeps the
    scene compile off the MXU so TPU runs get full fp32 (matches the
    reference's matrix_inverse, rtgeom.cpp:167)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = f * g - d * i
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, c * h - b * i, b * f - c * e]),
        jnp.stack([B, a * i - c * g, c * d - a * f]),
        jnp.stack([C, b * g - a * h, a * e - b * d])])
    return adj / det


def quadric_coeffs(srf: S.Surface):
    """Canonical unit-frame implicit coefficients per surface tag.

    F(p) = sci.p^2 - 2*scjh.p - sciw  (outer side F > 0), following the
    shape tables in object.cpp (Cylinder:3120-3133, Sphere:3215-3227,
    Cone:3336-3349, Paraboloid:3444-3458, Hyperboloid:3563-3577,
    ParaCylinder:3673-3688, HyperCylinder:3790-3805,
    HyperParaboloid:3896-3911) without the per-axis scale folding
    (commit_fields, object.cpp:3034-3063) — scale lives in the affine
    world->canonical matrix instead.
    """
    t = srf.tag
    f = lambda v: jnp.asarray(v, F32)
    zero = f(0.0)
    if t == S.TAG_PLANE:
        sci = jnp.stack([zero, zero, zero])
        scjh = jnp.stack([zero, zero, zero])
        sciw = zero
    elif t == S.TAG_CYLINDER:
        sci = jnp.stack([f(1.0), f(1.0), zero])
        scjh = jnp.stack([zero, zero, zero])
        sciw = f(srf.rad) * f(srf.rad)
    elif t == S.TAG_SPHERE:
        sci = jnp.stack([f(1.0), f(1.0), f(1.0)])
        scjh = jnp.stack([zero, zero, zero])
        sciw = f(srf.rad) * f(srf.rad)
    elif t == S.TAG_CONE:
        sci = jnp.stack([f(1.0), f(1.0), -f(srf.rat) * f(srf.rat)])
        scjh = jnp.stack([zero, zero, zero])
        sciw = zero
    elif t == S.TAG_PARABOLOID:
        sci = jnp.stack([f(1.0), f(1.0), zero])
        scjh = jnp.stack([zero, zero, f(srf.par) * 0.5])
        sciw = zero
    elif t == S.TAG_HYPERBOLOID:
        sci = jnp.stack([f(1.0), f(1.0), -f(srf.rat) * f(srf.rat)])
        scjh = jnp.stack([zero, zero, zero])
        sciw = f(srf.hyp)
    elif t == S.TAG_PARACYLINDER:
        sci = jnp.stack([f(1.0), zero, zero])
        scjh = jnp.stack([zero, zero, f(srf.par) * 0.5])
        sciw = zero
    elif t == S.TAG_HYPERCYLINDER:
        sci = jnp.stack([f(1.0), zero, -f(srf.rat) * f(srf.rat)])
        scjh = jnp.stack([zero, zero, zero])
        sciw = f(srf.hyp)
    elif t == S.TAG_HYPERPARABOLOID:
        sci = jnp.stack([1.0 / jnp.abs(f(srf.pr1)),
                         -1.0 / jnp.abs(f(srf.pr2)), zero])
        scjh = jnp.stack([zero, zero, f(0.5)])
        sciw = zero
    else:
        raise ValueError(f"unknown surface tag {t}")
    return sci, scjh, sciw


_BND_INF = 1e20   # clip values at/above this are "unclipped"


def _canonical_bounds(srf: S.Surface) -> Tuple[np.ndarray, np.ndarray]:
    """Static canonical-frame AABB of the axis-clipped surface: the
    per-shape intrinsic extent (adjust_minmax semantics,
    object.cpp:2508-2799) intersected with the axis clip box. Returns
    (cmin, cmax) float64 numpy, +-inf where unbounded. Custom clip
    programs (MINUS relations) only shrink the region, so ignoring them
    here is conservative — the bound may be loose, never wrong."""
    cmin = np.array(srf.min, np.float64)
    cmax = np.array(srf.max, np.float64)
    cmin[np.abs(cmin) >= _BND_INF] = -np.inf
    cmax[np.abs(cmax) >= _BND_INF] = +np.inf
    t = srf.tag
    f = lambda v: float(np.asarray(v))

    def clamp(axis, lo, hi):
        cmin[axis] = max(cmin[axis], lo)
        cmax[axis] = min(cmax[axis], hi)

    # largest |z| reachable inside the z clip window (inf if unclipped)
    zab = max(abs(cmin[2]), abs(cmax[2]))
    if t == S.TAG_PLANE:
        clamp(2, 0.0, 0.0)
    elif t == S.TAG_SPHERE:
        r = abs(f(srf.rad))
        for ax in range(3):
            clamp(ax, -r, r)
    elif t == S.TAG_CYLINDER:
        r = abs(f(srf.rad))
        clamp(0, -r, r)
        clamp(1, -r, r)
    elif t == S.TAG_CONE:
        r = abs(f(srf.rat)) * zab
        clamp(0, -r, r)
        clamp(1, -r, r)
    elif t == S.TAG_PARABOLOID:
        par = f(srf.par)
        # x^2 + y^2 = par*z: the surface lives on the sign(par) side of z
        if par >= 0.0:
            clamp(2, 0.0, np.inf)
        else:
            clamp(2, -np.inf, 0.0)
        zab2 = max(abs(cmin[2]), abs(cmax[2]))
        r = math.sqrt(abs(par) * zab2) if np.isfinite(zab2) else np.inf
        clamp(0, -r, r)
        clamp(1, -r, r)
    elif t == S.TAG_HYPERBOLOID:
        rat, hyp = f(srf.rat), f(srf.hyp)
        r2 = rat * rat * zab * zab + hyp
        r = math.sqrt(max(r2, 0.0)) if np.isfinite(zab) else np.inf
        clamp(0, -r, r)
        clamp(1, -r, r)
    elif t == S.TAG_PARACYLINDER:
        par = f(srf.par)
        if par >= 0.0:
            clamp(2, 0.0, np.inf)
        else:
            clamp(2, -np.inf, 0.0)
        zab2 = max(abs(cmin[2]), abs(cmax[2]))
        r = math.sqrt(abs(par) * zab2) if np.isfinite(zab2) else np.inf
        clamp(0, -r, r)
    elif t == S.TAG_HYPERCYLINDER:
        rat, hyp = f(srf.rat), f(srf.hyp)
        r2 = rat * rat * zab * zab + hyp
        r = math.sqrt(max(r2, 0.0)) if np.isfinite(zab) else np.inf
        clamp(0, -r, r)
    elif t == S.TAG_HYPERPARABOLOID:
        # x^2/p1 - y^2/p2 = z (saddle): each axis bounded only through
        # the other two; use interval arithmetic on the clip box
        p1, p2 = abs(f(srf.pr1)), abs(f(srf.pr2))
        xab = max(abs(cmin[0]), abs(cmax[0]))
        yab = max(abs(cmin[1]), abs(cmax[1]))
        # degenerate saddles (p1/p2 == 0) stay unbounded on the affected
        # axes instead of dividing by zero at compile time
        if np.isfinite(zab) and np.isfinite(yab) and p1 > 0.0 and p2 > 0.0:
            r = math.sqrt(p1 * (zab + yab * yab / p2))
            clamp(0, -r, r)
        if np.isfinite(zab) and np.isfinite(xab) and p1 > 0.0 and p2 > 0.0:
            r = math.sqrt(p2 * (zab + xab * xab / p1))
            clamp(1, -r, r)
        if np.isfinite(xab) and np.isfinite(yab) and p1 > 0.0 and p2 > 0.0:
            hi = xab * xab / p1
            lo = -yab * yab / p2
            clamp(2, lo, hi)
    return cmin, cmax


def _bounding_sphere(cmin: np.ndarray, cmax: np.ndarray, lin, pos):
    """World bounding sphere of a finite canonical box under the
    canonical->world affine (lin, pos): center = transformed box center,
    r = max corner distance, inflated for fp safety (the tracer's hit
    points land on the surface only to roundoff)."""
    ctr = (cmin + cmax) * 0.5
    half = (cmax - cmin) * 0.5
    # 8 corner offsets (static)
    sgn = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                    for sz in (-1, 1)], np.float64)
    corners = (sgn * half[None, :]).astype(np.float32)      # (8,3) static
    ctr32 = ctr.astype(np.float32)
    center_w = jnp.matmul(lin, jnp.asarray(ctr32),
                          precision=jax.lax.Precision.HIGHEST) + pos
    off_w = jnp.matmul(jnp.asarray(corners), lin.T,
                       precision=jax.lax.Precision.HIGHEST)  # (8,3)
    r = jnp.sqrt(jnp.max(jnp.sum(off_w * off_w, axis=1)))
    r = r * 1.001 + 1e-4
    return center_w, r * r


def _unpack_color(val: int):
    r = ((val >> 16) & 0xFF) / 255.0
    g = ((val >> 8) & 0xFF) / 255.0
    b = (val >> 0) & 0xFF
    return np.array([r, g, b / 255.0], np.float32)


class _Collected:
    def __init__(self):
        self.surfaces: List[Dict[str, Any]] = []
        self.lights: List[Dict[str, Any]] = []
        self.cameras: List[Dict[str, Any]] = []
        self.materials: List[S.Material] = []
        self.mat_ids: Dict[int, int] = {}
        # surfaces UNTIE'd from bounding volumes (BOUND/UNTIE relation
        # rows, object.cpp:1498-1586): rendered without culling
        self.untied: set = set()

    def material_index(self, mat: Optional[S.Material]) -> int:
        if mat is None:
            mat = _DEFAULT_MAT
        key = id(mat)
        if key not in self.mat_ids:
            self.mat_ids[key] = len(self.materials)
            self.materials.append(mat)
        return self.mat_ids[key]


_DEFAULT_MAT = S.Material(tex=S.Texture.pcolor(0x808080))


class _Slot:
    """One object slot in an array: its own surface (if any) and, for
    arrays, the child slots — mirrors the obj_arr indexing the reference's
    relation rows use (object.cpp:1385-1394)."""

    def __init__(self):
        self.surface: Optional[int] = None
        self.children: List["_Slot"] = []

    def all_surfaces(self) -> List[int]:
        out = [] if self.surface is None else [self.surface]
        for c in self.children:
            out.extend(c.all_surfaces())
        return out


def _walk(col: _Collected, arr: S.Array, parent_mtx, time: float,
          cam_trm: "Optional[S.Transform3D]" = None):
    """Recursive hierarchy walk (analog of rt_Array ctor + update_object,
    object.cpp:1170-1800). Returns the slot tree for relation resolution."""
    slots: List[_Slot] = []
    # accumulate sibling lights' color for emissive surfaces in this array
    # (rt_Light ctor object.cpp:622-632: col*(src+amb) summed into parent)
    lacc = np.zeros((3,), np.float32)
    direct_surfaces: List[int] = []
    for ob in arr.objects:
        item = ob.item
        if isinstance(item, S.Light):
            lacc += _unpack_color(item.col) * (
                float(np.asarray(item.src)) + float(np.asarray(item.amb)))
    for ob in arr.objects:
        trm = ob.anim(time) if ob.anim is not None else ob.trm
        item = ob.item
        if cam_trm is not None and isinstance(item, S.Camera):
            # interactive camera override (update_action semantics,
            # object.cpp:495-573 mutate the camera object's trm)
            trm = cam_trm
        mtx = jnp.matmul(parent_mtx, transform_matrix(trm),
                         precision=jax.lax.Precision.HIGHEST)
        slot = _Slot()
        if isinstance(item, S.Array):
            slot.children = _walk(col, item, mtx, time, cam_trm)
        elif isinstance(item, S.Surface):
            mo = ob.mat_outer if ob.mat_outer is not None else \
                item.side_outer.material
            mi = ob.mat_inner if ob.mat_inner is not None else \
                item.side_inner.material
            idx = len(col.surfaces)
            col.surfaces.append(dict(
                srf=item, mtx=mtx,
                mat_outer=col.material_index(mo),
                mat_inner=col.material_index(mi),
                side_outer=item.side_outer, side_inner=item.side_inner,
                clips=[], emis=np.zeros((2, 3), np.float32),
            ))
            slot.surface = idx
            direct_surfaces.append(idx)
        elif isinstance(item, S.Light):
            col.lights.append(dict(lgt=item, mtx=mtx))
        elif isinstance(item, S.Camera):
            col.cameras.append(dict(cam=item, mtx=mtx))
        slots.append(slot)

    # emissive PT radiance for LIGHT-tagged sides of direct child surfaces
    for si in direct_surfaces:
        sd = col.surfaces[si]
        for k, mk in ((0, "mat_outer"), (1, "mat_inner")):
            mat = col.materials[sd[mk]]
            if mat.tag == S.MAT_LIGHT:
                sd["emis"][k] = lacc * 100.0

    _apply_relations(col, arr, slots)
    return slots


def _apply_relations(col: _Collected, arr: S.Array, slots: List[_Slot]):
    """Resolve rt_RELATION rows into per-surface clip program entries.

    Semantics from rt_Array ctor (object.cpp:1376-1587) + add_relation
    (object.cpp:2382-2454):
      * {a>=0, MINUS_*, b>=0}: every surface under slot a gets a clip by
        every surface under slot b.
      * {-1, MINUS_*, b}: open/extend an accumulator segment with b's
        surfaces; {a, MINUS_ACCUM, -1} closes it and attaches the whole
        ENTER..members..LEAVE segment to every surface under a.
      * {a, INDEX_ARRAY, -1} / {-1, INDEX_ARRAY, b}: descend the left /
        right index context into the named sub-array for following rows;
        contexts reset after each consuming row.
      * BOUND/UNTIE rows manage bounding volumes (culling) — no-ops here.
    """
    pending_accum: List[Tuple[int, int]] = []
    acc_open = False
    ctx_l: List[_Slot] = slots
    ctx_r: List[_Slot] = slots

    for rel in arr.relations:
        r = rel.rel
        if rel.obj1 >= len(ctx_l) or rel.obj2 >= len(ctx_r):
            continue
        if r == S.REL_INDEX_ARRAY:
            if rel.obj1 >= 0 and ctx_l[rel.obj1].children:
                ctx_l = ctx_l[rel.obj1].children
            if rel.obj2 >= 0 and ctx_r[rel.obj2].children:
                ctx_r = ctx_r[rel.obj2].children
            continue
        if r in (S.REL_BOUND_ARRAY, S.REL_UNTIE_ARRAY,
                 S.REL_BOUND_INDEX, S.REL_UNTIE_INDEX):
            # bounding-volume membership (object.cpp:1498-1586). Our
            # culling uses per-surface spheres derived from each
            # surface's own clips, so BOUND (membership on) is the
            # default; UNTIE'd objects are excluded from culling — the
            # analog of the reference testing untied objects outside
            # any bvnode sub-list. Later rows override earlier ones.
            tie = r in (S.REL_BOUND_ARRAY, S.REL_BOUND_INDEX)
            if r in (S.REL_BOUND_ARRAY, S.REL_UNTIE_ARRAY):
                if 0 <= rel.obj2 < len(ctx_r):
                    targets = ctx_r[rel.obj2].all_surfaces()
                else:  # {-1, *, -1}: this whole array
                    targets = [si for s_ in slots
                               for si in s_.all_surfaces()]
            else:
                targets = (ctx_r[rel.obj2].all_surfaces()
                           if 0 <= rel.obj2 < len(ctx_r) else [])
            for si in targets:
                (col.untied.discard if tie else col.untied.add)(si)
            if rel.obj1 >= 0:
                ctx_l = slots
            if rel.obj2 >= 0:
                ctx_r = slots
            continue
        if r in (S.REL_MINUS_INNER, S.REL_MINUS_OUTER):
            side = +1 if r == S.REL_MINUS_OUTER else -1
            if rel.obj2 < 0:
                continue
            clippers = ctx_r[rel.obj2].all_surfaces()
            ctx_r = slots
            if rel.obj1 == -1:
                acc_open = True
                for ci in clippers:
                    pending_accum.append((ci, side))
            else:
                for ti in ctx_l[rel.obj1].all_surfaces():
                    for ci in clippers:
                        if ci != ti:
                            col.surfaces[ti]["clips"].append(
                                (CLIP_SURF, ci, side))
                ctx_l = slots
        elif r == S.REL_MINUS_ACCUM:
            if rel.obj1 < 0 or not acc_open:
                continue
            for ti in ctx_l[rel.obj1].all_surfaces():
                col.surfaces[ti]["clips"].append((CLIP_ENTER, -1, 0))
                for (ci, side) in pending_accum:
                    if ci != ti:
                        col.surfaces[ti]["clips"].append((CLIP_SURF, ci, side))
                col.surfaces[ti]["clips"].append((CLIP_LEAVE, -1, 0))
            pending_accum = []
            acc_open = False
            ctx_l = slots


def _texture_array(tex: S.Texture) -> Optional[np.ndarray]:
    """Return (H, W, 3) float RGB in [0,1] or None for plain color."""
    if tex.data is not None:
        d = np.asarray(tex.data)
        if d.ndim == 2:  # packed 0xAARRGGBB uint32
            d = d.astype(np.uint32)
            rgb = np.stack([(d >> 16) & 0xFF, (d >> 8) & 0xFF, d & 0xFF],
                           axis=-1).astype(np.float32) / 255.0
            return rgb
        return d.astype(np.float32)
    if tex.path is not None:
        from quadray_tpu.utils.image import load_bmp
        return load_bmp(tex.path).astype(np.float32) / 255.0
    return None


def _pad_pow2(n: int, lo: int = 1) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def compile_scene(scene: S.SceneDef, time: float = 0.0,
                  cam_index: int = 0,
                  ns: Optional[int] = None, nc: Optional[int] = None,
                  nl: Optional[int] = None,
                  cam_trm: Optional[S.Transform3D] = None) -> SceneArrays:
    """Compile a SceneDef at a given time into SceneArrays.

    Scene compilation is host work (the analog of the reference's update
    phases 0.5-3 running on the CPU, engine.cpp:3013-3099): its eager jnp
    math runs on the CPU backend and the finished SceneArrays pytree is
    transferred to the default (TPU) device in one hop. Dispatching the
    hundreds of tiny eager ops straight to a remote TPU costs ~100ms each
    through a compile tunnel. Under a jit trace (differentiable/animated
    paths) the math inlines into the caller's graph unchanged.
    """
    try:
        from jax.core import Tracer
    except ImportError:  # pragma: no cover - jax layout drift
        from jax._src.core import Tracer
    leaves = jax.tree_util.tree_leaves((scene, time, cam_trm))
    tracing = any(isinstance(leaf, Tracer) for leaf in leaves)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = None
    dev = jax.devices()[0]
    if tracing or cpu is None or dev.platform == "cpu":
        return _compile_scene_impl(scene, time, cam_index, ns, nc, nl,
                                   cam_trm)
    with jax.default_device(cpu):
        sc = _compile_scene_impl(scene, time, cam_index, ns, nc, nl,
                                 cam_trm)
    sc_dev = jax.device_put(sc, dev)
    _register_host_mirror(sc_dev, sc)
    return sc_dev


_HOST_MIRROR: "OrderedDict" = None  # created lazily


def _register_host_mirror(sc_dev: SceneArrays, sc_host: SceneArrays,
                          maxlen: int = 8) -> None:
    global _HOST_MIRROR
    from collections import OrderedDict
    if _HOST_MIRROR is None:
        _HOST_MIRROR = OrderedDict()
    leaves = jax.tree_util.tree_leaves(sc_dev)
    key = tuple(id(leaf) for leaf in leaves)
    _HOST_MIRROR[key] = (leaves, sc_host)
    while len(_HOST_MIRROR) > maxlen:
        _HOST_MIRROR.popitem(last=False)


def host_view(sc: SceneArrays) -> SceneArrays:
    """Return a host(CPU)-backed view of a compiled SceneArrays if one is
    known, else ``sc`` itself. Host-side passes (kernel structure
    extraction) use this to avoid per-field device->host transfers, which
    cost seconds each through a TPU tunnel."""
    if _HOST_MIRROR is None:
        return sc
    leaves = jax.tree_util.tree_leaves(sc)
    key = tuple(id(leaf) for leaf in leaves)
    ent = _HOST_MIRROR.get(key)
    if ent is not None and all(a is b for a, b in zip(ent[0], leaves)):
        return ent[1]
    return sc


def _compile_scene_impl(scene: S.SceneDef, time: float = 0.0,
                        cam_index: int = 0,
                        ns: Optional[int] = None, nc: Optional[int] = None,
                        nl: Optional[int] = None,
                        cam_trm: Optional[S.Transform3D] = None
                        ) -> SceneArrays:
    """Static shapes: NS surfaces / NC clip entries / NL lights / NM
    materials are padded (pow2) so recompiles at different times hit the
    jit cache."""
    col = _Collected()
    eye = jnp.eye(4, dtype=F32)
    _walk(col, scene.root, eye, time, cam_trm)

    n_srf = len(col.surfaces)
    if n_srf == 0:
        raise ValueError("scene has no surfaces")
    NS = ns or _pad_pow2(n_srf)
    NC = nc or max(1, _pad_pow2(max((len(s["clips"]) for s in col.surfaces),
                                    default=1)))
    NL = nl or max(1, _pad_pow2(len(col.lights)))
    NM = max(1, len(col.materials))

    # ---- surfaces
    tags, kinds, sings = [], [], []
    poss, invs, fwds, scis, scjhs, sciws, cmins, cmaxs, mats = (
        [] for _ in range(9))
    # culling gate: the tiling/bounding-volume optimization class
    # (RT_OPTS_TILING/VARRAY analog) — scenes that turn it off get no
    # bounding spheres, so the tracer stays brute-force (run0 analog)
    use_cull = (scene.opts & S.OPTS_TILING) != 0
    bnds: List[int] = []
    bsphs: List[jnp.ndarray] = []
    cops = np.zeros((NS, NC), np.int32)
    crefs = np.full((NS, NC), -1, np.int32)
    csides = np.zeros((NS, NC), np.float32)
    for i, sd in enumerate(col.surfaces):
        srf: S.Surface = sd["srf"]
        mtx = sd["mtx"]
        lin = mtx[:3, :3]
        pos = mtx[:3, 3]
        inv = _inv3(lin)
        sci, scjh, sciw = quadric_coeffs(srf)
        tags.append(srf.tag)
        # solver kind: 1 plane, 2 quadric, 3 two-plane (degenerate
        # hypercylinder i^2 = rat^2 k^2, update0 tracer.cpp:5785-5788)
        if srf.tag == S.TAG_PLANE:
            kind = 1
        elif (srf.tag == S.TAG_HYPERCYLINDER
              and float(np.asarray(srf.hyp)) == 0.0):
            kind = 3
        else:
            kind = 2
        kinds.append(kind)
        # conic-singularity flag (msc_p[1], update0 tracer.cpp:5801-5807):
        # surfaces whose implicit passes through their local origin with a
        # singular gradient need the apex clip-point adjustment
        if srf.tag == S.TAG_CONE or (
                srf.tag == S.TAG_HYPERBOLOID
                and float(np.asarray(srf.hyp)) == 0.0):
            sing = 1
        elif (srf.tag == S.TAG_HYPERCYLINDER
              and float(np.asarray(srf.hyp)) == 0.0):
            sing = 2
        else:
            sing = 0
        sings.append(sing)
        poss.append(pos)
        invs.append(inv)
        fwds.append(lin)
        scis.append(sci)
        scjhs.append(scjh)
        sciws.append(sciw)
        cmins.append(jnp.asarray(np.asarray(srf.min, np.float32)))
        cmaxs.append(jnp.asarray(np.asarray(srf.max, np.float32)))
        mats.append((sd["mat_outer"], sd["mat_inner"]))
        bcmin, bcmax = _canonical_bounds(srf)
        finite = bool(np.all(np.isfinite(bcmin))
                      and np.all(np.isfinite(bcmax))
                      and np.all(np.abs(bcmin) < _BND_INF)
                      and np.all(np.abs(bcmax) < _BND_INF))
        if finite and use_cull and i not in col.untied:
            ctr_w, r2 = _bounding_sphere(bcmin, bcmax, lin, pos)
            bnds.append(1)
            bsphs.append(jnp.concatenate([ctr_w, jnp.reshape(r2, (1,))]))
        else:
            bnds.append(0)
            bsphs.append(jnp.zeros((4,), F32))
        for j, (op, ref, side) in enumerate(sd["clips"][:NC]):
            cops[i, j] = op
            crefs[i, j] = ref
            csides[i, j] = float(side)

    def pad_f(lst, shape):
        a = jnp.stack(lst) if lst else jnp.zeros((0,) + shape, F32)
        pad = NS - a.shape[0]
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + shape, F32)], axis=0)
        return a.astype(F32)

    s_tag = np.full((NS,), -1, np.int32)
    s_tag[:n_srf] = tags
    s_kind = np.zeros((NS,), np.int32)
    s_kind[:n_srf] = kinds
    s_sing = np.zeros((NS,), np.int32)
    s_sing[:n_srf] = sings

    # ---- materials + texture atlas
    m_props = np.zeros((NM,), np.int32)
    m_col = np.zeros((NM, 3), np.float32)
    m_f = {k: np.zeros((NM,), np.float32)
           for k in ("dff", "spc", "pow", "rfl", "trn", "rfr", "ext")}
    m_tex_base = np.full((NM,), -1, np.int32)
    m_tex_xmask = np.zeros((NM,), np.int32)
    m_tex_ymask = np.zeros((NM,), np.int32)
    m_tex_xshift = np.zeros((NM,), np.int32)
    m_tex_scl = np.ones((NM, 2), np.float32)
    m_tex_off = np.zeros((NM, 2), np.float32)
    atlas: List[np.ndarray] = []
    atlas_len = 0
    use_gamma = (scene.opts & S.OPTS_GAMMA) == 0
    use_fresnel = (scene.opts & S.OPTS_FRESNEL) == 0
    for mi, mat in enumerate(col.materials):
        props = 0
        props |= PROP_LIGHT if mat.tag == S.MAT_LIGHT else 0
        props |= PROP_METAL if mat.tag == S.MAT_METAL else 0
        trn = float(np.asarray(mat.trn))
        rfl = float(np.asarray(mat.rfl))
        props |= PROP_OPAQUE if trn == 0.0 else 0
        props |= PROP_TRANSP if trn == 1.0 else 0
        props |= PROP_REFLECT if rfl != 0.0 else 0
        props |= PROP_REFRACT if float(np.asarray(mat.rfr)) != 1.0 else 0
        dff, spc = float(np.asarray(mat.dff)), float(np.asarray(mat.spc))
        props |= PROP_DIFFUSE if dff != 0.0 else 0
        props |= PROP_SPECULAR if spc != 0.0 else 0
        if rfl + trn >= 1.0:  # object.cpp:4056-4060
            props &= ~(PROP_DIFFUSE | PROP_SPECULAR)
        props |= PROP_GAMMA if use_gamma else 0
        props |= PROP_FRESNEL if use_fresnel else 0
        tex_arr = _texture_array(mat.tex)
        if tex_arr is not None:
            h, w = tex_arr.shape[:2]
            assert (w & (w - 1)) == 0 and (h & (h - 1)) == 0, \
                "texture dims must be powers of two (reference contract)"
            props |= PROP_TEXTURE
            m_tex_base[mi] = atlas_len
            m_tex_xmask[mi] = w - 1
            m_tex_ymask[mi] = h - 1
            m_tex_xshift[mi] = int(math.log2(w))
            atlas.append(tex_arr.reshape(-1, 3))
            atlas_len += h * w
        m_props[mi] = props
        m_col[mi] = _unpack_color(mat.tex.color)
        for k in m_f:
            m_f[k][mi] = float(np.asarray(getattr(mat, k)))
        # refraction special case (object.cpp:4146-4152): partially
        # transparent with rfr==1 -> ext supplies the Fresnel index
        if 0.0 < trn < 1.0 and m_f["rfr"][mi] == 1.0 and m_f["ext"][mi] != 0.0:
            m_f["rfr"][mi] = m_f["ext"][mi]
    tex_data = (np.concatenate(atlas, axis=0) if atlas
                else np.zeros((1, 3), np.float32))

    # per-surface texture 2D transforms live on sides; fold the *outer*
    # side's transform into the material slots referenced by this surface.
    # (the reference keys materials by (side, material); textured scenes in
    # the test suite reuse materials with identity side transforms, so a
    # single per-material transform suffices for now)
    for sd in col.surfaces:
        for key, side in (("mat_outer", sd["side_outer"]),
                          ("mat_inner", sd["side_inner"])):
            mi = sd[key]
            if side is not None:
                m_tex_scl[mi] = np.asarray(side.scl, np.float32)
                m_tex_off[mi] = np.asarray(side.pos, np.float32)

    # ---- lights + ambient accumulation (engine.cpp:3262-3272).
    # Positions come from the (possibly animator-traced) matrices so they
    # are stacked as jnp; the scalar attenuation terms are static data
    l_col = np.zeros((NL, 3), np.float32)
    l_cnt = np.ones((NL,), np.float32)
    l_lnr = np.zeros((NL,), np.float32)
    l_qdr = np.zeros((NL,), np.float32)
    l_on = np.zeros((NL,), np.float32)
    amb = np.zeros((3,), np.float32)
    lp_rows = []
    for li, ld in enumerate(col.lights):
        lgt: S.Light = ld["lgt"]
        lp_rows.append(ld["mtx"][:3, 3])
        colr = _unpack_color(lgt.col)
        l_col[li] = colr * float(np.asarray(lgt.src))
        # reference biases constant attenuation by +1 (object.cpp:617)
        l_cnt[li] = float(np.asarray(lgt.cnt)) + 1.0
        l_lnr[li] = float(np.asarray(lgt.lnr))
        l_qdr[li] = float(np.asarray(lgt.qdr))
        l_on[li] = 1.0
        amb += colr * float(np.asarray(lgt.amb))
    lp_rows += [jnp.zeros((3,), F32)] * (NL - len(col.lights))
    l_pos = jnp.stack(lp_rows).astype(F32)

    # ---- camera (basis = columns of world matrix; ray steppers are
    # generated in ops.rays following engine.cpp:3032-3055, 3256-3259)
    if not col.cameras:
        raise ValueError("scene has no camera")
    # camera registry semantics: rt_Camera construction PREPENDS to the
    # registry list (object.cpp:429-431, rt_List head insert), and the
    # scene renders cam_head (engine.cpp:2923) — so index 0 is the LAST
    # camera in hierarchy order (demo03's camera03/02/01 arrays)
    cams = col.cameras[::-1]
    cd = cams[min(cam_index, len(cams) - 1)]
    cam: S.Camera = cd["cam"]
    cmtx = cd["mtx"]
    amb += np.asarray(_unpack_color(cam.col)) * float(np.asarray(cam.amb))

    return SceneArrays(
        s_tag=jnp.asarray(s_tag), s_kind=jnp.asarray(s_kind),
        s_sing=jnp.asarray(s_sing),
        s_pos=pad_f(poss, (3,)), s_inv=pad_f(invs, (3, 3)),
        s_fwd=pad_f(fwds, (3, 3)),
        s_sci=pad_f(scis, (3,)), s_scjh=pad_f(scjhs, (3,)),
        s_sciw=pad_f([jnp.reshape(s, ()) for s in sciws], ()),
        s_cmin=pad_f(cmins, (3,)), s_cmax=pad_f(cmaxs, (3,)),
        s_mat=jnp.asarray(np.array(
            mats + [(0, 0)] * (NS - n_srf), np.int32)),
        s_bnd=jnp.asarray(np.array(bnds + [0] * (NS - n_srf), np.int32)),
        s_bsph=pad_f(bsphs, (4,)),
        s_emis=jnp.asarray(np.concatenate(
            [np.stack([sd["emis"] for sd in col.surfaces])]
            + ([np.zeros((NS - n_srf, 2, 3), np.float32)]
               if NS > n_srf else []), axis=0)),
        c_op=jnp.asarray(cops), c_ref=jnp.asarray(crefs),
        c_side=jnp.asarray(csides),
        m_props=jnp.asarray(m_props), m_col=jnp.asarray(m_col),
        m_dff=jnp.asarray(m_f["dff"]), m_spc=jnp.asarray(m_f["spc"]),
        m_pow=jnp.asarray(m_f["pow"]), m_rfl=jnp.asarray(m_f["rfl"]),
        m_trn=jnp.asarray(m_f["trn"]), m_rfr=jnp.asarray(m_f["rfr"]),
        m_ext=jnp.asarray(m_f["ext"]),
        m_tex_base=jnp.asarray(m_tex_base),
        m_tex_xmask=jnp.asarray(m_tex_xmask),
        m_tex_ymask=jnp.asarray(m_tex_ymask),
        m_tex_xshift=jnp.asarray(m_tex_xshift),
        m_tex_scl=jnp.asarray(m_tex_scl), m_tex_off=jnp.asarray(m_tex_off),
        tex_data=jnp.asarray(tex_data),
        l_pos=jnp.asarray(l_pos), l_col=jnp.asarray(l_col),
        l_cnt=jnp.asarray(l_cnt), l_lnr=jnp.asarray(l_lnr),
        l_qdr=jnp.asarray(l_qdr), l_on=jnp.asarray(l_on),
        cam_pos=cmtx[:3, 3], cam_hor=cmtx[:3, 0], cam_ver=cmtx[:3, 1],
        cam_nrm=cmtx[:3, 2],
        cam_pov=jnp.asarray(float(np.asarray(cam.pov)), F32),
        amb_col=jnp.asarray(amb),
        use_gamma=jnp.asarray(1.0 if use_gamma else 0.0, F32),
        use_fresnel=jnp.asarray(1.0 if use_fresnel else 0.0, F32),
    )
