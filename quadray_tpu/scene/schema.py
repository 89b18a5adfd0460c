"""Typed scene schema — the user-facing scene-description API.

Plays the role of the reference's ``core/engine/format.h`` (the C-struct
scene format, format.h:16-29): surfaces in local IJK space with K the axis
of symmetry, per-side materials, hierarchical transforms, relations for
clipping/boolean ops, cameras and point lights, and pure-function animators.

Design differences from the reference (TPU-first):
  * dataclasses instead of C static initializers; a scene is a plain Python
    tree, compiled to flat SoA jnp arrays by ``quadray_tpu.scene.compile``.
  * animators are pure functions ``f(time) -> Transform3D`` evaluated on the
    host before jit dispatch (reference: C callbacks, format.h:346-355).
  * all numeric fields may be Python floats or jnp scalars — gradients flow
    through the scene compiler for inverse rendering.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

INF = float(np.inf)

# ---------------------------------------------------------------------------
# Surface tags (match reference numbering, format.h:118-133)
# ---------------------------------------------------------------------------
TAG_PLANE = 0
TAG_CYLINDER = 1
TAG_SPHERE = 2
TAG_CONE = 3
TAG_PARABOLOID = 4
TAG_HYPERBOLOID = 5
TAG_PARACYLINDER = 6
TAG_HYPERCYLINDER = 7
TAG_HYPERPARABOLOID = 8
TAG_SURFACE_MAX = 9

# Relation ops (format.h:158-166)
REL_MINUS_INNER = -1   # subtract clipper's inner subspace
REL_MINUS_OUTER = +1   # subtract clipper's outer subspace
REL_MINUS_ACCUM = 2    # subtract accumulated subspace
REL_INDEX_ARRAY = 3    # descend into sub-array for next relation row
REL_BOUND_ARRAY = 4
REL_UNTIE_ARRAY = 5
REL_BOUND_INDEX = 6
REL_UNTIE_INDEX = 7

# Material tags (format.h:303-308)
MAT_PLAIN = 0
MAT_LIGHT = 1
MAT_METAL = 2

# Runtime opt flags (format.h:40-106). In the reference, setting a flag in
# rt_SCENE.opts turns that optimization OFF for the scene; GAMMA/FRESNEL/PT
# flags are inverted ("opt on" = feature off).
OPTS_TILING = 1 << 1
OPTS_GAMMA = 1 << 20     # set -> gamma correction disabled (default set)
OPTS_FRESNEL = 1 << 21   # set -> Fresnel reflectance disabled (default set)
OPTS_PT = 1 << 25        # set -> path tracer prohibited
OPTS_NONE = OPTS_GAMMA | OPTS_FRESNEL | OPTS_PT
OPTS_FULL = OPTS_NONE | OPTS_TILING


Scalar = Union[float, "np.floating"]
Vec2 = Tuple[Scalar, Scalar]
Vec3 = Tuple[Scalar, Scalar, Scalar]


@dataclass
class Transform3D:
    """Scale / rotate (degrees, applied X then Y then Z) / translate.

    Matches reference matrix composition (rtgeom.cpp:102-163):
    world = T . Rz . Ry . Rx . S acting on column vectors.
    """

    scl: Vec3 = (1.0, 1.0, 1.0)
    rot: Vec3 = (0.0, 0.0, 0.0)
    pos: Vec3 = (0.0, 0.0, 0.0)


@dataclass
class Transform2D:
    """Per-side texture-space transform (format.h:179-185)."""

    scl: Vec2 = (1.0, 1.0)
    rot: Scalar = 0.0
    pos: Vec2 = (0.0, 0.0)


@dataclass
class Texture:
    """A texture: plain color, bound ndarray, or file path.

    Reference: rt_TEX (format.h:270-283). ``data`` is an (H, W, 3) float or
    (H, W) packed-uint32 array; dims must be powers of two (the reference's
    integer mask/shift addressing contract, object.cpp:4113-4127).
    """

    color: int = 0xFFFFFF            # packed 0xRRGGBB, used when data is None
    data: Optional[np.ndarray] = None
    path: Optional[str] = None       # BMP file to load at compile time

    @staticmethod
    def pcolor(color: int) -> "Texture":
        return Texture(color=color)


@dataclass
class Material:
    """Reference: rt_MATERIAL {tag, tex, lgt[dff,spc,pow], prp[rfl,trn,rfr,ext]}
    (format.h:309-326; field semantics object.cpp:4042-4152).

    lgt = (diffuse, specular, specular_power)
    prp = (reflectivity, transparency, refraction_ratio, extinction)

    Notes carried over from the reference:
      * if prp.rfl + prp.trn >= 1, diffuse+specular are disabled
        (object.cpp:4056-4060).
      * if 0 < trn < 1 and rfr == 1.0, ``ext`` supplies the Fresnel index
        while rays propagate unbent (object.cpp:4146-4152).
      * tag == MAT_LIGHT makes the surface emissive/unshaded;
        tag == MAT_METAL blends specular into the texture color.
    """

    tag: int = MAT_PLAIN
    tex: Texture = field(default_factory=Texture)
    dff: Scalar = 1.0
    spc: Scalar = 0.0
    pow: Scalar = 1.0
    rfl: Scalar = 0.0
    trn: Scalar = 0.0
    rfr: Scalar = 1.0
    ext: Scalar = 0.0


@dataclass
class Side:
    """One side (outer/inner) of a surface: texture transform + material
    (rt_SIDE, format.h:328-338)."""

    material: Optional[Material] = None
    scl: Vec2 = (1.0, 1.0)
    rot: Scalar = 0.0
    pos: Vec2 = (0.0, 0.0)


def _both_sides() -> Tuple[Side, Side]:
    return (Side(), Side())


@dataclass
class Surface:
    """Base surface: local-frame axis clip box + two sides
    (rt_SURFACE, format.h:452-460). min/max are in the surface's local IJK
    frame; +-INF leaves the axis open."""

    tag: int = TAG_PLANE
    min: Vec3 = (-INF, -INF, -INF)
    max: Vec3 = (+INF, +INF, +INF)
    side_outer: Side = field(default_factory=Side)
    side_inner: Side = field(default_factory=Side)
    # shape params (interpreted per tag; see compile.quadric_coeffs):
    rad: Scalar = 1.0   # cylinder/sphere radius
    rat: Scalar = 1.0   # cone/hyperboloid ratio
    hyp: Scalar = 0.0   # hyperboloid/hypercylinder offset
    par: Scalar = 1.0   # paraboloid/paracylinder parameter
    pr1: Scalar = 1.0   # hyperparaboloid parameters
    pr2: Scalar = 1.0


def Plane(**kw) -> Surface:
    return Surface(tag=TAG_PLANE, **kw)


def Cylinder(rad: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_CYLINDER, rad=rad, **kw)


def Sphere(rad: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_SPHERE, rad=rad, **kw)


def Cone(rat: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_CONE, rat=rat, **kw)


def Paraboloid(par: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_PARABOLOID, par=par, **kw)


def Hyperboloid(rat: Scalar = 1.0, hyp: Scalar = 0.0, **kw) -> Surface:
    return Surface(tag=TAG_HYPERBOLOID, rat=rat, hyp=hyp, **kw)


def ParaCylinder(par: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_PARACYLINDER, par=par, **kw)


def HyperCylinder(rat: Scalar = 1.0, hyp: Scalar = 0.0, **kw) -> Surface:
    return Surface(tag=TAG_HYPERCYLINDER, rat=rat, hyp=hyp, **kw)


def HyperParaboloid(pr1: Scalar = 1.0, pr2: Scalar = 1.0, **kw) -> Surface:
    return Surface(tag=TAG_HYPERPARABOLOID, pr1=pr1, pr2=pr2, **kw)


@dataclass
class Camera:
    """rt_CAMERA (format.h:393-416): global ambient color+intensity, pov =
    distance from eye to screen plane (defines FOV: hor spans [-0.5, 0.5]
    at distance pov), and key-action speeds dps/drt."""

    col: int = 0xFFFFFF
    amb: Scalar = 0.05         # lum[0], global ambient intensity
    pov: Scalar = 1.0          # vpt[0]
    dps: Vec3 = (0.5, 0.5, 0.5)
    drt: Vec3 = (1.5, 1.5, 1.5)


@dataclass
class Light:
    """rt_LIGHT (format.h:426-446): color, ambient+source intensities,
    attenuation (range, constant, linear, quadratic)."""

    col: int = 0xFFFFFF
    amb: Scalar = 0.0          # lum[0]
    src: Scalar = 1.0          # lum[1]
    rng: Scalar = 0.0          # atn[0] (kept for parity; unused by shading)
    cnt: Scalar = 1.0          # atn[1]
    lnr: Scalar = 0.0          # atn[2]
    qdr: Scalar = 0.0          # atn[3]


@dataclass
class Relation:
    """rt_RELATION {obj1, rel, obj2} row (format.h:168-173). Indices refer to
    positions in the enclosing Array's object list; -1 with MINUS_* opens /
    closes boolean accumulator segments (object.cpp:1424-1496)."""

    obj1: int
    rel: int
    obj2: int


Animator = Callable[[float], Transform3D]
"""Pure animator: absolute time (seconds) -> Transform3D. Replaces the
reference's mutating rt_FUNC_ANIM3D callbacks (format.h:346-355)."""


@dataclass
class Object:
    """A node in the scene hierarchy (rt_OBJECT, format.h:357-365): a
    transform plus one of {Surface, Camera, Light, Array}, with an optional
    animator that *overrides* the transform as a function of time."""

    trm: Transform3D = field(default_factory=Transform3D)
    item: Union[Surface, Camera, Light, "Array", None] = None
    anim: Optional[Animator] = None
    # per-surface material overrides (RT_OBJ_*_MAT macros, format.h:484-489)
    mat_outer: Optional[Material] = None
    mat_inner: Optional[Material] = None


@dataclass
class Array:
    """A sub-object array with relations (rt_OBJ ARRAY, format.h:332-344)."""

    objects: List[Object] = field(default_factory=list)
    relations: List[Relation] = field(default_factory=list)


@dataclass
class SceneDef:
    """rt_SCENE (format.h:755-760): the root array + per-scene opt mask."""

    root: Array = field(default_factory=Array)
    opts: int = OPTS_NONE


def obj(item, scl=(1.0, 1.0, 1.0), rot=(0.0, 0.0, 0.0), pos=(0.0, 0.0, 0.0),
        anim=None, mat_outer=None, mat_inner=None) -> Object:
    """Convenience constructor mirroring the reference's rt_OBJECT rows."""
    return Object(trm=Transform3D(scl=scl, rot=rot, pos=pos), item=item,
                  anim=anim, mat_outer=mat_outer, mat_inner=mat_inner)


def replace(dc, **kw):
    """dataclasses.replace passthrough for scene editing."""
    return dataclasses.replace(dc, **kw)
