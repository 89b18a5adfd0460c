"""Load reference scene data from the JSON dumps in golden/scenes/.

The dumps are produced by native/scene_dump.cpp, which compiles against the
read-only reference scene headers and serializes their pure data (L4 layer,
SURVEY.md §2.5). Loading them guarantees transcription-exact scene parity
for all 18 test scenes and the 3 demo scenes.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List

import numpy as np

from quadray_tpu.scene import schema as S

SCENES_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "..",
                          "golden", "scenes")

_INF_SENTINEL = 1e30  # reference RT_INF dumps as FLT_MAX


def _fix_inf(v: float) -> float:
    if v >= _INF_SENTINEL:
        return math.inf
    if v <= -_INF_SENTINEL:
        return -math.inf
    return v


def _material(md: dict) -> S.Material:
    tex = S.Texture(color=md["color"] & 0xFFFFFF)
    if "tex" in md:
        w, h = md["tex_w"], md["tex_h"]
        data = np.array(md["tex"], np.uint32).reshape(h, w)
        tex = S.Texture(data=data)
    elif "tex_file" in md:
        tex = S.Texture(path=md["tex_file"])
    return S.Material(tag=md["tag"], tex=tex, dff=md["dff"], spc=md["spc"],
                      pow=md["pow"], rfl=md["rfl"], trn=md["trn"],
                      rfr=md["rfr"], ext=md["ext"])


def _side(sd: dict, mats: List[S.Material]) -> S.Side:
    mat = mats[sd["mat"]] if sd["mat"] >= 0 else None
    return S.Side(material=mat, scl=tuple(sd["scl"]), rot=sd["rot"],
                  pos=tuple(sd["pos"]))


_SURF_TAGS = {
    "plane": S.TAG_PLANE, "cylinder": S.TAG_CYLINDER, "sphere": S.TAG_SPHERE,
    "cone": S.TAG_CONE, "paraboloid": S.TAG_PARABOLOID,
    "hyperboloid": S.TAG_HYPERBOLOID, "paracylinder": S.TAG_PARACYLINDER,
    "hypercylinder": S.TAG_HYPERCYLINDER,
    "hyperparaboloid": S.TAG_HYPERPARABOLOID,
}


def _object(od: dict, mats: List[S.Material],
            animators: Dict[str, S.Animator], path: str) -> S.Object:
    trm = S.Transform3D(scl=tuple(od["trm"]["scl"]),
                        rot=tuple(od["trm"]["rot"]),
                        pos=tuple(od["trm"]["pos"]))
    typ = od["type"]
    anim = animators.get(path) if od.get("anim") else None
    if typ == "array":
        item = S.Array(
            objects=[_object(o, mats, animators, f"{path}/{i}")
                     for i, o in enumerate(od["objects"])],
            relations=[S.Relation(*r) for r in od["relations"]])
        return S.Object(trm=trm, item=item, anim=anim)
    if typ == "camera":
        cam = S.Camera(col=od["col"] & 0xFFFFFF, amb=od["amb"],
                       pov=od["pov"], dps=tuple(od["dps"]),
                       drt=tuple(od["drt"]))
        return S.Object(trm=trm, item=cam, anim=anim)
    if typ == "light":
        lgt = S.Light(col=od["col"] & 0xFFFFFF, amb=od["amb"], src=od["src"],
                      rng=od["rng"], cnt=od["cnt"], lnr=od["lnr"],
                      qdr=od["qdr"])
        return S.Object(trm=trm, item=lgt, anim=anim)
    tag = _SURF_TAGS[typ]
    srf = S.Surface(
        tag=tag,
        min=tuple(_fix_inf(v) for v in od["min"]),
        max=tuple(_fix_inf(v) for v in od["max"]),
        side_outer=_side(od["side_outer"], mats),
        side_inner=_side(od["side_inner"], mats),
        rad=od.get("rad", 1.0), rat=od.get("rat", 1.0),
        hyp=od.get("hyp", 0.0), par=od.get("par", 1.0),
        pr1=od.get("pr1", 1.0), pr2=od.get("pr2", 1.0))
    mo = mats[od["mat_outer"]] if od.get("mat_outer", -1) >= 0 else None
    mi = mats[od["mat_inner"]] if od.get("mat_inner", -1) >= 0 else None
    return S.Object(trm=trm, item=srf, anim=anim, mat_outer=mo, mat_inner=mi)


def load_scene(name: str,
               animators: Dict[str, S.Animator] = None) -> S.SceneDef:
    """Load golden/scenes/<name>.json as a SceneDef.

    ``animators`` maps object paths ("0/3" = root child 0, its child 3) to
    animator functions for objects the dump flagged as animated (demo
    scenes; their C callbacks are re-implemented in demos.py).
    """
    with open(os.path.join(SCENES_DIR, f"{name}.json")) as f:
        d = json.load(f)
    mats = [_material(m) for m in d["materials"]]
    animators = animators or {}
    root = S.Array(
        objects=[_object(o, mats, animators, str(i))
                 for i, o in enumerate(d["root"]["objects"])],
        relations=[S.Relation(*r) for r in d["root"]["relations"]])
    return S.SceneDef(root=root, opts=d["opts"])


def build(name: str, **kw) -> S.SceneDef:
    return load_scene(name, **kw)
