"""Demo scenes with animators — ports of data/scenes/scn_demo01..03.h.

Scene data comes from the JSON dumps; the C animator callbacks (which
mutate trm incrementally per frame) are re-expressed as pure functions of
absolute time in milliseconds (the RooT clock):

  demo01 an_camera01 (scn_demo01.h:513-524): rot_z += dt/50  ->  t/50 deg
  demo01 an_light01  (scn_demo01.h:550-561): rot_z += 7dt/50 -> 7t/50 deg
  demo02 an_light01  (scn_demo02.h): same as demo01's light
  demo03 an_camera01 (scn_demo03.h): rot_z = 15*sin(t/1500) (absolute)
"""

from __future__ import annotations

import math

from quadray_tpu.scene.schema import SceneDef, Transform3D
from quadray_tpu.models.scenes.loader import load_scene


def _rotz_rate(base: Transform3D, deg_per_ms: float):
    def anim(t: float) -> Transform3D:
        rz = (base.rot[2] + t * deg_per_ms) % 360.0
        return Transform3D(scl=base.scl, rot=(base.rot[0], base.rot[1], rz),
                           pos=base.pos)
    return anim


def _rotz_sine(base: Transform3D, amp: float, period_ms: float):
    def anim(t: float) -> Transform3D:
        rz = amp * math.sin(t / period_ms)
        return Transform3D(scl=base.scl, rot=(base.rot[0], base.rot[1], rz),
                           pos=base.pos)
    return anim


def _attach(sdef: SceneDef, path_makers) -> SceneDef:
    """path_makers: {path: maker(base_trm) -> animator}."""
    for path, maker in path_makers.items():
        node = sdef.root
        parts = [int(p) for p in path.split("/")]
        for p in parts[:-1]:
            node = node.objects[p].item
        ob = node.objects[parts[-1]]
        ob.anim = maker(ob.trm)
    return sdef


def demo01() -> SceneDef:
    return _attach(load_scene("demo01"), {
        "4": lambda b: _rotz_rate(b, 1.0 / 50.0),   # camera array
        "5": lambda b: _rotz_rate(b, 7.0 / 50.0),   # light array
    })


def demo02() -> SceneDef:
    return _attach(load_scene("demo02"), {
        "6": lambda b: _rotz_rate(b, 7.0 / 50.0),
    })


def demo03() -> SceneDef:
    return _attach(load_scene("demo03"), {
        "8": lambda b: _rotz_sine(b, 15.0, 1500.0),
    })


def build(name: str) -> SceneDef:
    return {"demo01": demo01, "demo02": demo02, "demo03": demo03}[name]()
