"""Test scene 01 — port of test/scenes/scn_test01.h.

Plane floor + two-sheet hyperboloid frame + sphere, with the mutual
boolean cut relations {2 MINUS_OUTER 1} / {1 MINUS_OUTER 2}
(scn_test01.h:185-189), one point light with bulb, tilted camera.
"""

from __future__ import annotations

from quadray_tpu.scene.schema import (
    SceneDef, Array, Relation, Plane, Sphere, Hyperboloid, Side, obj,
    REL_MINUS_OUTER, OPTS_PT, INF)
from quadray_tpu.models import materials as M
from quadray_tpu.models.objects import cm_camera01, lt_light01, sp_bulb01


def build() -> SceneDef:
    pl_floor01 = Plane(
        min=(-5.0, -5.0, -INF), max=(+5.0, +5.0, +INF),
        side_outer=Side(material=M.mt_plain01_gray01),
        side_inner=Side(material=M.mt_plain01_gray02))

    hb_frame01 = Hyperboloid(
        rat=2.5, hyp=-0.5,
        min=(-INF, -INF, -1.5), max=(+INF, +INF, 0.0),
        side_outer=Side(material=M.mt_metal01_cyan01),
        side_inner=Side(material=M.mt_plain01_gray02))

    sp_ball01 = Sphere(
        rad=3.0,
        side_outer=Side(material=M.mt_plain01_gray01),
        side_inner=Side(material=M.mt_plain01_gray02))

    ob_light01 = Array(objects=[
        obj(lt_light01),
        obj(sp_bulb01()),
    ])

    ob_camera01 = Array(objects=[
        obj(cm_camera01, rot=(-105.0, 0.0, 0.0), pos=(0.0, -12.0, 0.0)),
    ])

    tree = Array(
        objects=[
            obj(pl_floor01),                               # 0
            obj(hb_frame01, pos=(0.0, 0.0, 3.0)),          # 1
            obj(sp_ball01, pos=(0.0, 0.0, 3.0)),           # 2
            obj(ob_light01, pos=(0.0, -2.8, 3.3)),         # 3
            obj(ob_camera01, pos=(0.0, 0.0, 5.0)),         # 4
        ],
        relations=[
            Relation(2, REL_MINUS_OUTER, 1),
            Relation(1, REL_MINUS_OUTER, 2),
        ])

    # RT_OPTS_PT only (scn_test01.h:200-202): gamma+fresnel stay ON
    return SceneDef(root=tree, opts=OPTS_PT)
