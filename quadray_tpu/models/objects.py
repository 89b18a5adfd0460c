"""Shared cameras/lights/objects — port of data/objects/all_obj.h."""

from __future__ import annotations

from quadray_tpu.scene.schema import Camera, Light, Sphere, Side
from quadray_tpu.models import materials as M

# all_obj.h:166-183
cm_camera01 = Camera(col=0xFFFFFF, amb=0.05, pov=1.0,
                     dps=(0.5, 0.5, 0.5), drt=(1.5, 1.5, 1.5))

# all_obj.h:190-201
lt_light01 = Light(col=0xFFFFFF, amb=0.01, src=1.7,
                   rng=0.0, cnt=0.7, lnr=0.5, qdr=0.1)


def sp_bulb01():
    # all_obj.h:204-226: tiny emissive sphere marking the light position
    return Sphere(rad=0.05,
                  side_outer=Side(material=M.mt_light01_bulb01),
                  side_inner=Side(material=M.mt_light01_bulb01))
