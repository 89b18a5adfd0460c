"""Standard material library — port of data/materials/all_mat.h.

Values transcribed from the reference's static initializers
(all_mat.h:50-476): plain/metal/glass/light property sets with plain
colors, 2x2 tile texture, and the embedded crate texture.
"""

from __future__ import annotations

import numpy as np

from quadray_tpu.scene.schema import (
    Material, Texture, MAT_PLAIN, MAT_METAL, MAT_LIGHT)


def _plain(color, dff=1.0, spc=0.0, pow=1.0, rfl=0.0, trn=0.0, rfr=1.0,
           ext=0.0, tag=MAT_PLAIN, tex=None):
    return Material(tag=tag, tex=tex or Texture.pcolor(color), dff=dff,
                    spc=spc, pow=pow, rfl=rfl, trn=trn, rfr=rfr, ext=ext)


# 2x2 procedural tile texture (all_mat.h:72-76)
DT_TEX_TILE01 = np.array([[0xFFFFFFFF, 0xFF888800],
                          [0xFF222222, 0xFFFFFFFF]], np.uint32)

mt_plain01_tile01 = _plain(0, tex=Texture(data=DT_TEX_TILE01))
mt_plain03_tile01 = _plain(0, tex=Texture(data=DT_TEX_TILE01),
                           rfl=0.5, rfr=0.1)
mt_plain01_crate01 = _plain(0, tex=Texture(path="tex_crate01.bmp"))

mt_plain01_blue01 = _plain(0x4343F3)
mt_plain01_blue02 = _plain(0x0080D0)
mt_plain01_cyan01 = _plain(0xA0F0D0)
mt_plain01_gray01 = _plain(0x838383)
mt_plain01_gray02 = _plain(0x434343)
mt_plain01_green01 = _plain(0x2FAF3F)
mt_plain01_orange01 = _plain(0xFF8F00)
mt_plain02_orange01 = _plain(0xFF8F00, dff=0.5, spc=0.5, pow=32.0)
mt_plain01_pink01 = _plain(0xF6C6C6)
mt_plain02_pink01 = _plain(0xF6C6C6, dff=0.5, spc=0.5, pow=32.0)
mt_plain01_red01 = _plain(0xF63F2F)
mt_plain02_red01 = _plain(0xF63F2F, dff=0.5, spc=0.5, pow=32.0)
mt_plain01_white01 = _plain(0xAFAFAF)
mt_plain03_white01 = _plain(0xAFAFAF, rfl=0.5, rfr=0.1)

mt_metal01_cyan01 = _plain(0xA0F0D0, tag=MAT_METAL, rfl=0.5, ext=9.0)
mt_metal01_pink01 = _plain(0xF6C6C6, tag=MAT_METAL, rfl=0.5, ext=9.0)
mt_metal02_orange01 = _plain(0xFF8F00, tag=MAT_METAL, dff=0.5, spc=0.5,
                             pow=32.0, ext=9.0)
mt_metal02_pink01 = _plain(0xF6C6C6, tag=MAT_METAL, dff=0.5, spc=0.5,
                           pow=32.0, ext=9.0)
mt_metal03_nickel01 = _plain(0xA0A0A0, tag=MAT_METAL, rfl=1.0, ext=9.0)

mt_glass01_orange01 = _plain(0xFF8F00, trn=0.5, rfr=1.0, ext=0.67)
mt_air_to_glass01_blue02 = _plain(0x0080D0, trn=0.5, rfr=0.67)
mt_glass01_to_air_blue02 = _plain(0x0080D0, trn=0.5, rfr=1.5)
mt_air_to_glass03 = _plain(0xFFFFFF, trn=1.0, rfr=0.67)
mt_glass03_to_air = _plain(0xFFFFFF, trn=1.0, rfr=1.5)

mt_light01_bulb01 = _plain(0xFFFFFF, tag=MAT_LIGHT)
