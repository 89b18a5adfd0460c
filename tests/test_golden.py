"""Differential tests vs reference C-engine golden renders.

The analog of test/core_test.cpp's frame comparison (core_test.cpp:96-145):
golden BMPs in golden/ were rendered by the reference built from
/root/reference (see golden/baseline_ref.json); frames must match within
t_diff=3 per channel with isolated pixels forgiven.
"""

import os

import numpy as np
import pytest

from quadray_tpu.engine import Scene
from quadray_tpu.utils.image import load_bmp, frame_cmp

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")

# (scene name, golden file, allowed bad px). Non-zero budgets are known
# gaps being driven to 0; they act as regression ceilings meanwhile.
CASES = [
    ("test01", "ref_test01.bmp", 0),
    ("test02", "ref_test02.bmp", 0),
    ("test03", "ref_test03.bmp", 0),
    ("test04", "ref_test04.bmp", 0),
    ("test05", "ref_test05.bmp", 0),
    ("test06", "ref_test06.bmp", 0),
    ("test07", "ref_test07.bmp", 0),
    ("test08", "ref_test08.bmp", 0),
    ("test09", "ref_test09.bmp", 0),
    ("test10", "ref_test10.bmp", 0),
    ("test11", "ref_test11.bmp", 8),     # actual 6
    ("test12", "ref_test12.bmp", 0),
    ("test13", "ref_test13.bmp", 0),     # exact since the no-Fresnel TIR
    # fold fix (round 5, see KNOWN_ISSUES.md)
    ("test14", "ref_test14.bmp", 3),     # actual 2
    ("test15", "ref_test15.bmp", 0),
    ("test16", "ref_test16.bmp", 45),    # actual 38 CPU / 42 TPU: clip
    # boundary flips under scaler arrays, see KNOWN_ISSUES.md
    ("test17", "ref_test17.bmp", 0),
    ("test18", "ref_test18.bmp", 0),     # exact since metal Fresnel
]


def _build(name):
    from quadray_tpu.models.scenes.loader import load_scene
    return load_scene(name)


@pytest.mark.parametrize("name,golden,allowed", CASES)
def test_vs_reference_golden(name, golden, allowed):
    ref = load_bmp(os.path.join(GOLDEN, golden))
    h, w = ref.shape[:2]
    sc = Scene(_build(name), w, h)
    frame = sc.render(0.0)
    nbad, _ = frame_cmp(ref, frame, t_diff=3)
    assert nbad <= allowed, f"{name}: {nbad} bad pixels vs {golden}"


def test_render_small_smoke():
    sc = Scene(_build("test01"), 80, 48)
    f = sc.render(0.0)
    assert f.shape == (48, 80, 3)
    assert f.max() > 0
