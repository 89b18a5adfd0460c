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

# scenes ported so far; each entry: (module name, golden file, allowed bad px)
CASES = [
    ("test01", "ref_test01.bmp", 0),
]


def _build(name):
    import importlib
    mod = importlib.import_module(f"quadray_tpu.models.scenes.{name}")
    return mod.build()


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
