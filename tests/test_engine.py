"""Engine facade tests: animated update path + API surface."""

import numpy as np

from quadray_tpu.engine import Platform, Scene
from quadray_tpu.models.scenes import demos
from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene
from quadray_tpu.ops.trace import render, to_frame, TraceConfig

W, H = 64, 40


def test_animated_update_jit_matches_eager_recompile():
    """After the first frame, Scene.update(t) runs a jitted numeric pass
    (no Python hierarchy walk); its frames must be bit-identical to a
    from-scratch eager recompile at the same time."""
    sdef = demos.build("demo01")
    sc = Scene(sdef, W, H)
    f0 = sc.render(0.0)      # first update: eager structure pass
    sc.render(700.0)         # compiles the jitted numeric pass
    f2 = sc.render(1400.0)   # cached jitted pass

    eff = S.OPTS_FULL & ~sdef.opts
    sc_e = compile_scene(S.SceneDef(root=sdef.root, opts=eff), time=1400.0)
    img = render(sc_e, W, H, 1, TraceConfig())
    f2_ref = np.asarray(to_frame(img, sc_e.use_gamma))
    assert np.array_equal(f2, f2_ref)
    assert not np.array_equal(f0, f2), "animators should move the scene"


def test_fsaa_render_shapes():
    sdef = demos.build("demo01")
    for fsaa in (1, 2, 4):
        sc = Scene(sdef, W, H, pfm=Platform(fsaa=fsaa))
        f = sc.render(0.0)
        assert f.shape == (H, W, 3)


def test_save_frame_roundtrip(tmp_path):
    from quadray_tpu.utils.image import load_bmp
    sdef = demos.build("demo01")
    sc = Scene(sdef, W, H)
    sc.render(0.0)
    p = str(tmp_path / "frame.bmp")
    sc.save_frame(p)
    back = load_bmp(p)
    assert np.array_equal(back, sc.frame)


def test_camera_update_action():
    """rt_Camera::update_action semantics (object.cpp:495-573): forward
    motion moves along the heading, rotations clamp pitch, and frames
    actually change."""
    from quadray_tpu.engine import (
        Scene, CAMERA_MOVE_FORWARD, CAMERA_ROTATE_LEFT, CAMERA_ROTATE_UP)
    from quadray_tpu.models.scenes.loader import load_scene

    sc = Scene(load_scene("test01"), W, H)
    f0 = sc.render(0.0)
    p0 = None
    sc.update_action(100.0, CAMERA_MOVE_FORWARD)
    p0 = list(sc.camera.pos)
    f1 = sc.render(100.0)
    assert not np.array_equal(f0, f1)
    sc.update_action(200.0, CAMERA_ROTATE_LEFT)
    f2 = sc.render(200.0)
    assert not np.array_equal(f1, f2)
    assert sc.camera.rot[2] != 0.0
    # pitch clamp: ROTATE_UP cannot push rot[0] above 0
    for t in range(3, 40):
        sc.update_action(t * 100.0, CAMERA_ROTATE_UP)
        sc.camera.advance(t * 100.0)
    assert sc.camera.rot[0] <= 0.0


def test_debug_tools():
    """RT_QUAD_DEBUG analogs: per-pixel path capture, per-ray solver
    state, hit-id overlay (utils/debug.py)."""
    import numpy as np
    from quadray_tpu.models.scenes.loader import load_scene
    from quadray_tpu.scene import schema as S
    from quadray_tpu.scene.compile import compile_scene
    from quadray_tpu.utils.debug import (
        debug_pixel, solver_state, overlay_hit_ids)

    sd = load_scene("test01")
    sc = compile_scene(S.SceneDef(root=sd.root,
                                  opts=S.OPTS_FULL & ~sd.opts))
    recs = debug_pixel(sc, 32, 20, 64, 40)
    assert recs[0]["hit"] and recs[0]["srf"] >= 0
    assert recs[-1]["segment"] == "final"
    rows = solver_state(sc, (0.0, -10.0, 1.0), (0.0, 1.0, 0.0))
    assert rows and all(np.isfinite(r["disc"]) for r in rows)
    img = overlay_hit_ids(sc, 64, 40)
    assert img.shape == (40, 64, 3) and img.max() > 0


def test_render_cli_scripted_flythrough(tmp_path):
    """The RooT-analog scripted interactive loop (apps/render_cli.py -k):
    a demo01 flythrough driven by key tokens must move the camera (frames
    change vs the static render) and honor f4 frame saves."""
    import subprocess
    import sys as _sys
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, _os.path.join(repo, "apps", "render_cli.py"),
         "-c", "-p", "-x", "64", "-y", "40", "-f", "4",
         "-k", "w+w,f4,w+left,f4"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**_os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    from quadray_tpu.utils.image import load_bmp
    f0 = load_bmp(str(tmp_path / "dump" / "scr000.bmp"))
    f1 = load_bmp(str(tmp_path / "dump" / "scr001.bmp"))
    assert f0.shape == (40, 64, 3)
    # camera moved forward + rotated between the saves: pixels change
    assert (f0 != f1).any()
