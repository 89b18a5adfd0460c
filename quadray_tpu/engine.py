"""Engine facade: Platform + Scene — the user-level API.

Analog of rt_Platform (engine.h:79-156) and rt_Scene (engine.h:229-362)
minus everything the TPU stack subsumes: no thread pool (SPMD jit dispatch),
no SIMD target switching (XLA targets the chip), no tilebuffer (brute-force
masks), no per-frame heap (XLA buffers). What remains is the real API
surface: scene management, per-frame update (animators -> scene recompile),
render, fsaa/opt toggles, frame save and state dump.
"""

from __future__ import annotations

import time as _time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from quadray_tpu.scene import schema as S
from quadray_tpu.scene.compile import compile_scene, SceneArrays
from quadray_tpu.ops.trace import TraceConfig, render as _render, to_frame


# camera action codes (RT_CAMERA_*, format.h / RooT key bindings)
CAMERA_MOVE_UP = 1
CAMERA_MOVE_DOWN = 2
CAMERA_MOVE_LEFT = 3
CAMERA_MOVE_RIGHT = 4
CAMERA_MOVE_BACK = 5
CAMERA_MOVE_FORWARD = 6
CAMERA_ROTATE_LEFT = 7
CAMERA_ROTATE_RIGHT = 8
CAMERA_ROTATE_UP = 9
CAMERA_ROTATE_DOWN = 10


class CameraController:
    """Interactive camera state (rt_Camera::update_action,
    object.cpp:495-573): WASD-style moves scaled by the camera's dps
    speeds in the heading frame (hor_sin/cos of the Z rotation), arrow
    rotations scaled by drt with the reference's pitch clamps."""

    def __init__(self, trm: S.Transform3D, cam: S.Camera):
        self.pos = list(float(v) for v in trm.pos)
        self.rot = list(float(v) for v in trm.rot)
        self.scl = tuple(trm.scl)
        self.dps = tuple(float(v) for v in cam.dps)
        self.drt = tuple(float(v) for v in cam.drt)
        self._last_time = 0.0

    def update_action(self, time: float, action: int):
        import math as _m
        t = (time - self._last_time) / 50.0
        hor_sin = _m.sin(_m.radians(self.rot[2]))
        hor_cos = _m.cos(_m.radians(self.rot[2]))
        dps, drt = self.dps, self.drt
        if action == CAMERA_MOVE_UP:
            self.pos[2] += dps[2] * t
        elif action == CAMERA_MOVE_DOWN:
            self.pos[2] -= dps[2] * t
        elif action == CAMERA_MOVE_LEFT:
            self.pos[0] -= dps[0] * t * hor_cos
            self.pos[1] -= dps[0] * t * hor_sin
        elif action == CAMERA_MOVE_RIGHT:
            self.pos[0] += dps[0] * t * hor_cos
            self.pos[1] += dps[0] * t * hor_sin
        elif action == CAMERA_MOVE_BACK:
            self.pos[0] += dps[1] * t * hor_sin
            self.pos[1] -= dps[1] * t * hor_cos
        elif action == CAMERA_MOVE_FORWARD:
            self.pos[0] -= dps[1] * t * hor_sin
            self.pos[1] += dps[1] * t * hor_cos
        elif action == CAMERA_ROTATE_LEFT:
            self.rot[2] += drt[0] * t
            if self.rot[2] >= 180.0:
                self.rot[2] -= 360.0
        elif action == CAMERA_ROTATE_RIGHT:
            self.rot[2] -= drt[0] * t
            if self.rot[2] <= -180.0:
                self.rot[2] += 360.0
        elif action == CAMERA_ROTATE_UP:
            if self.rot[0] < 0.0:
                self.rot[0] = min(self.rot[0] + drt[1] * t, 0.0)
        elif action == CAMERA_ROTATE_DOWN:
            if self.rot[0] > -180.0:
                self.rot[0] = max(self.rot[0] - drt[1] * t, -180.0)

    def advance(self, time: float):
        self._last_time = time

    def trm(self) -> S.Transform3D:
        return S.Transform3D(scl=self.scl, rot=tuple(self.rot),
                             pos=tuple(self.pos))


def _find_camera(arr: S.Array):
    """LAST (trm, Camera) in hierarchy order — index 0 of the camera
    registry, which prepends on construction (object.cpp:429-431); the
    scene renders cam_head (engine.cpp:2923)."""
    found = None
    for ob in arr.objects:
        if isinstance(ob.item, S.Camera):
            found = (ob.trm, ob.item)
        if isinstance(ob.item, S.Array):
            sub = _find_camera(ob.item)
            if sub is not None:
                found = sub
    return found


class Platform:
    """Owns global config (fsaa, depth) and the scene list
    (rt_Platform, engine.cpp:512-798)."""

    def __init__(self, fsaa: int = 1, depth: int = 10,
                 use_pallas: Optional[bool] = None):
        self.fsaa = fsaa
        self.depth = depth
        self.use_pallas = use_pallas  # None = auto (TPU backend)
        self.scenes = []

    def add(self, scene: "Scene"):
        self.scenes.append(scene)
        return scene

    def set_fsaa(self, fsaa: int):
        assert fsaa in (1, 2, 4)
        self.fsaa = fsaa


class Scene:
    """A scene instance bound to a framebuffer size (rt_Scene analog)."""

    def __init__(self, sdef: S.SceneDef, width: int, height: int,
                 pfm: Optional[Platform] = None, cam_index: int = 0):
        self.sdef = sdef
        self.width = width
        self.height = height
        self.pfm = pfm or Platform()
        self.cam_index = cam_index
        # effective opts: FULL minus the flags the scene def turns off
        # (rt_Scene ctor engine.cpp:2873 + set_opts engine.cpp:3714-3724)
        self.opts = S.OPTS_FULL & ~sdef.opts
        self._arrays: Optional[SceneArrays] = None
        self._update_jit = None
        self._update_jit_cam = False
        self._struct = None
        self.camera: Optional[CameraController] = None
        self._time = 0.0
        self.frame = np.zeros((height, width, 3), np.uint8)
        # progressive path-tracer state (pseed/ptr planes analog,
        # engine.cpp:2875-2899, 3670-3700)
        self.pt_on = False
        self._pt_acc = None
        self._pt_samples = 0
        self._pt_seeds = None

    # -- update pipeline (phase 0.5-3 analog). The FIRST update runs the
    # full host-side structure pass (hierarchy walk + relation compile);
    # every later update at a new time is one jitted numeric pass
    # f(t) -> SceneArrays (animators are pure functions of t, the
    # structure cannot change), so animated frames do no per-frame Python
    # hierarchy walk (SURVEY §7.1 "scene compiler" row)
    def update(self, t: float = 0.0):
        self._time = t
        cam_trm = self.camera.trm() if self.camera is not None else None
        if self._arrays is None:
            self._arrays = compile_scene(
                S.SceneDef(root=self.sdef.root, opts=self.opts), time=t,
                cam_index=self.cam_index, cam_trm=cam_trm)
            self._struct = self._kernel_struct(self._arrays)
        else:
            interactive = self.camera is not None
            if (self._update_jit is None
                    or self._update_jit_cam != interactive):
                from quadray_tpu.scene.compile import _compile_scene_impl
                sdef = S.SceneDef(root=self.sdef.root, opts=self.opts)
                shapes = dict(
                    ns=self._arrays.s_kind.shape[0],
                    nc=self._arrays.c_op.shape[1],
                    nl=self._arrays.l_on.shape[0])
                if interactive:
                    def _upd(tt, cam_pos, cam_rot, cam_scl):
                        trm = S.Transform3D(
                            scl=tuple(cam_scl), rot=tuple(cam_rot),
                            pos=tuple(cam_pos))
                        return _compile_scene_impl(
                            sdef, tt, self.cam_index, cam_trm=trm,
                            **shapes)
                else:
                    def _upd(tt):
                        return _compile_scene_impl(
                            sdef, tt, self.cam_index, **shapes)
                self._update_jit = jax.jit(_upd)
                self._update_jit_cam = interactive
            if interactive:
                self._arrays = self._update_jit(
                    jnp.float32(t),
                    jnp.asarray(cam_trm.pos, jnp.float32),
                    jnp.asarray(cam_trm.rot, jnp.float32),
                    jnp.asarray(cam_trm.scl, jnp.float32))
            else:
                self._arrays = self._update_jit(jnp.float32(t))
        if self.camera is not None:
            self.camera.advance(t)
        return self._arrays

    def _base_cam_trm(self) -> S.Transform3D:
        found = _find_camera(self.sdef.root)
        if found is None:
            raise ValueError("scene has no camera")
        return found[0]

    def update_action(self, t: float, action: int):
        """Interactive camera action (rt_Scene::update + update_action,
        engine.cpp:2968 + object.cpp:495-573)."""
        if self.camera is None:
            found = _find_camera(self.sdef.root)
            if found is None:
                raise ValueError("scene has no camera")
            self.camera = CameraController(*found)
            self.camera.advance(self._time)
        self.camera.update_action(t, action)

    def _kernel_struct(self, sc: SceneArrays):
        """Static kernel structure, extracted once (it is time-invariant
        for a scene; per-frame SceneArrays reuse it)."""
        if not self._use_pallas():
            return None
        import quadray_tpu.ops.pallas_kernel as pk
        return pk._get_struct(sc)

    def _use_pallas(self) -> bool:
        if self.pfm.use_pallas is not None:
            return self.pfm.use_pallas
        return jax.devices()[0].platform == "tpu"

    @property
    def arrays(self) -> SceneArrays:
        if self._arrays is None:
            self.update(self._time)
        return self._arrays

    def set_pton(self, on: bool):
        """Toggle progressive path tracing (set_pton analog,
        engine.cpp:3729-3742); resets accumulation on enable."""
        if on and (self.opts & S.OPTS_PT):
            on = False
        if on and not self.pt_on:
            self.reset_pt()
        self.pt_on = on
        return self.pt_on

    def reset_pt(self):
        import jax.numpy as jnp
        from quadray_tpu.ops.pt import init_seeds
        n = self.width * self.height
        self._pt_acc = jnp.zeros((n, 3), jnp.float32)
        self._pt_samples = 0
        self._pt_seeds = init_seeds(n)

    def render_pt_pass(self, passes: int = 1) -> np.ndarray:
        """Accumulate `passes` path-traced samples/pixel; return frame.
        Uses the megakernel's in-kernel PT mode on TPU (bitwise-equal to
        the jnp estimator, same seeds)."""
        import jax.numpy as jnp
        from quadray_tpu.ops.pt import trace_pt, pt_camera_rays
        sc = self.arrays
        if self._pt_acc is None:
            self.reset_pt()
        cfg = TraceConfig(depth=self.pfm.depth)
        if self._use_pallas():
            from quadray_tpu.ops.pallas_kernel import trace_pt_pallas \
                as _trace_pt_fn
        else:
            _trace_pt_fn = trace_pt
        for _ in range(passes):
            org, dirs, self._pt_seeds = pt_camera_rays(
                sc, self.width, self.height, self._pt_seeds)
            n = dirs.shape[0]
            t_min = jnp.full((n,), sc.cam_pov, jnp.float32)
            rad, self._pt_seeds = _trace_pt_fn(sc, org, dirs, t_min,
                                               self._pt_seeds, cfg)
            self._pt_acc = self._pt_acc + rad
            self._pt_samples += 1
        img = jnp.clip(self._pt_acc / max(self._pt_samples, 1), 0.0, 1.0)
        img = img.reshape(self.height, self.width, 3)
        self.frame = np.asarray(to_frame(img, sc.use_gamma))
        return self.frame

    def render(self, t: Optional[float] = None) -> np.ndarray:
        """Render a frame at time t; returns (H, W, 3) uint8. Uses the
        Pallas megakernel on TPU, the jnp tracer elsewhere."""
        if t is not None or self._arrays is None:
            self.update(t if t is not None else self._time)
        if self.pt_on:
            return self.render_pt_pass()
        sc = self.arrays
        cfg = TraceConfig(depth=self.pfm.depth)
        if self._struct is not None:
            import quadray_tpu.ops.pallas_kernel as pk
            img = pk.render_pallas(sc, self.width, self.height,
                                   self.pfm.fsaa, cfg, struct=self._struct)
        else:
            img = _render(sc, self.width, self.height, self.pfm.fsaa, cfg)
        self.frame = np.asarray(to_frame(img, sc.use_gamma))
        return self.frame

    def render_linear(self, t: Optional[float] = None) -> jnp.ndarray:
        if t is not None or self._arrays is None:
            self.update(t if t is not None else self._time)
        cfg = TraceConfig(depth=self.pfm.depth)
        return _render(self.arrays, self.width, self.height, self.pfm.fsaa,
                       cfg)

    def save_frame(self, path: str):
        from quadray_tpu.utils.image import save_bmp
        save_bmp(path, self.frame)

    def set_opts(self, opts: int):
        self.opts = opts & ~self.sdef.opts
        self._arrays = None
        self._update_jit = None
        self._struct = None

    def print_state(self, log=print):
        """State dump for reproduction (print_state analog,
        engine.cpp:47-418)."""
        sc = self.arrays
        log(f"scene {self.width}x{self.height} t={self._time}")
        for k in ("s_tag", "s_pos", "s_sci", "s_scjh", "s_sciw"):
            log(f"{k} = {np.asarray(getattr(sc, k))!r}")
        for k in ("l_pos", "l_col", "cam_pos", "cam_hor", "cam_ver",
                  "cam_nrm"):
            log(f"{k} = {np.asarray(getattr(sc, k))!r}")
