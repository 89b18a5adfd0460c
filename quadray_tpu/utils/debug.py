"""Numeric debugging tools — the RT_QUAD_DEBUG / RT_SHOW_* analogs.

The reference can capture the full quadric-solver state of a chosen
pixel (tracer.h:289-406, tracer.cpp:4465-4516, RT_QUAD_DEBUG) and paint
diagnostic overlays (SHOW_TILES/SHOW_BOUND, tracer.cpp:158-420). Here
the equivalents are pure functions over the jnp tracer — exactly the
data a kernel-vs-golden investigation needs (these drove the round-3
test13/test16 analyses).
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax.numpy as jnp

from quadray_tpu.scene.compile import SceneArrays
from quadray_tpu.ops.rays import camera_rays
from quadray_tpu.ops.trace import (
    TraceConfig, intersect, _make_body, _apply3, BIG)

F32 = jnp.float32
I32 = jnp.int32


def solver_state(sc: SceneArrays, org, d):
    """Per-surface quadric solver state for ONE ray: the inf_* debug
    block analog (a, b, c, disc, both root candidates). org/d: (3,)."""
    org = jnp.asarray(org, F32)[None, :]
    d = jnp.asarray(d, F32)[None, :]
    rel = org[:, None, :] - sc.s_pos[None, :, :]
    inv_b = sc.s_inv[None, :, :, :]
    o_l = _apply3(inv_b, rel[..., 0], rel[..., 1], rel[..., 2])
    d_l = _apply3(inv_b, d[:, None, 0], d[:, None, 1], d[:, None, 2])
    sci = sc.s_sci[None, :, :]
    scjh = sc.s_scjh[None, :, :]
    a = jnp.sum(sci * d_l * d_l, -1)
    b = jnp.sum((sci * o_l - scjh) * d_l, -1)
    c = (jnp.sum(sci * o_l * o_l, -1) - 2.0 * jnp.sum(scjh * o_l, -1)
         - sc.s_sciw[None, :])
    disc = b * b - a * c
    rows = []
    for s in range(sc.s_pos.shape[0]):
        if int(sc.s_kind[s]) == 0:
            continue
        rows.append(dict(
            srf=s, kind=int(sc.s_kind[s]),
            a=float(a[0, s]), b=float(b[0, s]), c=float(c[0, s]),
            disc=float(disc[0, s])))
    return rows


def debug_pixel(sc: SceneArrays, px: int, py: int, width: int, height: int,
                cfg: TraceConfig = TraceConfig(stack=4, max_segments=16),
                log=None) -> List[dict]:
    """Trace ONE pixel's full path, returning (and optionally logging)
    per-segment records: hit surface/side/t, throughput, accumulated
    color, origin bookkeeping — the quad-debug pixel capture."""
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, width, height, 1)
    idx = py * width + px
    org = jnp.broadcast_to(org1[None, :], (1, 3))
    d = dirs[idx:idx + 1]
    t_min = jnp.full((1,), sc.cam_pov, F32)
    D = cfg.stack
    n = 1
    st = dict(
        org=org, dir=d, thr=jnp.ones((n, 3), F32),
        depth=jnp.zeros((n,), I32),
        osrf=jnp.full((n,), -1, I32), oside=jnp.ones((n,), I32),
        thru=jnp.zeros((n,), bool), oloc=jnp.zeros((n, 3), F32),
        tmin=t_min, active=jnp.ones((n,), bool),
        acc=jnp.zeros((n, 3), F32), sp=jnp.zeros((n,), I32),
        st_org=jnp.zeros((n, D, 3), F32), st_dir=jnp.zeros((n, D, 3), F32),
        st_thr=jnp.zeros((n, D, 3), F32),
        st_depth=jnp.zeros((n, D), I32), st_srf=jnp.zeros((n, D), I32),
        st_side=jnp.zeros((n, D), I32), st_oloc=jnp.zeros((n, D, 3), F32),
        it=jnp.zeros((), I32))
    body = _make_body(sc, cfg, n, D)
    records = []
    for seg in range(cfg.max_segments):
        if not bool(st["active"][0]):
            break
        h = intersect(sc, st["org"], st["dir"], st["tmin"],
                      jnp.full((n,), BIG), st["osrf"], st["oside"],
                      st["thru"], origin_loc=st["oloc"])
        rec = dict(
            segment=seg,
            srf=int(h["srf"][0]), side=int(h["side"][0]),
            t=float(h["t"][0]),
            hit=bool(h["hit"][0]),
            x=np.asarray(h["x"][0]).tolist(),
            thr=np.asarray(st["thr"][0]).tolist(),
            acc=np.asarray(st["acc"][0]).tolist(),
            depth=int(st["depth"][0]), thru=bool(st["thru"][0]),
            osrf=int(st["osrf"][0]), sp=int(st["sp"][0]))
        records.append(rec)
        if log:
            log(f"seg{seg}: srf={rec['srf']} side={rec['side']} "
                f"t={rec['t']:.6f} depth={rec['depth']} "
                f"thru={rec['thru']} thr={rec['thr']} acc={rec['acc']}")
        st = body(st)
    records.append(dict(segment="final",
                        acc=np.asarray(st["acc"][0]).tolist()))
    if log:
        log(f"final acc = {records[-1]['acc']}")
    return records


def overlay_hit_ids(sc: SceneArrays, width: int, height: int) -> np.ndarray:
    """SHOW_TILES analog: color each pixel by its primary hit surface id
    (hashed to RGB) — visualizes the scene structure / permutation."""
    org1, dirs = camera_rays(sc.cam_pos, sc.cam_hor, sc.cam_ver,
                             sc.cam_nrm, sc.cam_pov, width, height, 1)
    n = dirs.shape[0]
    org = jnp.broadcast_to(org1[None, :], (n, 3))
    t_min = jnp.full((n,), sc.cam_pov, F32)
    h = intersect(sc, org, dirs, t_min, jnp.full((n,), BIG),
                  jnp.full((n,), -1, I32), jnp.ones((n,), I32),
                  jnp.zeros((n,), bool))
    ids = np.asarray(h["srf"])
    rgb = np.zeros((n, 3), np.uint8)
    m = ids >= 0
    rgb[m, 0] = (ids[m] * 97 + 31) % 256
    rgb[m, 1] = (ids[m] * 57 + 101) % 256
    rgb[m, 2] = (ids[m] * 17 + 201) % 256
    return rgb.reshape(height, width, 3)
