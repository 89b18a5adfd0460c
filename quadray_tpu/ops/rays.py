"""Primary-ray generation with supersampling offsets.

Reference semantics: rt_Scene::render ray steppers (engine.cpp:3032-3055,
3256-3259) aim at pixel centers of an x_res-normalized screen plane at
distance ``pov`` along the camera normal; AA packs 2x/4x rotated-grid
sub-samples into the SIMD lanes (render_slice, engine.cpp:3465-3550).
Here the "packet" is the whole image: rays come out as flat (N, 3) arrays
with N = W*H*spp.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32

# rotated-grid AA sub-pixel offsets (engine.cpp:3480-3550, RT_FSAA_REGULAR=0,
# as = 0.25, ar = 0.08)
_AS, _AR = 0.25, 0.08
AA_OFFSETS = {
    1: [(0.0, 0.0)],
    # 2x "alternating" pattern uses offsets (-ar+as, +ar+as), (+ar-as, -ar-as)
    2: [(-_AR + _AS, +_AR + _AS), (+_AR - _AS, -_AR - _AS)],
    4: [(-_AR - _AS, +_AR - _AS), (-_AR + _AS, -_AR - _AS),
        (+_AR - _AS, +_AR + _AS), (+_AR + _AS, -_AR + _AS)],
}


def camera_rays(cam_pos, cam_hor, cam_ver, cam_nrm, cam_pov,
                width: int, height: int, fsaa: int = 1):
    """Return (org (3,), dirs (H*W*S, 3)) for the full frame.

    dir(x, y) = nrm*pov + hor*((x+0.5+dx)/W - 0.5)
                        + ver*((y+0.5+dy)/W - 0.5*H/W)
    matching engine.cpp:3040-3046 (corner aim) + 3256-3259 (pixel scale and
    half-pixel centering). Note both axes divide by W (aspect handling).
    """
    offs = AA_OFFSETS[fsaa]
    xs = jnp.arange(width, dtype=F32)
    ys = jnp.arange(height, dtype=F32)
    factor = 1.0 / width
    aspect = height / width
    dirs = []
    for (dx, dy) in offs:
        u = (xs + (0.5 + dx)) * factor - 0.5            # (W,)
        v = (ys + (0.5 + dy)) * factor - 0.5 * aspect   # (H,)
        d = (cam_nrm[None, None, :] * cam_pov
             + cam_hor[None, None, :] * u[None, :, None]
             + cam_ver[None, None, :] * v[:, None, None])  # (H, W, 3)
        dirs.append(d)
    # (H, W, S, 3) -> (H*W*S, 3): subsample axis last so the per-pixel
    # reduction is a simple reshape-mean
    dall = jnp.stack(dirs, axis=2)
    return cam_pos, dall.reshape(-1, 3)


def resolve_aa(colors, width: int, height: int, fsaa: int):
    """Average sub-samples back to (H, W, 3) (the pairwise-horizontal-add
    reduction of tracer.cpp:5241-5308, done as a mean)."""
    return colors.reshape(height, width, fsaa, 3).mean(axis=2)


def tile_shape(fsaa: int, block: int):
    """Screen-tile dims (TH, TW) with TH*TW*fsaa == block: the on-chip
    ray block covers a compact, near-square 2D screen window instead of
    a full-width scanline strip, so block-level culling (the tilebuffer
    analog, engine.cpp:3129-3253) has tight ray bundles. block=1024
    (the 8-sublane kernel block) gives 32x32-px windows — the fine
    granularity the per-block surface candidate lists key on."""
    n = block // fsaa
    p = n.bit_length() - 1
    th = 1 << (p // 2)
    tw = n // th
    return th, tw


def camera_rays_tiles2d(cam_pos, cam_hor, cam_ver, cam_nrm, cam_pov,
                        width: int, height: int, fsaa: int, block: int):
    """Primary rays in screen-tile order: seven (R, 128) f32 tiles where
    each consecutive ``block`` rays form one (TH, TW) pixel window of the
    frame (row-major tiles, row-major pixels within a tile, sub-samples
    innermost). Out-of-frame pad pixels get tmin=1e30 (never hit, retire
    after one segment). Use untile_frame to map kernel output back to
    (H, W) pixel planes."""
    offs = AA_OFFSETS[fsaa]
    th, tw = tile_shape(fsaa, block)
    ntx = -(-width // tw)
    nty = -(-height // th)
    w2, h2 = ntx * tw, nty * th
    xs = jnp.arange(w2, dtype=F32)
    ys = jnp.arange(h2, dtype=F32)
    factor = 1.0 / width
    aspect = height / width

    def reorder(plane):  # (H2, W2, S) -> (R, 128)
        return (plane.reshape(nty, th, ntx, tw, fsaa)
                .transpose(0, 2, 1, 3, 4)
                .reshape(-1, 128))

    comps = []
    for c in range(3):
        planes = []
        for (dx, dy) in offs:
            u = (xs + (0.5 + dx)) * factor - 0.5
            v = (ys + (0.5 + dy)) * factor - 0.5 * aspect
            planes.append(cam_nrm[c] * cam_pov
                          + cam_hor[c] * u[None, :]
                          + cam_ver[c] * v[:, None])          # (H2, W2)
        comps.append(reorder(jnp.stack(planes, axis=2)))
    shape = comps[0].shape
    org = [jnp.full(shape, cam_pos[c], F32) for c in range(3)]
    inframe = ((ys < height)[:, None] & (xs < width)[None, :])  # (H2, W2)
    tmin = jnp.where(inframe, cam_pov, 1e30)[..., None]
    tmin = reorder(jnp.broadcast_to(tmin, (h2, w2, fsaa)).astype(F32))
    return (*org, *comps, tmin)


def untile_frame(comp, width: int, height: int, fsaa: int, block: int):
    """Inverse of camera_rays_tiles2d's layout for one (R, 128) color
    component: returns the (H, W) per-pixel plane (sub-samples averaged,
    values clipped to [0, 1])."""
    th, tw = tile_shape(fsaa, block)
    ntx = -(-width // tw)
    nty = -(-height // th)
    plane = (comp.reshape(nty, ntx, th, tw, fsaa)
             .transpose(0, 2, 1, 3, 4)
             .reshape(nty * th, ntx * tw, fsaa))
    return jnp.clip(plane[:height, :width], 0.0, 1.0).mean(axis=2)


def camera_rays_tiled(cam_pos, cam_hor, cam_ver, cam_nrm, cam_pov,
                      width: int, height: int, fsaa: int, block: int):
    """Primary rays in the Pallas kernel's native layout: seven (R, 128)
    f32 tiles (ox oy oz dx dy dz tmin), flat count padded to a multiple
    of ``block``; padding rays get tmin=1e30 so they never hit.

    Component-wise (SoA) generation: building (N, 3) vectors and slicing
    columns costs ~0.8 ms of strided HBM traffic per frame on TPU — the
    tiled form is a contiguous reshape instead.
    """
    offs = AA_OFFSETS[fsaa]
    n = width * height * fsaa
    npad = ((n + block - 1) // block) * block
    pad = npad - n
    xs = jnp.arange(width, dtype=F32)
    ys = jnp.arange(height, dtype=F32)
    factor = 1.0 / width
    aspect = height / width
    comps = []
    for c in range(3):
        planes = []
        for (dx, dy) in offs:
            u = (xs + (0.5 + dx)) * factor - 0.5            # (W,)
            v = (ys + (0.5 + dy)) * factor - 0.5 * aspect   # (H,)
            planes.append(cam_nrm[c] * cam_pov
                          + cam_hor[c] * u[None, :]
                          + cam_ver[c] * v[:, None])        # (H, W)
        d = jnp.stack(planes, axis=2).reshape(-1)           # (N,)
        if pad:
            d = jnp.concatenate([d, jnp.ones((pad,), F32)])
        comps.append(d.reshape(npad // 128, 128))
    shape = comps[0].shape
    org = [jnp.full(shape, cam_pos[c], F32) for c in range(3)]
    tmin = jnp.full((n,), cam_pov, F32)
    if pad:
        tmin = jnp.concatenate([tmin, jnp.full((pad,), 1e30, F32)])
    tmin = tmin.reshape(shape)
    return (*org, *comps, tmin)
