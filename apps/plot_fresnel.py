#!/usr/bin/env python
"""Fresnel/Schlick/gamma curve plotter — the analog of the reference's
`core_test -z` mode (engine.cpp:4098-4356 plot_funcs + the
plot_fresnel* routines, tracer.cpp:5411-5764).

Writes the same curve set as BMPs into dump/:
  plot_fresnel.bmp            exact dielectric, eta = 1/1.5 (entering)
  plot_fresnel_tir.bmp        exact dielectric, eta = 1.5 (exiting, TIR)
  plot_schlick.bmp            Schlick approximation, eta = 1/1.5
  plot_fresnel_metal_fast.bmp conductor fast,  n = 0.27, k = 2.77 (gold)
  plot_fresnel_metal_slow.bmp conductor exact, n = 0.27, k = 2.77
  plot_gamma.bmp              x^2 / sqrt(x) approx vs pow 2.2 / 2.0

The same constants as the reference's plot mode (c_rfr = 1/1.5,
c_rcp = 0.27, ext = 2.77; engine.cpp:4148-4270) so the curves are
directly comparable against the reference's dump/scr910..970.bmp.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def curves(width=800):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from quadray_tpu.ops.trace import (
        fresnel_metal_fast, fresnel_metal_slow, fresnel_schlick, _safe_div)

    # i_cos = -cos(s*i), s = 1.57/x_res (engine.cpp:4143-4156)
    s = 1.57 / width
    i = np.arange(width, dtype=np.float32)
    dot = jnp.asarray(-np.cos(s * i))              # negative cosine

    def dielectric(eta):
        eta = jnp.float32(eta)
        k = 1.0 - eta * eta + (eta * dot) ** 2
        sq = jnp.sqrt(jnp.maximum(k, 0.0))
        rs = _safe_div(eta * dot + sq, eta * dot - sq, 1.0)
        rp = _safe_div(dot + eta * sq, dot - eta * sq, 1.0)
        return jnp.clip(jnp.where(k < 0.0, 1.0,
                                  0.5 * (rs * rs + rp * rp)), 0.0, 1.0)

    def schlick(eta):
        eta = jnp.float32(eta)
        k = 1.0 - eta * eta + (eta * dot) ** 2
        sq = jnp.sqrt(jnp.maximum(k, 0.0))
        return jnp.clip(jnp.where(k < 0.0, 1.0,
                                  fresnel_schlick(dot, eta, sq)), 0.0, 1.0)

    rcp, ext2 = jnp.float32(0.27), jnp.float32(2.77 * 2.77)
    return {
        "fresnel": np.asarray(dielectric(1.0 / 1.5)),
        "fresnel_tir": np.asarray(dielectric(1.5)),
        "schlick": np.asarray(schlick(1.0 / 1.5)),
        "fresnel_metal_fast": np.asarray(
            jnp.clip(fresnel_metal_fast(dot, rcp, ext2), 0.0, 1.0)),
        "fresnel_metal_slow": np.asarray(
            jnp.clip(fresnel_metal_slow(dot, rcp, ext2), 0.0, 1.0)),
    }


def plot_to_frame(vals, width=800, height=480):
    """Reference-style plot: one red pixel column-wise at y =
    (1 - F) * (h - 1) on black (engine.cpp:4160-4168)."""
    frame = np.zeros((height, width, 3), np.uint8)
    ys = ((1.0 - vals) * (height - 1)).astype(int).clip(0, height - 1)
    frame[ys, np.arange(len(vals)) % width] = (255, 0, 0)
    return frame


def main():
    from quadray_tpu.utils.image import save_bmp
    os.makedirs("dump", exist_ok=True)
    for name, vals in curves().items():
        save_bmp(f"dump/plot_{name}.bmp", plot_to_frame(vals))
        print(f"dump/plot_{name}.bmp  F(0)={vals[0]:.4f} "
              f"F(89deg)={vals[-1]:.4f}")
    # gamma curves (engine.cpp:4340-4352): approx x^2 / sqrt vs pow 2.2
    x = np.linspace(0, 1, 800, dtype=np.float32)
    g = np.zeros((480, 800, 3), np.uint8)
    for curve, col in ((np.sqrt(x), (255, 0, 0)), (x * x, (255, 0, 0)),
                       (x ** (1 / 2.2), (0, 255, 0)),
                       (x ** 2.2, (0, 255, 0))):
        ys = ((1.0 - curve) * 479).astype(int).clip(0, 479)
        g[ys, np.arange(800)] = col
    from quadray_tpu.utils.image import save_bmp as sb
    sb("dump/plot_gamma.bmp", g)
    print("dump/plot_gamma.bmp")


if __name__ == "__main__":
    main()
