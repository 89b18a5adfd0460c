"""BMP image IO compatible with the reference's dumps.

The reference engine saves/loads 24-bit bottom-up BMPs (rtimag.cpp:47-330);
this module reads those golden dumps for differential tests and writes the
same format so outputs can be diffed with reference tools.
"""

from __future__ import annotations

import struct

import numpy as np


def load_bmp(path: str) -> np.ndarray:
    """Load a 24-bit BMP as (H, W, 3) uint8 RGB, top-down."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    off = struct.unpack_from("<I", data, 10)[0]
    hsz = struct.unpack_from("<I", data, 14)[0]
    if hsz >= 40:
        w, h = struct.unpack_from("<ii", data, 18)
        bpp = struct.unpack_from("<H", data, 28)[0]
    else:  # BITMAPCOREHEADER
        w, h = struct.unpack_from("<hh", data, 18)
        bpp = struct.unpack_from("<H", data, 24)[0]
    if bpp != 24:
        raise ValueError(f"{path}: only 24-bit BMPs supported (got {bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    img = np.frombuffer(data, np.uint8, count=stride * h, offset=off)
    img = img.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR -> RGB


def save_bmp(path: str, img: np.ndarray) -> None:
    """Save (H, W, 3) uint8 RGB as a 24-bit bottom-up BMP."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = img[..., ::-1]
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows[::-1].tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header + info + pix)


def frame_cmp(a: np.ndarray, b: np.ndarray, t_diff: int = 3,
              forgive_isolated: bool = True):
    """core_test-style frame comparison (core_test.cpp:96-145): per-channel
    abs diff must be <= t_diff, except isolated pixels (no 8-neighbour also
    failing) which are forgiven. Returns (n_bad, diff_map bool (H, W))."""
    d = np.abs(a.astype(np.int32) - b.astype(np.int32)).max(axis=-1)
    bad = d > t_diff
    if forgive_isolated:
        nb = np.zeros_like(bad)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                sh = np.roll(np.roll(bad, dy, 0), dx, 1)
                if dy > 0:
                    sh[:dy] = False
                elif dy < 0:
                    sh[dy:] = False
                if dx > 0:
                    sh[:, :dx] = False
                elif dx < 0:
                    sh[:, dx:] = False
                nb |= sh
        bad = bad & nb
    return int(bad.sum()), bad
