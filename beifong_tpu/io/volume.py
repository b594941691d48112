"""Mitsuba binary volume (`.vol`) I/O.

Format (reference `src/textures/volume_data.h::read_binary_volume_data`):
  bytes 0-2   'VOL'
  byte  3     version (3)
  int32       data type (1 = float32)
  int32 x3    xres, yres, zres
  int32       channel count
  float32 x6  bbox  [xmin ymin zmin xmax ymax zmax]
  float32 ... data, laid out so that
              data[((z*yres + y)*xres + x)*channels + c]
              indexes voxel (x, y, z) channel c (grid3d.cpp:30-35).
"""

from __future__ import annotations

import struct

import numpy as np


def read_vol(path: str):
    """Read a `.vol` file.  Returns (data (Z, Y, X, C) float32,
    bbox_min (3,), bbox_max (3,)) — the Z-major layout
    `media.HeterogeneousMedium` consumes directly."""
    with open(path, "rb") as f:
        magic = f.read(3)
        if magic != b"VOL":
            raise ValueError(f"{path}: not a Mitsuba volume file "
                             f"(magic {magic!r})")
        (version,) = struct.unpack("<B", f.read(1))
        if version != 3:
            raise ValueError(f"{path}: unsupported .vol version {version} "
                             f"(only 3)")
        (dtype,) = struct.unpack("<i", f.read(4))
        if dtype != 1:
            raise ValueError(f"{path}: unsupported data type {dtype} "
                             f"(only 1 = float32)")
        xres, yres, zres, nch = struct.unpack("<iiii", f.read(16))
        if xres * yres * zres < 8:
            raise ValueError(f"{path}: grid {xres}x{yres}x{zres} < 8 voxels")
        bbox = struct.unpack("<ffffff", f.read(24))
        n = xres * yres * zres * nch
        data = np.fromfile(f, dtype="<f4", count=n)
        if data.size != n:
            raise ValueError(f"{path}: truncated volume data "
                             f"({data.size} of {n} floats)")
    data = data.reshape(zres, yres, xres, nch)
    return (data.astype(np.float32),
            np.asarray(bbox[:3], np.float32),
            np.asarray(bbox[3:], np.float32))


def write_vol(path: str, data, bbox_min=(0.0, 0.0, 0.0),
              bbox_max=(1.0, 1.0, 1.0)):
    """Write a `.vol` (version 3, float32).  `data`: (Z, Y, X) or
    (Z, Y, X, C)."""
    a = np.asarray(data, np.float32)
    if a.ndim == 3:
        a = a[..., None]
    zres, yres, xres, nch = a.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(struct.pack("<B", 3))
        f.write(struct.pack("<i", 1))
        f.write(struct.pack("<iiii", xres, yres, zres, nch))
        f.write(struct.pack("<ffffff", *np.asarray(bbox_min, np.float32),
                            *np.asarray(bbox_max, np.float32)))
        a.tofile(f)
