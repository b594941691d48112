"""Triangle meshes + OBJ/PLY loaders.

Replaces reference `src/librender/mesh.cpp` (886 LoC) and the obj/ply shape
plugins (`src/shapes/obj.cpp`, `src/shapes/ply.cpp`): host-side numpy loading
and a pre-transformed triangle-soup compile step (vertices baked into world
space so the device intersector needs no per-ray transforms).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional

import numpy as np

from .shapes import ShapeSpec, TRIANGLE, _m4


@dataclasses.dataclass
class MeshSpec(ShapeSpec):
    """Host-side triangle mesh (kind=TRIANGLE)."""

    vertices: np.ndarray = None   # (V,3) float32, object space
    faces: np.ndarray = None      # (F,3) int32

    def __init__(self, vertices, faces, to_world=None, **kw):
        super().__init__(kind=TRIANGLE, to_world=_m4(to_world), **kw)
        self.vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
        self.faces = np.asarray(faces, np.int32).reshape(-1, 3)

    def world_vertices(self) -> np.ndarray:
        m = self.to_world
        return self.vertices @ m[:3, :3].T + m[:3, 3]

    def surface_area_world(self) -> float:
        v = self.world_vertices()
        a, b, c = v[self.faces[:, 0]], v[self.faces[:, 1]], v[self.faces[:, 2]]
        return float(0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum())


def load_obj(path: str, to_world=None, use_native: bool = True, **kw) -> MeshSpec:
    """Wavefront OBJ loader: v / f records, fan-triangulated
    (reference `src/shapes/obj.cpp` semantics for positions).
    Uses the native C++ parser when built; Python fallback otherwise."""
    if use_native:
        from .. import native
        res = native.parse_obj(path)
        if res is not None:
            return MeshSpec(res[0], res[1], to_world=to_world, **kw)
    verts, faces = [], []
    with open(path, 'r', errors='ignore') as fh:
        for line in fh:
            if line.startswith('v '):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith('f '):
                idx = []
                for tok in line.split()[1:]:
                    i = tok.split('/')[0]
                    k = int(i)
                    idx.append(k - 1 if k > 0 else len(verts) + k)
                for j in range(1, len(idx) - 1):   # fan triangulation
                    faces.append([idx[0], idx[j], idx[j + 1]])
    return MeshSpec(np.array(verts, np.float32), np.array(faces, np.int32),
                    to_world=to_world, **kw)


def load_ply(path: str, to_world=None, **kw) -> MeshSpec:
    """PLY loader: ascii and binary_little_endian, vertex xyz + face lists
    (reference `src/shapes/ply.cpp`)."""
    with open(path, 'rb') as fh:
        if fh.readline().strip() != b'ply':
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(type, name)])
        cur = None
        while True:
            line = fh.readline().strip()
            if line == b'end_header':
                break
            parts = line.split()
            if parts[0] == b'format':
                fmt = parts[1].decode()
            elif parts[0] == b'element':
                cur = (parts[1].decode(), int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == b'property':
                if parts[1] == b'list':
                    cur[2].append(('list', parts[2].decode(), parts[3].decode(),
                                   parts[4].decode()))
                else:
                    cur[2].append((parts[1].decode(), parts[2].decode()))
        verts, faces = None, []
        np_types = {'float': 'f4', 'float32': 'f4', 'double': 'f8',
                    'uchar': 'u1', 'uint8': 'u1', 'char': 'i1', 'int8': 'i1',
                    'short': 'i2', 'ushort': 'u2', 'int': 'i4', 'int32': 'i4',
                    'uint': 'u4', 'uint32': 'u4'}
        for name, count, props in elements:
            if fmt == 'ascii':
                if name == 'vertex':
                    rows = [fh.readline().split() for _ in range(count)]
                    arr = np.array(rows, np.float64)
                    cols = [i for i, p in enumerate(props) if p[1] in ('x', 'y', 'z')]
                    verts = arr[:, cols[:3]].astype(np.float32)
                elif name == 'face':
                    for _ in range(count):
                        row = fh.readline().split()
                        k = int(row[0])
                        idx = [int(x) for x in row[1:1 + k]]
                        for j in range(1, k - 1):
                            faces.append([idx[0], idx[j], idx[j + 1]])
                else:
                    for _ in range(count):
                        fh.readline()
            elif fmt == 'binary_little_endian':
                if name == 'vertex':
                    dt = np.dtype([(p[1], '<' + np_types[p[0]]) for p in props])
                    arr = np.frombuffer(fh.read(dt.itemsize * count), dtype=dt)
                    verts = np.stack([arr['x'], arr['y'], arr['z']], -1).astype(np.float32)
                elif name == 'face':
                    # assume single list property
                    lp = props[0]
                    cnt_t = '<' + np_types[lp[1]]
                    idx_t = '<' + np_types[lp[2]]
                    cnt_sz = np.dtype(cnt_t).itemsize
                    idx_sz = np.dtype(idx_t).itemsize
                    for _ in range(count):
                        k = int(np.frombuffer(fh.read(cnt_sz), cnt_t)[0])
                        idx = np.frombuffer(fh.read(idx_sz * k), idx_t)
                        for j in range(1, k - 1):
                            faces.append([int(idx[0]), int(idx[j]), int(idx[j + 1])])
                else:
                    raise ValueError(f"unhandled binary element {name}")
            else:
                raise ValueError(f"unsupported PLY format {fmt}")
    return MeshSpec(verts, np.array(faces, np.int32).reshape(-1, 3),
                    to_world=to_world, **kw)


def load_serialized(path: str, shape_index: int = 0, to_world=None,
                    **kw) -> MeshSpec:
    """Mitsuba `.serialized` mesh loader (reference
    `src/shapes/serialized.cpp`): zlib-compressed per-mesh streams with an
    offset table at the end of the file.  Positions + faces only."""
    import struct
    import zlib
    with open(path, 'rb') as fh:
        data = fh.read()
    magic, version = struct.unpack_from('<HH', data, 0)
    if magic != 0x041C:
        raise ValueError(f"{path}: not a .serialized file (magic {magic:#x})")
    (n_meshes,) = struct.unpack_from('<I', data, len(data) - 4)
    offsets = struct.unpack_from(f'<{n_meshes}Q',
                                 data, len(data) - 4 - 8 * n_meshes)
    if not 0 <= shape_index < n_meshes:
        raise IndexError(f"shape_index {shape_index} of {n_meshes}")
    start = offsets[shape_index] + 4          # skip per-mesh magic+version
    end = (offsets[shape_index + 1]
           if shape_index + 1 < n_meshes else len(data) - 4 - 8 * n_meshes)
    raw = zlib.decompress(data[start:end])
    pos = 0
    (flags,) = struct.unpack_from('<I', raw, pos)
    pos += 4
    if version >= 4:
        e = raw.index(b'\x00', pos)
        pos = e + 1
    n_v, n_f = struct.unpack_from('<QQ', raw, pos)
    pos += 16
    single = bool(flags & 0x1000)
    vdt = np.float32 if single else np.float64
    vsz = 4 if single else 8
    verts = np.frombuffer(raw, vdt, 3 * n_v, pos).reshape(n_v, 3)
    pos += 3 * n_v * vsz
    if flags & 0x0001:      # normals
        pos += 3 * n_v * vsz
    if flags & 0x0002:      # texcoords
        pos += 2 * n_v * vsz
    if flags & 0x0008:      # colors
        pos += 3 * n_v * vsz
    faces = np.frombuffer(raw, np.uint32, 3 * n_f, pos).reshape(n_f, 3)
    return MeshSpec(verts.astype(np.float32), faces.astype(np.int32),
                    to_world=to_world, **kw)


def save_serialized(path: str, meshes: list):
    """Write meshes [(verts, faces), ...] as Mitsuba `.serialized` v4
    (positions only, single precision)."""
    import struct
    import zlib
    blob = b''
    offsets = []
    for i, (v, f) in enumerate(meshes):
        offsets.append(len(blob))
        v = np.asarray(v, np.float32)
        f = np.asarray(f, np.uint32)
        raw = struct.pack('<I', 0x1000) + f"mesh_{i}".encode() + b'\x00'
        raw += struct.pack('<QQ', len(v), len(f))
        raw += v.tobytes() + f.tobytes()
        blob += struct.pack('<HH', 0x041C, 4) + zlib.compress(raw)
    blob += b''.join(struct.pack('<Q', o) for o in offsets)
    blob += struct.pack('<I', len(meshes))
    with open(path, 'wb') as fh:
        fh.write(blob)


def make_grid(nx: int = 1, ny: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Unit grid mesh on [-1,1]^2 z=0 (test helper, like the reference's
    `mesh_generation.py`)."""
    xs = np.linspace(-1, 1, nx + 1)
    ys = np.linspace(-1, 1, ny + 1)
    vv = np.array([[x, y, 0.0] for y in ys for x in xs], np.float32)
    ff = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + nx + 1
            d = c + 1
            ff += [[a, b, d], [a, d, c]]
    return vv, np.array(ff, np.int32)


# ---------------------------------------------------------------------------
# Blender mesh import (reference `src/shapes/blender.cpp`): the exporter
# add-on hands over raw pointers to Blender's in-memory arrays; here the
# same layouts are numpy structured dtypes, accepted either as raw bytes
# (bit-identical to what the reference reinterpret_casts) or as arrays.
# ---------------------------------------------------------------------------

BL_MLOOP = np.dtype([('v', '<u4'), ('e', '<u4')])
BL_MLOOPTRI = np.dtype([('tri', '<u4', (3,)), ('poly', '<u4')])
BL_MLOOPUV = np.dtype([('uv', '<f4', (2,)), ('flag', '<i4')])
BL_MPOLY = np.dtype([('loopstart', '<i4'), ('totloop', '<i4'),
                     ('mat_nr', '<i2'), ('flag', 'i1'), ('_pad', 'i1')])
BL_MVERT = np.dtype([('co', '<f4', (3,)), ('no', '<i2', (3,)),
                     ('flag', 'i1'), ('bweight', 'i1')])


def blender_mesh(verts, loops, loop_tris, polys, mat_nr: int = 0,
                 to_world=None, **kw) -> MeshSpec:
    """Build a MeshSpec from Blender mesh buffers (reference
    `src/shapes/blender.cpp:86-200`): `loop_tris` index into `loops`, which
    index into `verts`; faces are filtered to the polygons whose material
    slot equals `mat_nr` (one shape per material, like the reference).

    Buffers may be raw bytes in Blender's struct layouts (BL_MVERT etc.) or
    anything convertible to the matching structured arrays.
    """
    def arr(buf, dt):
        if isinstance(buf, (bytes, bytearray, memoryview)):
            return np.frombuffer(buf, dt)
        a = np.asarray(buf)
        return a if a.dtype == dt else a.astype(dt)

    mv = arr(verts, BL_MVERT)
    ml = arr(loops, BL_MLOOP)
    mt = arr(loop_tris, BL_MLOOPTRI)
    mp = arr(polys, BL_MPOLY)
    keep = mp['mat_nr'][mt['poly']] == np.int16(mat_nr)
    tris = mt['tri'][keep]                      # (T,3) loop indices
    faces = ml['v'][tris].astype(np.int32)      # (T,3) vertex indices
    if faces.size == 0:
        raise ValueError(f"no faces with mat_nr={mat_nr}")
    # compact to the used vertex set (the reference dedups per-corner for
    # shading attributes; positions alone need only the used subset)
    used, inv = np.unique(faces.reshape(-1), return_inverse=True)
    v = mv['co'][used].astype(np.float32)
    return MeshSpec(v, inv.reshape(-1, 3).astype(np.int32),
                    to_world=to_world, **kw)
