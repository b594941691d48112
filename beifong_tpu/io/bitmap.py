"""Image/signal I/O: OpenEXR (float, uncompressed/ZIP), PFM, PNG, NPY.

Replaces the reference's `Bitmap` I/O (`src/libcore/bitmap.cpp`, 2492 LoC of
libpng/openexr wrappers) with dependency-free pure-Python writers/readers for
the formats the radar pipeline needs: EXR for film/ADC output parity
(`hdradc.cpp::develop` writes EXR), PFM as the simple float interchange, PNG
for quick looks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# OpenEXR (scanline, float32, ZIP or none)
# ---------------------------------------------------------------------------

_PIX_FLOAT = 2  # OpenEXR pixel type FLOAT


def _exr_attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b'\x00' + typ + b'\x00' + struct.pack('<i', len(data)) + data


def write_exr(path: str, img: np.ndarray, channel_names=None,
              compress: bool = True):
    """Write (H, W) or (H, W, C) float32 data as a scanline EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if channel_names is None:
        channel_names = (['Y'] if c == 1 else
                         ['R', 'G', 'B'][:c] if c <= 3 else
                         [f'ch{i}' for i in range(c)])
    assert len(channel_names) == c
    order = np.argsort(channel_names)  # EXR requires alphabetical channels

    chlist = b''
    for i in order:
        chlist += channel_names[i].encode() + b'\x00'
        chlist += struct.pack('<iiii', _PIX_FLOAT, 0, 1, 1)
    chlist += b'\x00'

    comp = 3 if compress else 0  # 3 = ZIP (16 scanlines), 0 = none
    block = 16 if compress else 1

    hdr = b'\x76\x2f\x31\x01' + struct.pack('<i', 2)
    hdr += _exr_attr(b'channels', b'chlist', chlist)
    hdr += _exr_attr(b'compression', b'compression', bytes([comp]))
    hdr += _exr_attr(b'dataWindow', b'box2i', struct.pack('<iiii', 0, 0, w - 1, h - 1))
    hdr += _exr_attr(b'displayWindow', b'box2i', struct.pack('<iiii', 0, 0, w - 1, h - 1))
    hdr += _exr_attr(b'lineOrder', b'lineOrder', b'\x00')
    hdr += _exr_attr(b'pixelAspectRatio', b'float', struct.pack('<f', 1.0))
    hdr += _exr_attr(b'screenWindowCenter', b'v2f', struct.pack('<ff', 0, 0))
    hdr += _exr_attr(b'screenWindowWidth', b'float', struct.pack('<f', 1.0))
    hdr += b'\x00'

    n_blocks = (h + block - 1) // block
    chunks = []
    for b in range(n_blocks):
        y0 = b * block
        rows = img[y0:y0 + block]
        # channel-interleaved per scanline, channels alphabetical
        lines = []
        for yy in range(rows.shape[0]):
            for i in order:
                lines.append(rows[yy, :, i].tobytes())
        raw = b''.join(lines)
        if compress:
            # EXR ZIP predictor: reorder + delta
            arr = np.frombuffer(raw, np.uint8)
            half = (len(arr) + 1) // 2
            inter = np.empty_like(arr)
            inter[0::2] = arr[:half]
            inter[1::2] = arr[half:half + len(arr) - half]
            d = inter.astype(np.int16)
            d[1:] = (d[1:] - d[:-1] + 128 + 256) % 256
            data = zlib.compress(d.astype(np.uint8).tobytes())
            if len(data) >= len(raw):
                data = raw
        else:
            data = raw
        chunks.append((y0, data))

    offset_table_size = 8 * n_blocks
    base = len(hdr) + offset_table_size
    offsets = []
    pos = base
    payload = b''
    for y0, data in chunks:
        offsets.append(pos)
        blob = struct.pack('<i', y0) + struct.pack('<i', len(data)) + data
        payload += blob
        pos += len(blob)

    with open(path, 'wb') as fh:
        fh.write(hdr)
        for off in offsets:
            fh.write(struct.pack('<Q', off))
        fh.write(payload)


def read_exr(path: str):
    """Read a float32 scanline EXR written by `write_exr` (ZIP or none).
    Returns (img (H,W,C), channel_names)."""
    with open(path, 'rb') as fh:
        data = fh.read()
    assert data[:4] == b'\x76\x2f\x31\x01', "not an EXR"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b'\x00', pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b'\x00', pos)
        typ = data[pos:e].decode()
        pos = e + 1
        (sz,) = struct.unpack_from('<i', data, pos)
        pos += 4
        attrs[name] = (typ, data[pos:pos + sz])
        pos += sz
    pos += 1
    # channels
    chdata = attrs['channels'][1]
    names = []
    cp = 0
    while chdata[cp] != 0:
        e = chdata.index(b'\x00', cp)
        names.append(chdata[cp:e].decode())
        cp = e + 1 + 16
    comp = attrs['compression'][1][0]
    x0, y0, x1, y1 = struct.unpack('<iiii', attrs['dataWindow'][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    block = {0: 1, 3: 16}[comp]
    n_blocks = (h + block - 1) // block
    offsets = struct.unpack_from(f'<{n_blocks}Q', data, pos)
    img = np.zeros((h, w, len(names)), np.float32)
    for off in offsets:
        (y,) = struct.unpack_from('<i', data, off)
        (sz,) = struct.unpack_from('<i', data, off + 4)
        blob = data[off + 8:off + 8 + sz]
        rows = min(block, h - y)
        raw_len = rows * w * 4 * len(names)
        if comp == 3 and sz != raw_len:
            d = np.frombuffer(zlib.decompress(blob), np.uint8).astype(np.int64)
            # invert the per-byte delta: out[i] = out[i-1] + enc[i] - 128
            d = (np.cumsum(d - 128) + 128) % 256
            d = d.astype(np.uint8)
            out = np.empty_like(d)
            half = (len(d) + 1) // 2
            out[:half] = d[0::2]
            out[half:] = d[1::2]
            raw = out.tobytes()
        else:
            raw = blob
        arr = np.frombuffer(raw, np.float32).reshape(rows, len(names), w)
        for i, nm in enumerate(names):
            img[y:y + rows, :, i] = arr[:, i, :]
    return img, names


# ---------------------------------------------------------------------------
# PFM / PNG / NPY
# ---------------------------------------------------------------------------


def write_pfm(path: str, img: np.ndarray):
    img = np.asarray(img, np.float32)
    color = img.ndim == 3 and img.shape[2] == 3
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    with open(path, 'wb') as fh:
        fh.write(b'PF\n' if color else b'Pf\n')
        fh.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        fh.write(b'-1.0\n')     # little-endian
        fh.write(np.flipud(img).tobytes())


def read_pfm(path: str):
    with open(path, 'rb') as fh:
        kind = fh.readline().strip()
        w, h = map(int, fh.readline().split())
        scale = float(fh.readline())
        c = 3 if kind == b'PF' else 1
        dt = '<f4' if scale < 0 else '>f4'
        arr = np.frombuffer(fh.read(w * h * c * 4), dt).reshape(h, w, c)
    return np.flipud(arr).copy()


def write_png(path: str, img: np.ndarray):
    """8-bit PNG (gray/RGB/RGBA) via zlib — no external deps."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag, payload):
        out = struct.pack('>I', len(payload)) + tag + payload
        return out + struct.pack('>I', zlib.crc32(tag + payload) & 0xffffffff)

    raw = b''.join(b'\x00' + img[y].tobytes() for y in range(h))
    with open(path, 'wb') as fh:
        fh.write(b'\x89PNG\r\n\x1a\n')
        fh.write(chunk(b'IHDR', struct.pack('>IIBBBBB', w, h, 8, ctype, 0, 0, 0)))
        fh.write(chunk(b'IDAT', zlib.compress(raw, 6)))
        fh.write(chunk(b'IEND', b''))
