"""Image I/O: PPM / Radiance HDR / BMP / PNG numpy round-trips.

Replaces the reference's prebuilt sutil loaders (`PPMLoader.h`,
`HDRLoader.h`) and the BMP writer in `REF/gui.cpp:253-355`
(`loadBmp`/`saveBMP24`). PNG (needed for the reference's own
`vokselia_spawn.png` texture) is decoded with stdlib zlib — pure numpy,
no external imaging deps.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np


# ------------------------------------------------------------------- PPM
def load_ppm(path: str) -> np.ndarray:
    """Load P3/P6 PPM -> float32 [H,W,3] in [0,1]."""
    with open(path, "rb") as f:
        data = f.read()

    tokens = []
    i = 0
    # tokenize header, skipping comments
    while len(tokens) < 4:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval

    magic = tokens[0]
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic == b"P6":
        dtype = np.uint8 if maxval < 256 else ">u2"
        img = np.frombuffer(data, dtype=dtype, count=w * h * 3, offset=i)
        img = img.reshape(h, w, 3).astype(np.float32) / maxval
    elif magic == b"P3":
        vals = np.array(data[i:].split(), dtype=np.float32)[: w * h * 3]
        img = vals.reshape(h, w, 3) / maxval
    else:
        raise ValueError(f"unsupported PPM magic {magic!r}")
    return img


def save_ppm(path: str, img: np.ndarray) -> None:
    """img: [H,W,3] float in [0,1] or uint8 in [0,255]."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img8 = img
    else:
        img8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = img8.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img8.tobytes())


# ------------------------------------------------------------------- HDR
def load_hdr(path: str) -> np.ndarray:
    """Load Radiance RGBE (.hdr) -> float32 [H,W,3] linear radiance."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        if not line.startswith(b"#?"):
            raise ValueError("not a Radiance HDR file")
        while True:
            line = f.readline()
            if line.strip() == b"":
                break
        dims = f.readline().split()
        # expect: -Y H +X W
        h, w = int(dims[1]), int(dims[3])
        data = f.read()

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2:
            # RLE scanline
            pos += 4
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[pos]; pos += 1
                    if cnt > 128:  # run
                        rgbe[y, x : x + cnt - 128, c] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:  # literal
                        rgbe[y, x : x + cnt, c] = np.frombuffer(
                            data, np.uint8, cnt, pos
                        )
                        pos += cnt
                        x += cnt
        else:  # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, pos).reshape(w, 4)
            rgbe[y] = row
            pos += w * 4

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp > 0, np.ldexp(1.0, exp - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * scale[..., None]


# ------------------------------------------------------------------- BMP
def save_bmp(path: str, img: np.ndarray) -> None:
    """24-bit BMP writer (gui.cpp:315-355 `saveBMP24`).
    img: [H,W,3] float in [0,1] or uint8 in [0,255]."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img8 = img
    else:
        img8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = img8.shape[:2]
    bgr = img8[::-1, :, ::-1]  # bottom-up rows, BGR order
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    pixel_bytes = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h)
    )
    file_size = 54 + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes),
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header + info + pixel_bytes)


# ------------------------------------------------------------------- PNG
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def load_png(path: str) -> np.ndarray:
    """Baseline PNG decoder -> float32 [H,W,3] in [0,1].

    Supports 8/16-bit grayscale / gray+alpha / RGB / RGBA and 8-bit
    palette, non-interlaced (covers the reference's shipped
    `vokselia_spawn.png`). Pure numpy + stdlib zlib — no PIL dependency.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG file")

    pos = 8
    idat = []
    palette = None
    w = h = bitdepth = color_type = interlace = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bitdepth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if bitdepth not in (8, 16):
        if not (bitdepth == 8 or (color_type == 3 and bitdepth <= 8)):
            raise ValueError(f"unsupported PNG bit depth {bitdepth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if color_type == 3 and bitdepth != 8:
        raise ValueError("palette PNG with sub-byte depth not supported")

    raw = zlib.decompress(b"".join(idat))
    bypp = channels * (bitdepth // 8)          # bytes per pixel
    stride = w * bypp
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros((stride,), np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(bypp, stride):
                row[x] = (row[x] + row[x - bypp]) & 0xFF
        elif ft == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(row[x - bypp]) if x >= bypp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bypp]) if x >= bypp else 0
                b = int(prev[x])
                c = int(prev[x - bypp]) if x >= bypp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = row
        prev = row

    if bitdepth == 16:
        img = out.reshape(h, w, channels, 2)
        img = (img[..., 0].astype(np.float32) * 256
               + img[..., 1]).astype(np.float32) / 65535.0
    else:
        img = out.reshape(h, w, channels).astype(np.float32) / 255.0

    if color_type == 3:
        idx = (img[..., 0] * 255.0 + 0.5).astype(np.int32)
        return palette[np.clip(idx, 0, len(palette) - 1)].astype(
            np.float32) / 255.0
    if channels == 1:
        return np.repeat(img, 3, axis=-1)
    if channels == 2:
        return np.repeat(img[..., :1], 3, axis=-1)
    return img[..., :3]


def save_png(path: str, img: np.ndarray) -> None:
    """Minimal 8-bit RGB PNG writer (filter 0 rows, one IDAT)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[y, :, :3].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(_PNG_MAGIC + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def load_bmp(path: str) -> np.ndarray:
    """24-bit BMP reader (gui.cpp:253-313 `loadBmp`) -> float32 [H,W,3]."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack("<I", data[10:14])[0]
    w = struct.unpack("<i", data[18:22])[0]
    h = struct.unpack("<i", data[22:26])[0]
    bpp = struct.unpack("<H", data[28:30])[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row_size = (w * 3 + 3) & ~3
    img = np.zeros((abs(h), w, 3), np.uint8)
    flip = h > 0
    h = abs(h)
    for y in range(h):
        row = np.frombuffer(data, np.uint8, w * 3, offset + y * row_size)
        img[h - 1 - y if flip else y] = row.reshape(w, 3)[:, ::-1]
    return img.astype(np.float32) / 255.0
