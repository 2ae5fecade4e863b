"""Image IO: PFM (float golden format), PNG (sRGB 8-bit), EXR (half, zip-less).

Host-side re-expression of core/imageio.{h,cpp}: WriteImage dispatches on
extension (imageio.cpp:81-120); 8-bit formats gamma-encode via sRGB
(imageio.cpp:98 GammaCorrect); float formats stay linear.  PFM read/write
follows imageio.cpp:124-250's conventions (scale sign = endianness, rows
bottom-up).  EXR uses a minimal self-contained uncompressed writer (the
OpenEXR bindings aren't in the image).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np


def write_image(path: str, rgb: np.ndarray):
    rgb = np.asarray(rgb, np.float32)
    if path.endswith(".pfm"):
        write_pfm(path, rgb)
    elif path.endswith(".png"):
        write_png(path, rgb)
    elif path.endswith(".exr"):
        write_exr(path, rgb)
    elif path.endswith(".npy"):
        np.save(path, rgb)
    else:
        raise ValueError(f"unsupported image format: {path}")


def read_image(path: str) -> np.ndarray:
    if path.endswith(".pfm"):
        return read_pfm(path)
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".png"):
        import imageio.v2 as iio

        img = np.asarray(iio.imread(path), np.float32) / 255.0
        return _srgb_to_linear(img[..., :3])
    if path.endswith(".exr"):
        return read_exr(path)
    raise ValueError(f"unsupported image format: {path}")


def _linear_to_srgb(v):
    return np.where(
        v <= 0.0031308, 12.92 * v,
        1.055 * np.power(np.maximum(v, 1e-10), 1 / 2.4) - 0.055,
    )


def _srgb_to_linear(v):
    return np.where(v <= 0.04045, v / 12.92, np.power((v + 0.055) / 1.055, 2.4))


# ---------------------------------------------------------------------------
# PFM (imageio.cpp:124-250)
# ---------------------------------------------------------------------------

def write_pfm(path: str, rgb: np.ndarray):
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.000000\n")  # negative = little endian
        # Rows bottom-to-top.
        data = np.flipud(rgb.astype("<f4"))
        f.write(data.tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"PF", b"Pf"):
            raise ValueError("not a PFM file")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        nchan = 3 if magic == b"PF" else 1
        dt = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(w * h * nchan * 4), dt)
        img = data.reshape(h, w, nchan)
        return np.flipud(img).copy()


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def write_png(path: str, rgb: np.ndarray):
    srgb = np.clip(_linear_to_srgb(np.clip(rgb, 0, 1)) * 255.0 + 0.5, 0, 255)
    import imageio.v2 as iio

    iio.imwrite(path, srgb.astype(np.uint8))


# ---------------------------------------------------------------------------
# Minimal EXR: single-part scanline, float32, zip-compressed per scanline.
# ---------------------------------------------------------------------------

def _exr_attr(name: bytes, atype: bytes, value: bytes) -> bytes:
    return name + b"\0" + atype + b"\0" + struct.pack("<i", len(value)) + value


def write_exr(path: str, rgb: np.ndarray):
    """Uncompressed FLOAT scanline EXR with B, G, R channels."""
    h, w = rgb.shape[:2]
    rgb = np.asarray(rgb, "<f4")
    channels = b""
    for name in (b"B", b"G", b"R"):  # alphabetical as required
        channels += name + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)  # FLOAT
    channels += b"\0"
    dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += _exr_attr(b"channels", b"chlist", channels)
    header += _exr_attr(b"compression", b"compression", b"\0")  # none
    header += _exr_attr(b"dataWindow", b"box2i", dw)
    header += _exr_attr(b"displayWindow", b"box2i", dw)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\0")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(
        b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0)
    )
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    magic = struct.pack("<i", 20000630) + struct.pack("<i", 2)
    offset_table_pos = len(magic) + len(header)
    line_size = 8 + w * 4 * 3  # y + size prefix? (prefix counted separately)
    first_data = offset_table_pos + 8 * h
    offsets = b"".join(
        struct.pack("<q", first_data + y * (8 + w * 12)) for y in range(h)
    )
    with open(path, "wb") as f:
        f.write(magic)
        f.write(header)
        f.write(offsets)
        for y in range(h):
            row = rgb[y]
            # channels stored alphabetically: B, G, R; each full row.
            payload = (
                row[:, 2].tobytes() + row[:, 1].tobytes() + row[:, 0].tobytes()
            )
            f.write(struct.pack("<ii", y, len(payload)))
            f.write(payload)


def read_exr(path: str) -> np.ndarray:
    """Minimal reader for the files write_exr produces (uncompressed FLOAT)."""
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack("<i", data[:4])[0] != 20000630:
        raise ValueError("not an EXR file")
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\0", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\0", pos)
        atype = data[pos:e].decode()
        pos = e + 1
        (alen,) = struct.unpack("<i", data[pos : pos + 4])
        pos += 4
        attrs[name] = (atype, data[pos : pos + alen])
        pos += alen
    pos += 1
    if attrs["compression"][1] != b"\0":
        raise ValueError("only uncompressed EXR supported by this reader")
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    pos += 8 * h  # offset table
    out = np.zeros((h, w, 3), np.float32)
    for _ in range(h):
        y, size = struct.unpack("<ii", data[pos : pos + 8])
        pos += 8
        row = np.frombuffer(data[pos : pos + size], "<f4").reshape(3, w)
        pos += size
        out[y - y0, :, 2] = row[0]  # B
        out[y - y0, :, 1] = row[1]  # G
        out[y - y0, :, 0] = row[2]  # R
    return out
