"""Minimal dependency-free PNG output.

The reference displays frames via a fullscreen textured quad
(src/main.cpp:365-366, renderQuad:476-501). Headless TPU rendering writes
PNGs instead (SURVEY.md §2 native-mapping table). Colors are raw linear
values clamped to [0,1] — the reference blits the RGBA32F texture with no
gamma/tonemap (shader.frag:1-12) and relies on the default framebuffer,
so a plain 8-bit quantization matches what the window showed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp floats to [0,1] and quantize to u8 (H, W, 3)."""
    img = np.asarray(img)
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) float or uint8 array as a PNG file."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
