"""BMP still images from the public Windows DIB format, stdlib-only.

Web corpora still carry BMPs; the format is a 14-byte file header over
the same BITMAPINFOHEADER + pixel-array layout the AVI raw-DIB frames
use, so this module is a thin wrapper around that shared conversion
(``avi._dib_to_rgb`` — one implementation of stride/bottom-up/BGR).
Supported: 24-bit BI_RGB, bottom-up or top-down; palettized, RLE,
16/32-bit, and V4/V5 header extensions are refused BY NAME (headers
larger than 40 bytes parse their common prefix; compression != BI_RGB
refuses). Fail-loud with ``origin`` context per the codec family rule.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct

from .avi import _dib_to_rgb
from .png import PngImage

BMP_MAGIC = b"BM"


def looks_like_bmp(payload: bytes) -> bool:
    return payload[:2] == BMP_MAGIC


def decode_bmp(data: bytes, origin: str = "<bytes>") -> PngImage:
    if not looks_like_bmp(data):
        raise ValueError(f"bmp {origin}: not a BMP stream (bytes 0-1 {data[:2]!r})")
    if len(data) < 54:
        raise ValueError(f"bmp {origin}: truncated header ({len(data)} bytes)")
    fsize, _res, offset = struct.unpack("<III", data[2:14])
    if fsize != len(data):
        raise ValueError(
            f"bmp {origin}: declared file size {fsize} != actual {len(data)}"
        )
    hsize, bw, bh, planes, bits, comp = struct.unpack("<IiiHHI", data[14:34])
    if hsize < 40:
        raise ValueError(
            f"bmp {origin}: header size {hsize} unsupported (BITMAPCOREHEADER-era)"
        )
    if comp != 0:
        names = {1: "RLE8", 2: "RLE4", 3: "bitfields", 4: "jpeg-in-bmp", 5: "png-in-bmp"}
        raise ValueError(
            f"bmp {origin}: compression {names.get(comp, comp)} unsupported "
            "(BI_RGB only)"
        )
    if bits != 24:
        raise ValueError(
            f"bmp {origin}: {bits}-bit pixels unsupported (24-bit BI_RGB only)"
        )
    if bw <= 0 or bh == 0:
        raise ValueError(f"bmp {origin}: geometry {bw}x{bh} invalid")
    h = abs(bh)
    stride = (bw * 3 + 3) & ~3
    if offset + stride * h > len(data):
        raise ValueError(
            f"bmp {origin}: pixel array at offset {offset} "
            f"({stride}x{h} bytes) overruns the file"
        )
    raw = _dib_to_rgb(
        data[offset : offset + stride * h], bw, h, bh < 0, origin, 0
    )
    return PngImage(bw, h, 8, 2, 3, bw * 3, raw, None)
