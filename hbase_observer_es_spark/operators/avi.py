"""AVI video container from the public RIFF/AVI specification, stdlib-only.

Real VIDEO closes the multimodal family: an AVI carrying MJPEG is a
sequence of baseline JPEG frames, and the repo already decodes those
from spec (``operators/jpeg.py``) — this module is the container walk
that gets them out. Uncompressed 24-bit DIB streams (``BI_RGB``) decode
too, so both the compressed and raw operating points are real. Same
from-spec discipline as PNG/JPEG/WAV/GIF: no codec library, loud
failures with ``origin`` context. Implemented:

* RIFF walk (the WAV container's sibling): ``RIFF``/``AVI `` header,
  LIST chunks, even-byte padding;
* ``hdrl``: one ``strl`` per stream — the FIRST ``vids`` stream is the
  video track (its ``strh`` gives the exact rational frame duration
  scale/rate and the declared frame count, which is VALIDATED against
  the movi walk; ``strf`` is the BITMAPINFOHEADER naming the codec);
* codecs: ``MJPG`` (each ``##dc`` chunk is one baseline JPEG, decoded
  by the from-spec JPEG decoder) and ``BI_RGB`` 24-bit bottom-up DIB
  (``##db``/``##dc`` raw frames, row padding stripped, BGR→RGB);
  anything else — cinepak, DV, h264 fourccs — refused BY NAME.
  Abbreviated MJPEG streams that omit DHT tables are refused loudly by
  the JPEG layer (tables-in-every-frame is the interchange form);
* ``movi`` walk incl. ``rec `` grouping lists; other streams' chunks
  (audio ``##wb``) are skipped, not mis-read;
* frame geometry is VERIFIED against the stream header — a frame that
  decodes to the wrong size dies loudly instead of corrupting a batch.

Frames come out as :class:`~.png.PngImage` RGB rasters via a generator
(one frame in memory at a time), so resize, PNG/JPEG re-encode, and the
perceptual near-dup hashes compose unchanged. ``avi_frames_frame`` is
the Spark fan-out: one binary payload → one row per sampled frame via
mapInPandas — real-video frame sampling with exact integer timestamps
(``scale``/``rate`` rational, never float).

Scale posture: payloads never shuffle; the container walk is O(bytes)
with no index materialization (idx1 is skipped — sequential decode is
the corpus operating point). Sampling is two-tier: the RAW walk
(``iter_avi_raw``) locates frame payloads without decoding, so an
every-30th sampler pays 1/30th of the decode cost, not all of it;
decode happens only on taken frames. Reference parity: none —
builder-brief (LLM-pipeline) multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .jpeg import decode_jpeg
from .png import PngImage

AVI_MAGIC = (b"RIFF", b"AVI ")  # bytes 0-3 and 8-11

# the named REFUSED codec set: everything here is recognized, reported
# by its human name, and deliberately not decoded (MJPG + raw DIB only)
_REFUSED_FOURCC = {
    b"cvid": "cinepak",
    b"dvsd": "dv-video",
    b"H264": "h264",
    b"h264": "h264",
    b"X264": "h264 (x264)",
    b"XVID": "mpeg-4 (xvid)",
    b"DIVX": "mpeg-4 (divx)",
    b"MP42": "ms-mpeg4-v2",
    b"I420": "raw yuv 4:2:0",
    b"YUY2": "raw yuv 4:2:2",
}


def looks_like_avi(payload: bytes) -> bool:
    return payload[:4] == AVI_MAGIC[0] and payload[8:12] == AVI_MAGIC[1]


@dataclass
class AviStream:
    """The selected video track: geometry, codec, the exact rational
    frame duration (``scale``/``rate`` seconds per frame), and the strh
    frame count (validated against the movi walk by the full-decode
    paths). ``topdown`` applies to raw DIB frames only."""

    stream_id: int
    codec: str  # "mjpg" | "dib"
    width: int
    height: int
    scale: int
    rate: int
    declared_frames: int
    topdown: bool = False

    @property
    def frame_duration_us(self) -> int:
        """Floor microseconds per frame — exact integer rational."""
        return (self.scale * 1_000_000) // self.rate


def _walk_chunks(data: bytes, pos: int, end: int, origin: str):
    """Yield (fourcc, payload_start, payload_end) inside [pos, end)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"avi {origin}: truncated chunk header at byte {pos}")
        fourcc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > end:
            raise ValueError(
                f"avi {origin}: chunk {fourcc!r} at byte {pos} overruns its "
                f"container (declared length {length})"
            )
        yield fourcc, body, body + length
        pos = body + length + (length & 1)  # even-byte padding


def _parse_video_stream(data: bytes, hdrl_start: int, hdrl_end: int, origin: str):
    """First ``vids`` stream in hdrl → AviStream; loud on unsupported
    codecs or a missing video track."""
    stream_no = -1
    for fourcc, b0, b1 in _walk_chunks(data, hdrl_start, hdrl_end, origin):
        if fourcc != b"LIST" or data[b0 : b0 + 4] != b"strl":
            continue
        stream_no += 1
        strh = strf = None
        for sub, s0, s1 in _walk_chunks(data, b0 + 4, b1, origin):
            if sub == b"strh":
                strh = (s0, s1)
            elif sub == b"strf":
                strf = (s0, s1)
        if strh is None:
            raise ValueError(f"avi {origin}: strl without strh (stream {stream_no})")
        h0, h1 = strh
        if h1 - h0 < 48:
            raise ValueError(
                f"avi {origin}: strh of {h1 - h0} bytes truncated (stream "
                f"{stream_no})"
            )
        fcc_type = data[h0 : h0 + 4]
        if fcc_type != b"vids":
            continue
        scale, rate, _start, length = struct.unpack(
            "<IIII", data[h0 + 20 : h0 + 36]
        )
        if strf is None:
            raise ValueError(f"avi {origin}: video strl without strf")
        f0, f1 = strf
        if f1 - f0 < 40:
            raise ValueError(
                f"avi {origin}: BITMAPINFOHEADER of {f1 - f0} bytes truncated"
            )
        _size, bw, bh, _planes, bits, comp = struct.unpack(
            "<IiiHHI", data[f0 : f0 + 20]
        )
        if scale == 0 or rate == 0:
            raise ValueError(
                f"avi {origin}: zero frame timing (scale {scale}, rate {rate})"
            )
        if bw <= 0 or bh == 0:
            raise ValueError(f"avi {origin}: video geometry {bw}x{bh} invalid")
        comp_cc = struct.pack("<I", comp)
        if comp_cc in (b"MJPG", b"mjpg"):
            codec = "mjpg"
        elif comp == 0:  # BI_RGB
            if bits != 24:
                raise ValueError(
                    f"avi {origin}: raw DIB at {bits} bpp unsupported "
                    "(24-bit BI_RGB only)"
                )
            codec = "dib"
        else:
            name = _REFUSED_FOURCC.get(comp_cc, f"fourcc {comp_cc!r}")
            raise ValueError(
                f"avi {origin}: video codec {name} unsupported "
                "(MJPG and 24-bit BI_RGB only)"
            )
        return AviStream(
            stream_id=stream_no,
            codec=codec,
            width=bw,
            height=abs(bh),
            scale=scale,
            rate=rate,
            declared_frames=length,
            topdown=bh < 0,
        )
    raise ValueError(f"avi {origin}: no video (vids) stream in hdrl")


def _dib_to_rgb(
    payload: bytes, w: int, h: int, topdown: bool, origin: str, idx: int
) -> bytes:
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if len(payload) != stride * h:
        raise ValueError(
            f"avi {origin}: frame {idx} DIB payload {len(payload)} bytes != "
            f"{stride}x{h} geometry"
        )
    out = bytearray(w * h * 3)
    for y in range(h):
        src_y = y if topdown else h - 1 - y  # DIBs are bottom-up by default
        row = src_y * stride
        o = y * w * 3
        for x in range(w):
            b, g, r = payload[row + 3 * x : row + 3 * x + 3]
            out[o] = r
            out[o + 1] = g
            out[o + 2] = b
            o += 3
    return bytes(out)


def iter_avi_raw(data: bytes, origin: str = "<bytes>"):
    """The NO-DECODE walk: yields the AviStream, then (frame_index,
    payload_bytes) per video frame in movi order — samplers decide which
    payloads are worth decoding."""
    if not looks_like_avi(data):
        raise ValueError(
            f"avi {origin}: not a RIFF/AVI stream "
            f"(bytes 0-3 {data[:4]!r}, 8-11 {data[8:12]!r})"
        )
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 != len(data):
        raise ValueError(
            f"avi {origin}: RIFF size {riff_size} + 8 != file size {len(data)}"
        )
    stream = None
    movi = None
    for fourcc, b0, b1 in _walk_chunks(data, 12, len(data), origin):
        if fourcc != b"LIST":
            continue
        kind = data[b0 : b0 + 4]
        if kind == b"hdrl" and stream is None:
            stream = _parse_video_stream(data, b0 + 4, b1, origin)
        elif kind == b"movi":
            movi = (b0 + 4, b1)
    if stream is None:
        raise ValueError(f"avi {origin}: missing hdrl list")
    if movi is None:
        raise ValueError(f"avi {origin}: missing movi list")
    want_dc = b"%02ddc" % stream.stream_id
    want_db = b"%02ddb" % stream.stream_id
    idx = 0

    def walk(p0: int, p1: int):
        nonlocal idx
        for cc, c0, c1 in _walk_chunks(data, p0, p1, origin):
            if cc == b"LIST" and data[c0 : c0 + 4] == b"rec ":
                yield from walk(c0 + 4, c1)
            elif cc in (want_dc, want_db):
                yield idx, data[c0:c1]
                idx += 1
            # other streams' chunks (##wb audio, ix## indexes): skipped

    yield stream
    yield from walk(*movi)


def decode_avi_frame(
    stream: AviStream, idx: int, payload: bytes, origin: str = "<bytes>"
) -> PngImage:
    """One raw movi payload → RGB PngImage, geometry verified against
    the stream header (a wrong-size frame dies loudly, never corrupts a
    batch)."""
    if stream.codec == "mjpg":
        img = decode_jpeg(payload, origin=f"{origin}#frame{idx}")
        if img.color_type == 0:  # grayscale MJPEG: widen to RGB
            raw = bytes(v for p in img.raw for v in (p, p, p))
            img = PngImage(
                img.width, img.height, 8, 2, 3, img.width * 3, raw, None
            )
    else:
        img = PngImage(
            stream.width,
            stream.height,
            8,
            2,
            3,
            stream.width * 3,
            _dib_to_rgb(
                payload, stream.width, stream.height, stream.topdown, origin, idx
            ),
            None,
        )
    if (img.width, img.height) != (stream.width, stream.height):
        raise ValueError(
            f"avi {origin}: frame {idx} decodes to {img.width}x"
            f"{img.height} but the stream header declares "
            f"{stream.width}x{stream.height}"
        )
    return img


def iter_avi_frames(data: bytes, origin: str = "<bytes>"):
    """(frame_index, PngImage) per video frame, decoded lazily in movi
    order — the decode-everything walk built on :func:`iter_avi_raw`."""
    it = iter_avi_raw(data, origin=origin)
    stream = next(it)
    yield stream
    for idx, payload in it:
        yield idx, decode_avi_frame(stream, idx, payload, origin)


def _check_declared(stream: AviStream, actual: int, origin: str) -> None:
    """strh dwLength is a header claim about attacker data — a mismatch
    with the movi walk means a truncated or lying file."""
    if stream.declared_frames != actual:
        raise ValueError(
            f"avi {origin}: stream header declares {stream.declared_frames} "
            f"frames but the movi list carries {actual}"
        )


def parse_avi(data: bytes, origin: str = "<bytes>") -> tuple:
    """(AviStream, [PngImage, ...]) — the list convenience for tests and
    short clips; long-video samplers should walk :func:`iter_avi_raw`.
    Validates the declared frame count against the movi walk."""
    it = iter_avi_frames(data, origin=origin)
    stream = next(it)
    frames = [img for _, img in it]
    if not frames:
        raise ValueError(f"avi {origin}: movi list carries no video frames")
    _check_declared(stream, len(frames), origin)
    return stream, frames


AVI_FRAME_SCHEMA = (
    "frame_idx long, n_frames long, ts_us long, width long, height long,"
    " frame_png binary"
)


def avi_frames_frame(
    df, every_n: int = 1, payload_col: str = "payload", id_col: str = "doc_id"
):
    """Real-video frame sampling: ONE AVI payload row → one row per
    sampled frame (every ``every_n``-th, first always included) with the
    exact integer timestamp ``ts_us = idx·scale·10^6 // rate``, each
    frame re-encoded as PNG bytes for downstream hashing/publication.
    Fan-out is executor-side per Arrow batch — no shuffle; only sampled
    frames are DECODED (the raw walk locates the rest without paying the
    codec), and a frameless-but-valid container or a declared-count
    mismatch dies loudly instead of vanishing from the output."""
    import pandas as pd

    from .png import encode_png

    if every_n < 1:
        raise ValueError(f"avi: every_n {every_n} must be >= 1")

    def sample(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "frame_idx", "n_frames", "ts_us", "width",
                    "height", "frame_png",
                )
            }
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                origin = str(key)
                it = iter_avi_raw(bytes(payload), origin=origin)
                stream = next(it)
                sampled = []
                n = 0
                for fidx, raw in it:
                    n += 1
                    if fidx % every_n == 0:
                        img = decode_avi_frame(stream, fidx, raw, origin)
                        sampled.append((fidx, encode_png(img)))
                if n == 0:
                    raise ValueError(
                        f"avi {origin}: movi list carries no video frames"
                    )
                _check_declared(stream, n, origin)
                for fidx, png_bytes in sampled:
                    rows[id_col].append(key)
                    rows["frame_idx"].append(fidx)
                    rows["n_frames"].append(n)
                    rows["ts_us"].append(
                        (fidx * stream.scale * 1_000_000) // stream.rate
                    )
                    rows["width"].append(stream.width)
                    rows["height"].append(stream.height)
                    rows["frame_png"].append(png_bytes)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, f"{id_col} long, {AVI_FRAME_SCHEMA}")


# ------------------------------------------------------------------ writer


def write_avi_mjpeg(
    frames: list, width: int, height: int, scale: int = 1, rate: int = 10
) -> bytes:
    """Serialize JPEG frame payloads as a spec-valid MJPEG AVI (one vids
    stream, ``00dc`` chunks, even-padded). Deterministic — same frames
    in, same bytes out — and every output round-trips through
    :func:`parse_avi` (declared frame count, geometry, and timing all
    come from the arguments, so the validations hold by construction).
    Frames are NOT re-encoded: callers bring encode_jpeg output (or any
    baseline JPEG of the declared geometry)."""
    if not frames:
        raise ValueError("avi: cannot write a video with zero frames")
    if width < 1 or height < 1 or scale < 1 or rate < 1:
        raise ValueError(
            f"avi: invalid geometry/timing {width}x{height} {scale}/{rate}"
        )

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    us_per_frame = (scale * 1_000_000) // rate
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
                      len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, int.from_bytes(b"MJPG", "little"),
        0, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
