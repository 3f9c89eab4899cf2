"""Animated WebP frame composition from the public container spec,
stdlib-only.

Closes the "animations refuse by name" gap for the LOSSLESS half: an
animated WebP whose frames are VP8L sub-images now composes into
full-canvas frames exactly the way ``operators/gif.py`` composes GIF
frames, so the real-media frame-sampling surface (census +
``q_mm_framesample``'s real twin) covers both animated formats. Lossy
VP8 frames keep the named-refusal convention (the boolean arithmetic
coder + loop filter — the same refusal the still-image path carries).

Implemented from the public WebP container layout:

* ``VP8X`` gates the walk (an animation without VP8X is malformed);
* ``ANIM``: canvas background color (Blue, Green, Red, Alpha byte
  order) and the 16-bit loop count;
* ``ANMF``: the 16-byte frame header — 24-bit x/2 and y/2 offsets,
  24-bit minus-one width/height, 24-bit duration in ms, then the
  blending bit (0 = alpha-blend onto the canvas, 1 = overwrite) and
  the disposal bit (0 = keep, 1 = restore the frame rectangle to the
  background color) — followed by the frame's own chunk list.

Composition runs on an ARGB canvas initialised to the ANIM background
color. Alpha blending is the spec's src-over in exact integer
arithmetic (round-half-up on the /255 folds, documented at
:func:`_blend_px` and pinned by goldens — determinism is the contract;
the spec leaves sub-integer rounding to the implementation). Composed
frames surface as RGB :class:`~.png.PngImage` rasters (decoded alpha
dropped at the boundary — the tiff.py/vp8l.py corpus convention), so
resize, PNG re-encode, and the perceptual hashes compose unchanged.

Scale posture: same as gif.py — composition is stateful so every frame
decodes once inside a mapInPandas task, the canvas plus one frame is
the whole working set, and only sampled frames materialize rows.
Header-declared geometry is attacker data: the shared MAX_PIXELS guard
applies to the canvas, frame rectangles must sit inside the canvas,
and the declared VP8L sub-image size must equal the ANMF rectangle.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .png import MAX_PIXELS, PngImage


@dataclass
class WebpFrame:
    """One COMPOSED full-canvas frame: ``image`` is an RGB PngImage of
    the whole canvas; ``duration_ms`` is the ANMF duration (0 for the
    single-image case)."""

    index: int
    duration_ms: int
    image: PngImage


def _blend_px(src: int, dst: int) -> int:
    """Spec src-over blend of two ARGB pixels in exact integer math.

    With aS, aD in 0..255: the blended alpha scaled by 255 is
    ``aB255 = aS*255 + aD*(255-aS)`` and each blended channel is
    ``(cS*aS*255 + cD*aD*(255-aS)) / aB255`` — both folds round
    half-up. A fully transparent result is pixel 0 (the spec's
    all-channels-zero convention)."""
    a_s = (src >> 24) & 0xFF
    if a_s == 0xFF:
        return src
    if a_s == 0:
        return dst
    a_d = (dst >> 24) & 0xFF
    tmp = a_d * (255 - a_s)
    ab255 = a_s * 255 + tmp
    if ab255 == 0:
        return 0
    out = ((ab255 + 127) // 255) << 24
    for shift in (16, 8, 0):
        c_s = (src >> shift) & 0xFF
        c_d = (dst >> shift) & 0xFF
        c_b = (c_s * a_s * 255 + c_d * tmp + ab255 // 2) // ab255
        out |= c_b << shift
    return out


def _canvas_to_rgb(canvas: list, w: int, h: int) -> PngImage:
    raw = bytearray(w * h * 3)
    o = 0
    for p in canvas:
        raw[o] = (p >> 16) & 0xFF
        raw[o + 1] = (p >> 8) & 0xFF
        raw[o + 2] = p & 0xFF
        o += 3
    return PngImage(w, h, 8, 2, 3, w * 3, bytes(raw), None)


def _frame_chunks(data: bytes, start: int, end: int, origin: str, what: str):
    """Chunk walk over a byte window (the RIFF even-padding rule),
    yielding (fourcc, body_start, body_len)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError(
                f"webp {origin}: truncated chunk header inside {what}"
            )
        cc = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + length > end:
            raise ValueError(
                f"webp {origin}: chunk {cc!r} overruns {what}"
            )
        yield cc, body, length
        pos = body + length + (length & 1)


def iter_webp_frames(
    data: bytes,
    origin: str = "<bytes>",
    max_frames: int = 10000,
    max_pixels: int | None = None,
):
    """Composed frames of one WebP, YIELDED one at a time (the
    ``gif.iter_gif_frames`` contract: canvas + current frame is the
    working set). Non-animated files yield their single image so
    samplers treat stills and animations uniformly. Animated files
    compose ANMF frames; a lossy (VP8) frame raises the named
    NotImplementedError, corrupt structure raises ValueError."""
    from .webpmeta import webp_meta

    if max_pixels is None:
        max_pixels = MAX_PIXELS
    meta = webp_meta(data, origin)  # full container validation first
    if not meta["animated"]:
        from .webpmeta import decode_webp_pixels

        yield WebpFrame(0, 0, decode_webp_pixels(data, origin))
        return
    cw, ch = meta["width"], meta["height"]
    if cw * ch > max_pixels:
        raise ValueError(
            f"webp {origin}: declared canvas {cw}x{ch} exceeds the "
            f"{max_pixels}-pixel guard — raise max_pixels if intentional"
        )
    bg = 0
    canvas = None
    n_frames = 0
    for cc, body, length in _frame_chunks(data, 12, len(data), origin, "the file"):
        if cc == b"ANIM":
            if length < 6:
                raise ValueError(f"webp {origin}: ANIM chunk truncated")
            # background color in Blue, Green, Red, Alpha byte order
            b, g, r, a = data[body : body + 4]
            bg = (a << 24) | (r << 16) | (g << 8) | b
            canvas = [bg] * (cw * ch)
        elif cc == b"ANMF":
            if canvas is None:
                raise ValueError(
                    f"webp {origin}: ANMF frame before the ANIM chunk"
                )
            # cap checked BEFORE composing so it bounds work done, not
            # just frames counted: an early-stopping consumer must never
            # have decoded a frame past the budget
            if n_frames >= max_frames:
                raise ValueError(
                    f"webp {origin}: more than {max_frames} frames — "
                    "raise max_frames if this is intentional"
                )
            if length < 16:
                raise ValueError(
                    f"webp {origin}: ANMF header of {length} bytes (need 16)"
                )
            hdr = data[body : body + 16]
            fx = int.from_bytes(hdr[0:3], "little") * 2
            fy = int.from_bytes(hdr[3:6], "little") * 2
            fw = int.from_bytes(hdr[6:9], "little") + 1
            fh = int.from_bytes(hdr[9:12], "little") + 1
            duration = int.from_bytes(hdr[12:15], "little")
            flags = hdr[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > cw or fy + fh > ch:
                raise ValueError(
                    f"webp {origin}: frame {n_frames} rectangle "
                    f"{fw}x{fh}@({fx},{fy}) outside the {cw}x{ch} canvas"
                )
            px = None
            for fcc, fbody, flen in _frame_chunks(
                data, body + 16, body + length, origin, f"frame {n_frames}"
            ):
                if fcc == b"VP8L":
                    from .vp8l import decode_vp8l_argb

                    sw, sh, px = decode_vp8l_argb(
                        data[fbody : fbody + flen],
                        f"{origin} frame {n_frames}",
                    )
                    if (sw, sh) != (fw, fh):
                        raise ValueError(
                            f"webp {origin}: frame {n_frames} VP8L "
                            f"sub-image {sw}x{sh} != ANMF rectangle "
                            f"{fw}x{fh}"
                        )
                    break
                if fcc == b"VP8 ":
                    raise NotImplementedError(
                        f"webp {origin}: frame {n_frames} is lossy VP8 "
                        "(boolean arithmetic coder + loop filter — not "
                        "stdlib-expressible); lossless (VP8L) animation "
                        "frames compose for real"
                    )
                if fcc == b"ALPH":
                    raise NotImplementedError(
                        f"webp {origin}: frame {n_frames} carries an ALPH "
                        "chunk (lossy-VP8 alpha plane); lossless frames "
                        "carry alpha in the VP8L stream itself"
                    )
            if px is None:
                raise ValueError(
                    f"webp {origin}: frame {n_frames} has no VP8L/VP8 "
                    "image chunk"
                )
            if no_blend:
                for y in range(fh):
                    o = (fy + y) * cw + fx
                    canvas[o : o + fw] = px[y * fw : (y + 1) * fw]
            else:
                for y in range(fh):
                    o = (fy + y) * cw + fx
                    row = y * fw
                    for x in range(fw):
                        canvas[o + x] = _blend_px(px[row + x], canvas[o + x])
            yield WebpFrame(n_frames, duration, _canvas_to_rgb(canvas, cw, ch))
            n_frames += 1
            # disposal AFTER the frame is shown
            if dispose_bg:
                for y in range(fh):
                    o = (fy + y) * cw + fx
                    canvas[o : o + fw] = [bg] * fw
    if n_frames == 0:
        raise ValueError(
            f"webp {origin}: VP8X declares animation but no ANMF frame "
            "composed"
        )


def parse_webp_frames(
    data: bytes, origin: str = "<bytes>", max_frames: int = 10000
) -> list:
    """All composed frames as a LIST — the test/tooling convenience."""
    return list(iter_webp_frames(data, origin=origin, max_frames=max_frames))


WEBP_FRAME_SCHEMA = (
    "frame_idx long, n_frames long, duration_ms long, frame_png binary"
)


def webp_frames_frame(
    df, every_n: int = 1, payload_col: str = "payload", id_col: str = "doc_id"
):
    """Real-media frame sampling over WebP payloads: one binary payload
    row → one row per sampled composed frame (every ``every_n``-th,
    first always included), re-encoded as PNG bytes — the
    ``gif.gif_frames_frame`` contract on the second animated format.
    Fan-out is executor-side per Arrow batch; frames decode once
    (composition is stateful) and only sampled frames materialize."""
    import pandas as pd

    from .png import encode_png

    if every_n < 1:
        raise ValueError(f"webp: every_n {every_n} must be >= 1")

    def sample(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "frame_idx", "n_frames", "duration_ms", "frame_png",
                )
            }
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                sampled = []
                n = 0
                for f in iter_webp_frames(bytes(payload), origin=str(key)):
                    n += 1
                    if f.index % every_n == 0:
                        sampled.append(
                            (f.index, f.duration_ms, encode_png(f.image))
                        )
                for idx_, dur, png_bytes in sampled:
                    rows[id_col].append(key)
                    rows["frame_idx"].append(idx_)
                    rows["n_frames"].append(n)
                    rows["duration_ms"].append(dur)
                    rows["frame_png"].append(png_bytes)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, f"{id_col} long, {WEBP_FRAME_SCHEMA}")
