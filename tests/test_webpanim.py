"""Animated WebP composition: hand-built ANMF containers over the
test-side VP8L encoder (tests/test_vp8l.py), composed-frame goldens for
blend/no-blend/disposal/offsets, the named lossy refusal, bomb guards,
and the Spark frame-sampling fan-out."""

from __future__ import annotations

import struct

import pytest

from hbase_observer_es_spark.operators.multimodal import decode_image_real
from hbase_observer_es_spark.operators.webpanim import (
    iter_webp_frames,
    parse_webp_frames,
    webp_frames_frame,
)
from hbase_observer_es_spark.operators.webpmeta import decode_webp_pixels
from tests.test_vp8l import _encode_simple, _vp8l_header, _write_image_stream


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _webp(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8x(w, h, anim=True, alpha=False) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0)
    body = (
        bytes([flags, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )
    return _chunk(b"VP8X", body)


def _anim(bg_rgba=(0, 0, 0, 0), loops=0) -> bytes:
    r, g, b, a = bg_rgba
    return _chunk(b"ANIM", bytes([b, g, r, a]) + loops.to_bytes(2, "little"))


def _vp8l_body(w_px: int, h_px: int, pixels: list) -> bytes:
    """Literal-only VP8L chunk body (no transforms) for ARGB pixels."""
    w = _vp8l_header(w_px, h_px)
    w.put(0, 1)  # end of transforms
    _write_image_stream(w, pixels, level0=True)
    return b"\x2f" + w.bytes()


def _anmf(x, y, w, h, pixels, dur=40, no_blend=True, dispose_bg=False,
          image_chunk=None) -> bytes:
    flags = (0x02 if no_blend else 0) | (0x01 if dispose_bg else 0)
    hdr = (
        (x // 2).to_bytes(3, "little")
        + (y // 2).to_bytes(3, "little")
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
        + dur.to_bytes(3, "little")
        + bytes([flags])
    )
    if image_chunk is None:
        image_chunk = _chunk(b"VP8L", _vp8l_body(w, h, pixels))
    return _chunk(b"ANMF", hdr + image_chunk)


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _rgb_rows(img):
    return [
        [
            tuple(img.raw[(y * img.width + x) * 3 : (y * img.width + x) * 3 + 3])
            for x in range(img.width)
        ]
        for y in range(img.height)
    ]


BLUE = _argb(255, 0, 0, 255)
GREEN = _argb(255, 0, 255, 0)


def test_two_frame_overwrite_composition_and_durations():
    """Frame 1 paints the whole 2x2 canvas blue; frame 2 overwrites the
    (1,1) pixel green (offsets ride the /2 encoding). Disposal keep."""
    data = _webp(
        _vp8x(2, 2),
        _anim(bg_rgba=(255, 0, 0, 255)),
        _anmf(0, 0, 2, 2, [BLUE] * 4, dur=100),
        _anmf(0, 0, 1, 1, [GREEN], dur=250),
    )
    frames = parse_webp_frames(data)
    assert [(f.index, f.duration_ms) for f in frames] == [(0, 100), (1, 250)]
    assert _rgb_rows(frames[0].image) == [
        [(0, 0, 255), (0, 0, 255)], [(0, 0, 255), (0, 0, 255)]]
    assert _rgb_rows(frames[1].image) == [
        [(0, 255, 0), (0, 0, 255)], [(0, 0, 255), (0, 0, 255)]]


def test_frame_offsets_are_double_the_stored_fields():
    """A 1x1 frame at stored offset (1,1) lands at canvas (2,2)."""
    data = _webp(
        _vp8x(4, 4),
        _anim(bg_rgba=(9, 8, 7, 255)),
        _anmf(2, 2, 1, 1, [GREEN]),
    )
    rows = _rgb_rows(parse_webp_frames(data)[0].image)
    for y in range(4):
        for x in range(4):
            want = (0, 255, 0) if (x, y) == (2, 2) else (9, 8, 7)
            assert rows[y][x] == want


def test_alpha_blend_golden():
    """Alpha-blend (blending bit 0): a=128 red over the opaque
    (100,100,100) background — hand-computed src-over integers."""
    src = _argb(128, 200, 0, 0)
    data = _webp(
        _vp8x(1, 1),
        _anim(bg_rgba=(100, 100, 100, 255)),
        _anmf(0, 0, 1, 1, [src], no_blend=False),
    )
    img = parse_webp_frames(data)[0].image
    # tmp = 255*(255-128) = 32385; ab255 = 128*255 + 32385 = 65025
    # R = (200*128*255 + 100*32385 + 32512) // 65025 = 150
    # G = B = (100*32385 + 32512) // 65025 = 50
    assert _rgb_rows(img) == [[(150, 50, 50)]]


def test_no_blend_overwrites_even_when_transparent():
    """Blending bit 1 replaces the rectangle outright — a transparent
    source pixel lands as-is (its RGB shows once alpha drops)."""
    data = _webp(
        _vp8x(1, 1),
        _anim(bg_rgba=(100, 100, 100, 255)),
        _anmf(0, 0, 1, 1, [_argb(0, 33, 44, 55)], no_blend=True),
    )
    assert _rgb_rows(parse_webp_frames(data)[0].image) == [[(33, 44, 55)]]


def test_dispose_to_background():
    """Disposal bit 1 restores the frame rectangle to the ANIM
    background before the NEXT frame composes."""
    data = _webp(
        _vp8x(2, 1),
        _anim(bg_rgba=(1, 2, 3, 255)),
        _anmf(0, 0, 2, 1, [BLUE, BLUE], dispose_bg=True),
        _anmf(0, 0, 1, 1, [GREEN]),
    )
    f0, f1 = parse_webp_frames(data)
    assert _rgb_rows(f0.image) == [[(0, 0, 255), (0, 0, 255)]]
    # frame 0's pixels are gone everywhere, not just under frame 1
    assert _rgb_rows(f1.image) == [[(0, 255, 0), (1, 2, 3)]]


def test_blend_with_opaque_source_equals_overwrite():
    """src-over with a=255 must equal the no-blend overwrite — the
    degenerate-blend identity."""
    px = [_argb(255, 10, 20, 30), _argb(255, 40, 50, 60)]
    mk = lambda nb: _webp(
        _vp8x(2, 1),
        _anim(bg_rgba=(200, 100, 0, 255)),
        _anmf(0, 0, 2, 1, px, no_blend=nb),
    )
    a = parse_webp_frames(mk(True))[0].image.raw
    b = parse_webp_frames(mk(False))[0].image.raw
    assert a == b


def test_still_files_yield_one_frame():
    """Non-animated WebP rides the same iterator: one frame, duration 0,
    pixels identical to the still decode path."""
    still = _encode_simple(2, 2, [BLUE, GREEN, BLUE, GREEN])
    frames = parse_webp_frames(still)
    assert len(frames) == 1 and frames[0].duration_ms == 0
    assert frames[0].image.raw == decode_webp_pixels(still).raw


def test_first_composed_frame_through_decode_webp_pixels():
    """The image dispatch's static view of an animation is frame 0
    fully composed (canvas-sized, background filled)."""
    data = _webp(
        _vp8x(3, 1),
        _anim(bg_rgba=(7, 7, 7, 255)),
        _anmf(0, 0, 1, 1, [GREEN]),
        _anmf(2, 0, 1, 1, [BLUE]),
    )
    img = decode_webp_pixels(data, origin="doc-a")
    assert (img.width, img.height) == (3, 1)
    assert _rgb_rows(img) == [[(0, 255, 0), (7, 7, 7), (7, 7, 7)]]


def test_decode_image_real_reports_animation_frames():
    data = _webp(
        _vp8x(2, 2),
        _anim(),
        _anmf(0, 0, 2, 2, [BLUE] * 4),
        _anmf(0, 0, 2, 2, [GREEN] * 4),
        _anmf(0, 0, 2, 2, [BLUE] * 4),
    )
    m = decode_image_real(data)
    assert (m["fmt"], m["width"], m["height"], m["n_frames"]) == (
        "webp", 2, 2, 3)


def test_lossy_frame_refuses_by_name():
    vp8_payload = b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 1, 1) + b"\x00" * 6
    data = _webp(
        _vp8x(2, 2),
        _anim(),
        _anmf(0, 0, 1, 1, None, image_chunk=_chunk(b"VP8 ", vp8_payload)),
    )
    with pytest.raises(NotImplementedError, match=r"doc-l: frame 0 is lossy VP8"):
        parse_webp_frames(data, origin="doc-l")


def test_structural_guards_are_loud():
    with pytest.raises(ValueError, match=r"outside the 2x2 canvas"):
        parse_webp_frames(_webp(
            _vp8x(2, 2), _anim(), _anmf(2, 0, 2, 1, [BLUE, BLUE])))
    with pytest.raises(ValueError, match=r"VP8L sub-image 2x1 != ANMF rectangle 1x1"):
        parse_webp_frames(_webp(
            _vp8x(2, 2), _anim(),
            _anmf(0, 0, 1, 1, None,
                  image_chunk=_chunk(b"VP8L", _vp8l_body(2, 1, [BLUE, BLUE])))))
    with pytest.raises(ValueError, match=r"ANMF frame before the ANIM chunk"):
        parse_webp_frames(_webp(_vp8x(2, 2), _anmf(0, 0, 1, 1, [BLUE])))
    with pytest.raises(ValueError, match=r"ANMF header of 4 bytes"):
        parse_webp_frames(_webp(_vp8x(2, 2), _anim(), _chunk(b"ANMF", b"\x00" * 4)))
    with pytest.raises(ValueError, match=r"frame 0 has no VP8L/VP8 image chunk"):
        parse_webp_frames(_webp(
            _vp8x(2, 2), _anim(),
            _anmf(0, 0, 1, 1, None, image_chunk=_chunk(b"XMP ", b"x"))))


def test_frame_and_pixel_bomb_guards():
    data = _webp(
        _vp8x(2, 2), _anim(),
        _anmf(0, 0, 1, 1, [BLUE]),
        _anmf(0, 0, 1, 1, [GREEN]),
        _anmf(0, 0, 1, 1, [BLUE]),
    )
    with pytest.raises(ValueError, match=r"more than 2 frames"):
        parse_webp_frames(data, max_frames=2)
    # the cap bounds WORK, not just frames counted: the raise comes before
    # the over-budget frame is composed, so an incremental consumer sees
    # exactly max_frames frames and then the error — never a third frame
    it = iter_webp_frames(data, max_frames=2)
    assert next(it).index == 0
    assert next(it).index == 1
    with pytest.raises(ValueError, match=r"more than 2 frames"):
        next(it)
    # a file with EXACTLY max_frames frames is within budget
    assert len(parse_webp_frames(data, max_frames=3)) == 3
    bomb = _webp(
        _vp8x(16000, 16000), _anim(), _chunk(b"ANMF", b"\x00" * 16))
    with pytest.raises(ValueError, match=r"pixel guard"):
        list(iter_webp_frames(bomb, max_pixels=1 << 20))


def test_frame_sampling_through_spark(spark):
    """every_n=2 over a 3-frame animation keeps frames 0 and 2; the
    sampled rows re-encode as canvas-sized PNGs."""
    from hbase_observer_es_spark.operators.png import decode_png

    data = _webp(
        _vp8x(2, 1),
        _anim(bg_rgba=(0, 0, 0, 255)),
        _anmf(0, 0, 2, 1, [BLUE, BLUE], dur=10),
        _anmf(0, 0, 1, 1, [GREEN], dur=20),
        _anmf(0, 0, 2, 1, [GREEN, BLUE], dur=30),
    )
    df = spark.createDataFrame([(5, data)], "doc_id long, payload binary")
    rows = sorted(
        webp_frames_frame(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    assert [(r.frame_idx, r.n_frames, r.duration_ms) for r in rows] == [
        (0, 3, 10), (2, 3, 30)]
    img = decode_png(bytes(rows[1].frame_png))
    assert (img.width, img.height) == (2, 1)
