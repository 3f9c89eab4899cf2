"""AVI container vs the public RIFF/AVI spec: hand-built containers
carrying real from-spec JPEG frames and raw DIB frames, frame sampling
through Spark, and refusals by name."""

from __future__ import annotations

import struct

import pytest

from hbase_observer_es_spark.operators.avi import (
    avi_frames_frame,
    iter_avi_frames,
    looks_like_avi,
    parse_avi,
)
from hbase_observer_es_spark.operators.jpeg import decode_jpeg, encode_jpeg
from hbase_observer_es_spark.operators.png import PngImage

# ---------------------------------------------------------- test builders


def _chunk(cc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _avih(n_frames: int, w: int, h: int) -> bytes:
    return struct.pack("<IIIIIIIIII4I", 100_000, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0)


def _strh(fcc_type: bytes, handler: bytes, scale: int, rate: int, length: int) -> bytes:
    return (
        fcc_type + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0, length, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0)
    )


def _strf_video(w: int, h: int, bits: int, comp: int) -> bytes:
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp, 0, 0, 0, 0, 0)


_MJPG = int.from_bytes(b"MJPG", "little")


def _avi(
    frames,
    w,
    h,
    scale=1,
    rate=10,
    comp=_MJPG,
    bits=24,
    height_sign=1,
    chunk_cc=b"00dc",
    extra_streams=b"",
    movi_extra=b"",
    wrap_rec=False,
) -> bytes:
    strl = _list(
        b"strl",
        _chunk(b"strh", _strh(b"vids", b"MJPG", scale, rate, len(frames)))
        + _chunk(b"strf", _strf_video(w, h * height_sign, bits, comp)),
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", _avih(len(frames), w, h)) + extra_streams + strl)
    inner = movi_extra + b"".join(_chunk(chunk_cc, f) for f in frames)
    if wrap_rec:
        inner = _list(b"rec ", inner)
    movi = _list(b"movi", inner)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gray_img(w, h, seed=0):
    raw = bytes(((x * 7 + y * 13 + seed * 31) % 200 + 20) for y in range(h) for x in range(w))
    return PngImage(w, h, 8, 0, 1, w, raw, None)


def _rgb_img(w, h, seed=0):
    raw = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 8 + seed) % 256, (y * 8) % 256, ((x + y) * 4) % 256)
    )
    return PngImage(w, h, 8, 2, 3, w * 3, raw, None)


# ---------------------------------------------------------------- goldens


def test_mjpeg_frames_decode_and_time_exactly():
    jpegs = [encode_jpeg(_rgb_img(16, 16, seed=s), quality=90) for s in range(3)]
    data = _avi(jpegs, 16, 16, scale=1001, rate=30000)
    stream, frames = parse_avi(data)
    assert (stream.codec, stream.width, stream.height) == ("mjpg", 16, 16)
    assert stream.frame_duration_us == (1001 * 1_000_000) // 30000  # 33366
    assert len(frames) == 3
    for payload, img in zip(jpegs, frames):
        assert img.raw == decode_jpeg(payload).raw  # container adds nothing


def test_gray_mjpeg_widens_to_rgb():
    jpeg = encode_jpeg(_gray_img(8, 8), quality=100)
    gray = decode_jpeg(jpeg)
    _, frames = parse_avi(_avi([jpeg], 8, 8))
    assert frames[0].channels == 3
    assert frames[0].raw[0:3] == bytes([gray.raw[0]] * 3)


def test_dib_bottom_up_bgr_and_padding():
    """2x2 24-bit DIB: rows pad to 8 bytes, storage is bottom-up BGR.
    Stored rows: bottom=(blue, green), top=(red, white) in BGR order."""
    bottom = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # blue, green + pad
    top = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red, white + pad
    data = _avi([bottom + top], 2, 2, comp=0, chunk_cc=b"00db")
    stream, frames = parse_avi(data)
    assert stream.codec == "dib"
    img = frames[0]
    assert tuple(img.raw[0:3]) == (255, 0, 0)      # top-left = red
    assert tuple(img.raw[3:6]) == (255, 255, 255)  # top-right = white
    assert tuple(img.raw[6:9]) == (0, 0, 255)      # bottom-left = blue
    assert tuple(img.raw[9:12]) == (0, 255, 0)     # bottom-right = green


def test_dib_topdown_negative_height():
    row0 = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"
    row1 = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"
    data = _avi([row0 + row1], 2, 2, comp=0, height_sign=-1, chunk_cc=b"00db")
    _, frames = parse_avi(data)
    assert tuple(frames[0].raw[0:3]) == (0, 0, 255)  # stored row 0 IS the top


def test_rec_grouping_and_foreign_chunks_skipped():
    jpeg = encode_jpeg(_rgb_img(8, 8), quality=100)
    audio = _chunk(b"01wb", b"\x01\x02\x03\x04")
    data = _avi([jpeg], 8, 8, movi_extra=audio, wrap_rec=True)
    _, frames = parse_avi(data)
    assert len(frames) == 1


def test_second_stream_selected_when_first_is_audio():
    """An audio strl before the video strl: the video track is stream 1,
    so its chunks are 01dc and 00wb audio chunks are skipped."""
    audio_strl = _list(
        b"strl",
        _chunk(b"strh", _strh(b"auds", b"\x00\x00\x00\x00", 1, 8000, 100))
        + _chunk(b"strf", b"\x00" * 16),
    )
    jpeg = encode_jpeg(_rgb_img(8, 8), quality=100)
    data = _avi(
        [jpeg], 8, 8, chunk_cc=b"01dc", extra_streams=audio_strl,
        movi_extra=_chunk(b"00wb", b"\xaa\xbb"),
    )
    stream, frames = parse_avi(data)
    assert stream.stream_id == 1 and len(frames) == 1


# ------------------------------------------------------------- fail-loud


def _valid() -> bytes:
    return _avi([encode_jpeg(_rgb_img(8, 8), quality=100)], 8, 8)


def test_looks_like_avi():
    assert looks_like_avi(_valid())
    assert not looks_like_avi(b"RIFFxxxxWAVE")


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: d[:8] + b"WAVE" + d[12:], r"not a RIFF/AVI"),
        (lambda d: d[:4] + struct.pack("<I", 5) + d[8:], r"RIFF size 5"),
        (lambda d: d.replace(b"hdrl", b"xxxx"), r"missing hdrl"),
        (lambda d: d.replace(b"movi", b"xxxx"), r"missing movi"),
        (lambda d: d.replace(b"vids", b"auds"), r"no video \(vids\) stream"),
    ],
)
def test_container_violations(mutate, msg):
    with pytest.raises(ValueError, match=msg):
        parse_avi(mutate(_valid()))


def test_unsupported_codecs_refused_by_name():
    jpeg = encode_jpeg(_rgb_img(8, 8), quality=100)
    xvid = _avi([jpeg], 8, 8, comp=int.from_bytes(b"XVID", "little"))
    with pytest.raises(ValueError, match=r"mpeg-4 \(xvid\) unsupported"):
        parse_avi(xvid)
    with pytest.raises(ValueError, match=r"raw DIB at 8 bpp unsupported"):
        parse_avi(_avi([b"\x00"], 8, 8, comp=0, bits=8))
    with pytest.raises(ValueError, match=r"zero frame timing"):
        parse_avi(_avi([jpeg], 8, 8, scale=0))


def test_frame_geometry_mismatch_is_loud():
    wrong = encode_jpeg(_rgb_img(16, 8), quality=100)
    with pytest.raises(ValueError, match=r"decodes to 16x8 but the stream"):
        parse_avi(_avi([wrong], 8, 8))
    short_dib = _avi([b"\x00" * 10], 2, 2, comp=0, chunk_cc=b"00db")
    with pytest.raises(ValueError, match=r"DIB payload 10 bytes != 8x2"):
        parse_avi(short_dib)


def test_empty_movi_is_loud():
    with pytest.raises(ValueError, match=r"carries no video frames"):
        parse_avi(_avi([], 8, 8))


def test_corrupt_frame_names_its_index():
    good = encode_jpeg(_rgb_img(8, 8), quality=100)
    bad = good[:20]  # truncated JPEG
    it = iter_avi_frames(_avi([good, bad], 8, 8), origin="doc-5")
    next(it)  # stream header
    next(it)  # frame 0 decodes
    with pytest.raises(ValueError, match=r"jpeg doc-5#frame1"):
        next(it)


# ------------------------------------------------- the Spark fan-out


def test_avi_frames_through_spark(spark):
    jpegs = [encode_jpeg(_rgb_img(8, 8, seed=s), quality=100) for s in range(5)]
    payload = _avi(jpegs, 8, 8, scale=1, rate=4)  # 250000 us per frame
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = sorted(avi_frames_frame(df, every_n=2).collect(), key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.n_frames, r.ts_us, r.width, r.height) for r in rows] == [
        (0, 5, 0, 8, 8), (2, 5, 500000, 8, 8), (4, 5, 1000000, 8, 8)
    ]
    from hbase_observer_es_spark.operators.png import decode_png

    first = decode_png(bytes(rows[0].frame_png))
    assert first.raw == decode_jpeg(jpegs[0]).raw
    with pytest.raises(ValueError, match=r"every_n 0"):
        avi_frames_frame(df, every_n=0)


def test_declared_frame_count_mismatch_is_loud(spark):
    """strh says 5 frames, movi carries 1: both the list path and the
    Spark fan-out refuse."""
    jpeg = encode_jpeg(_rgb_img(8, 8), quality=100)
    data = _avi([jpeg], 8, 8)
    lying = data.replace(
        _strh(b"vids", b"MJPG", 1, 10, 1), _strh(b"vids", b"MJPG", 1, 10, 5)
    )
    assert lying != data
    with pytest.raises(ValueError, match=r"declares 5 frames but the movi list carries 1"):
        parse_avi(lying)
    df = spark.createDataFrame([(1, lying)], "doc_id long, payload binary")
    with pytest.raises(Exception, match=r"declares 5 frames"):
        avi_frames_frame(df).collect()


def test_frameless_container_is_loud_in_fanout(spark):
    df = spark.createDataFrame([(1, _avi([], 8, 8))], "doc_id long, payload binary")
    with pytest.raises(Exception, match=r"carries no video frames"):
        avi_frames_frame(df).collect()


def test_sampler_skips_decode_of_untaken_frames(spark, monkeypatch):
    """every_n=2 over 4 frames decodes exactly 2 — the raw walk locates
    the rest without paying the codec."""
    import hbase_observer_es_spark.operators.avi as avimod

    calls = []
    real = avimod.decode_avi_frame

    def counting(stream, idx, payload, origin="<bytes>"):
        calls.append(idx)
        return real(stream, idx, payload, origin)

    monkeypatch.setattr(avimod, "decode_avi_frame", counting)
    jpegs = [encode_jpeg(_rgb_img(8, 8, seed=s), quality=100) for s in range(4)]
    stream_it = avimod.iter_avi_raw(_avi(jpegs, 8, 8))
    stream = next(stream_it)
    taken = [
        counting(stream, i, p) for i, p in stream_it if i % 2 == 0
    ]
    assert len(taken) == 2 and calls == [0, 2]


def test_write_avi_mjpeg_roundtrips():
    from hbase_observer_es_spark.operators.avi import write_avi_mjpeg

    jpegs = [encode_jpeg(_rgb_img(8, 8, seed=s), quality=100) for s in range(3)]
    data = write_avi_mjpeg(jpegs, 8, 8, scale=1, rate=25)
    assert data == write_avi_mjpeg(jpegs, 8, 8, scale=1, rate=25)
    stream, frames = parse_avi(data)
    assert (stream.codec, stream.width, stream.rate, len(frames)) == ("mjpg", 8, 25, 3)
    for payload, img in zip(jpegs, frames):
        assert img.raw == decode_jpeg(payload).raw
    with pytest.raises(ValueError, match=r"zero frames"):
        write_avi_mjpeg([], 8, 8)
