"""Arithmetic-coded JPEG decode (operators/jpeg_arith.py) — T.81 Annex D.

Pinning strategy: the system libjpeg-turbo is the INDEPENDENT
real-world implementation (the same role pyarrow's libzstd plays for
zstd). ``tests/jpeghelper.c`` compiles against it at session scope and
encodes test images BOTH ways; because libjpeg produces identical
quantized coefficients for the Huffman and arithmetic encodings of the
same source, the two files must decode BIT-IDENTICALLY through this
package's shared IDCT — isolating exactly the entropy-decode layer. A
single wrong Table D.3 entry, context-bin offset, or register operation
diverges within the first MCU. A byte-golden flat-image stream pins the
decoder against a recorded libjpeg output even without the compiler.
"""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from hbase_observer_es_spark.operators.jpeg import decode_jpeg

_HELPER = None


def _helper(tmp_factory) -> str:
    global _HELPER
    if _HELPER is None:
        if shutil.which("gcc") is None:
            pytest.skip("gcc not available for the libjpeg cross-pin")
        out = str(tmp_factory.mktemp("jh") / "jpeghelper")
        import os

        src = os.path.join(os.path.dirname(__file__), "jpeghelper.c")
        r = subprocess.run(
            ["gcc", "-O2", "-o", out, src, "-ljpeg"], capture_output=True
        )
        if r.returncode != 0:
            pytest.skip(f"libjpeg helper did not compile: {r.stderr[:200]!r}")
        _HELPER = out
    return _HELPER


def _pnm(path, w, h, ch, px: bytes) -> None:
    magic = b"P6\n" if ch == 3 else b"P5\n"
    with open(path, "wb") as f:
        f.write(magic + f"{w} {h}\n255\n".encode() + px)


def _enc(helper, pnm, out, quality, arith, prog=0, *extra) -> bytes:
    subprocess.run(
        [helper, "enc", str(pnm), str(out), str(quality),
         "1" if arith else "0", str(prog), *map(str, extra)],
        check=True,
    )
    with open(out, "rb") as f:
        return f.read()


_SHAPES = [
    ("gray8", 8, 8, 1), ("gray_odd", 17, 23, 1), ("gray_big", 64, 48, 1),
    ("rgb_mcu", 16, 16, 3), ("rgb_odd", 61, 37, 3), ("rgb_big", 96, 64, 3),
]


@pytest.mark.parametrize("quality", [30, 75, 95])
def test_arith_pixels_bit_identical_to_huffman_twin(tmp_path_factory, quality):
    """Same source, same quality, Huffman vs arithmetic entropy coding:
    libjpeg's quantized coefficients are identical, so our two decodes
    must match byte for byte."""
    helper = _helper(tmp_path_factory)
    tmp = tmp_path_factory.mktemp("imgs")
    rng = random.Random(42 + quality)
    saw_stuffing = False
    for name, w, h, ch in _SHAPES:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        pnm = tmp / f"{name}.pnm"
        _pnm(pnm, w, h, ch, px)
        a = _enc(helper, pnm, tmp / "a.jpg", quality, True)
        hf = _enc(helper, pnm, tmp / "h.jpg", quality, False)
        ia = decode_jpeg(a, name)
        ih = decode_jpeg(hf, name)
        assert (ia.width, ia.height, ia.channels) == (w, h, ch)
        assert ia.raw == ih.raw, (name, quality)
        saw_stuffing = saw_stuffing or b"\xff\x00" in a[a.find(b"\xff\xda"):]
    # at least one arithmetic stream must have exercised 0xFF00 byte
    # stuffing, or the matrix isn't covering the stuffing path
    if quality == 95:
        assert saw_stuffing


def test_restart_intervals_and_dac_conditioning(tmp_path_factory):
    """RSTn handling (full statistics + register reset per marker) and
    non-default DAC conditioning (L/U reclassification thresholds, the
    Kx high-bin split) against the independent encoder."""
    helper = _helper(tmp_path_factory)
    tmp = tmp_path_factory.mktemp("rst")
    rng = random.Random(11)
    w, h = 96, 64
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    pnm = tmp / "r.pnm"
    _pnm(pnm, w, h, 3, px)
    for rst in (1, 2, 5):
        for cond in ((), ("1,3", "20"), ("0,2", "1")):
            a = _enc(helper, pnm, tmp / "a.jpg", 85, True, 0, rst, *cond)
            hf = _enc(helper, pnm, tmp / "h.jpg", 85, False, 0, rst)
            assert decode_jpeg(a, "a").raw == decode_jpeg(hf, "h").raw, (
                rst, cond,
            )


# libjpeg-turbo 2.1.x output for a flat-137 16x16 grayscale at quality
# 90 with arithmetic coding — recorded so the decoder stays pinned to a
# real encoder's bytes even where no compiler is available. The decoded
# image is exactly flat 137 (DC diff 24 in the first block, zero after).
_FLAT_ARITH = bytes.fromhex(
    "ffd8ffe000104a46494600010100000100010000ffdb0043000302020302"
    "020303030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d"
    "0e12100d0e110e0b0b1016101113141515150c0f171816141812141514ff"
    "c9000b080010001001011100ffcc000600101005ffda0008010100003f00"
    "d1d2a0ffd9"
)


def test_flat_byte_golden_decodes_exactly():
    img = decode_jpeg(_FLAT_ARITH, "flat-golden")
    assert (img.width, img.height, img.channels) == (16, 16, 1)
    assert set(img.raw) == {137}


def test_flat_golden_matches_live_encoder(tmp_path_factory):
    """The recorded golden is exactly what the system encoder emits —
    catches a stale golden if the helper's libjpeg ever changes."""
    helper = _helper(tmp_path_factory)
    tmp = tmp_path_factory.mktemp("flat")
    pnm = tmp / "flat.pgm"
    _pnm(pnm, 16, 16, 1, bytes([137]) * 256)
    live = _enc(helper, pnm, tmp / "f.jpg", 90, True)
    assert live == _FLAT_ARITH


@pytest.mark.parametrize("quality", [40, 85])
def test_progressive_arith_bit_identical_to_huffman_progressive(
    tmp_path_factory, quality
):
    """SOF10 vs progressive Huffman of the same source: identical
    coefficients through libjpeg's standard scan script (DC
    first/refine + AC bands with successive approximation), so our two
    decodes must match byte for byte — pinning every G.2 scan model."""
    helper = _helper(tmp_path_factory)
    tmp = tmp_path_factory.mktemp("prog")
    rng = random.Random(5 + quality)
    for name, w, h, ch in [("g", 32, 24, 1), ("c", 48, 40, 3),
                           ("co", 61, 37, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        pnm = tmp / f"{name}.pnm"
        _pnm(pnm, w, h, ch, px)
        a = _enc(helper, pnm, tmp / "pa.jpg", quality, True, 1)
        hf = _enc(helper, pnm, tmp / "ph.jpg", quality, False, 1)
        assert decode_jpeg(a, "pa").raw == decode_jpeg(hf, "ph").raw, (
            name, quality,
        )


def test_progressive_arith_restarts(tmp_path_factory):
    helper = _helper(tmp_path_factory)
    tmp = tmp_path_factory.mktemp("prst")
    rng = random.Random(9)
    w, h = 64, 48
    pnm = tmp / "pr.pnm"
    _pnm(pnm, w, h, 3, bytes(rng.randrange(256) for _ in range(w * h * 3)))
    for rst in (1, 3):
        a = _enc(helper, pnm, tmp / "pa.jpg", 80, True, 1, rst)
        hf = _enc(helper, pnm, tmp / "ph.jpg", 80, False, 1, rst)
        assert decode_jpeg(a, "pa").raw == decode_jpeg(hf, "ph").raw, rst


def test_sof11_arith_lossless_still_refuses():
    data = bytearray(_FLAT_ARITH)
    i = data.find(b"\xff\xc9")
    data[i + 1] = 0xCB
    with pytest.raises(ValueError, match="arithmetic-coded lossless"):
        decode_jpeg(bytes(data), "sof11")


def test_sof10_incomplete_scan_script_is_loud():
    """A SOF10 stream whose only scan is the sequential full scan
    violates the annex-G DC-scan constraint — same fail-loud scan
    script discipline as the Huffman progressive path."""
    data = bytearray(_FLAT_ARITH)
    i = data.find(b"\xff\xc9")
    data[i + 1] = 0xCA
    with pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg(bytes(data), "sof10-script")


def test_dac_refusals():
    from hbase_observer_es_spark.operators.jpeg_arith import _parse_dac

    with pytest.raises(ValueError, match="length 3 is odd"):
        _parse_dac(b"\x00\x01\x02", {}, {}, "x")
    with pytest.raises(ValueError, match="table id 5 outside"):
        _parse_dac(b"\x05\x01", {}, {}, "x")
    with pytest.raises(ValueError, match=r"L=3 > U=1"):
        _parse_dac(b"\x00\x13", {}, {}, "x")
    with pytest.raises(ValueError, match=r"Kx=0 outside"):
        _parse_dac(b"\x10\x00", {}, {}, "x")
    with pytest.raises(ValueError, match="class 2 invalid"):
        _parse_dac(b"\x20\x05", {}, {}, "x")


def test_corrupt_entropy_raises_on_category_cap():
    """Truncating the entropy segment early makes the decoder run on
    0-bit marker fill; the statistical caps keep the failure bounded —
    either a loud range error or a structurally complete (wrong) image,
    never an unbounded loop or allocation."""
    i = _FLAT_ARITH.find(b"\xff\xd1")  # inside entropy data
    clipped = _FLAT_ARITH[: i + 1]
    try:
        img = decode_jpeg(clipped, "clipped")
        assert len(img.raw) == 256  # bounded, structurally complete
    except ValueError:
        pass  # loud refusal is equally acceptable


def test_fixed_sign_state_never_adapts():
    from hbase_observer_es_spark.operators.jpeg_arith import _QE, _FIXED

    qe, nmps, nlps, sw = _QE[_FIXED]
    assert (nmps, nlps, sw) == (_FIXED, _FIXED, 0)
    assert qe == 0x5A1D


def test_second_frame_headers_stay_loud():
    """r16 review: removing SOF9/SOF10 from the refusal table must not
    regress duplicate-frame detection into a silent skip — a second SOF
    of ANY flavor raises in the sequential-arithmetic walk, and an
    SOF10 inside a Huffman-progressive stream raises too."""
    for second in (0xC0, 0xC2, 0xCA):
        data = bytearray(_FLAT_ARITH)
        i = data.find(b"\xff\xda")
        # splice a fake SOF segment before SOS
        sof = bytes([0xFF, second, 0x00, 0x0B, 8, 0, 16, 0, 16, 1, 1, 0x11, 0])
        spliced = bytes(data[:i]) + sof + bytes(data[i:])
        with pytest.raises(ValueError, match="second frame header"):
            decode_jpeg(spliced, f"dup-{second:02x}")
