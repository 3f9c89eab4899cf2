"""From-spec zstd decoder (operators/zstd.py) — RFC 8878.

Pinning strategy per the repo codec discipline: an INDEPENDENT
real-world encoder (pyarrow's bundled libzstd) round-trips the decoder
across compression levels and input shapes chosen to force every
section type (raw/RLE/compressed literals, 1- and 4-stream Huffman,
direct and FSE-compressed weight descriptions, predefined/RLE/FSE/repeat
sequence tables, repeated offsets, treeless literals, multi-block
frames); hand-assembled frames pin the paths an encoder rarely emits
(raw/RLE blocks, checksum, content-size declarations) byte-for-byte;
refusal/corruption cases pin the by-name contract; hypothesis closes
the loop on arbitrary inputs.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_observer_es_spark.operators.zstd import (
    _xxh64,
    decompress_zstd,
    is_zstd,
)


def _z(data: bytes, level: int = 3) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)


# ------------------------------------------------------------ round trips

_RNG = random.Random(42)
_INPUTS = {
    "empty": b"",
    "one": b"x",
    "rle": b"a" * 100_000,
    "text": b"the quick brown fox jumps over the lazy dog. " * 5_000,
    # short repeated runs at varying distances: repeated-offset codes
    "structured": b"".join(bytes([i % 251]) * (i % 17 + 1) for i in range(20_000)),
    # incompressible: raw blocks / raw literals
    "random": bytes(_RNG.randrange(256) for _ in range(300_000)),
    # low-entropy symbol soup: FSE-compressed tables, 4-stream Huffman
    "semirandom": bytes(_RNG.randrange(16) for _ in range(200_000)),
    # long-range matches across the 128 KiB block boundary: treeless
    # literals + Repeat_Mode sequence tables in later blocks
    "bigrepeat": bytes(range(256)) * 2_000,
    "json_ish": b'{"key": "value", "arr": [1,2,3]} ' * 9_000,
}


@pytest.mark.parametrize("name", sorted(_INPUTS))
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_round_trip_vs_real_encoder(name, level):
    data = _INPUTS[name]
    comp = _z(data, level)
    assert is_zstd(comp)
    assert decompress_zstd(comp, max_output=1 << 26) == data


def test_concatenated_frames_decode_in_sequence():
    a, b = b"first frame " * 100, b"second " * 257
    assert decompress_zstd(_z(a) + _z(b, 19)) == a + b


# ----------------------------------------------------- hand-built frames


def _frame(fhd: int, body: bytes, magic: int = 0xFD2FB528) -> bytes:
    return magic.to_bytes(4, "little") + bytes([fhd]) + body


def test_hand_built_raw_block():
    # single-segment (0x20): 1-byte FCS, no window descriptor
    payload = _frame(0x20, bytes([5]) + bytes([1 | (5 << 3), 0, 0]) + b"hello")
    assert decompress_zstd(payload) == b"hello"


def test_hand_built_rle_block():
    # RLE block: size field is the REGENERATED count, payload one byte
    payload = _frame(0x20, bytes([7]) + bytes([1 | 2 | (7 << 3), 0, 0]) + b"a")
    assert decompress_zstd(payload) == b"aaaaaaa"


def test_hand_built_multi_block_and_window_descriptor():
    # non-single-segment: window descriptor, no FCS (flag 0)
    body = bytes([0x00])  # window log 10
    body += bytes([0 | (3 << 3), 0, 0]) + b"abc"  # raw, not last
    body += bytes([1 | 2 | (4 << 3), 0, 0]) + b"z"  # RLE, last
    assert decompress_zstd(_frame(0x00, body)) == b"abczzzz"


def test_content_checksum_verifies_and_mismatches_loudly():
    content = b"checksummed content"
    want = (_xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    body = (
        bytes([len(content)])
        + bytes([1 | (len(content) << 3), 0, 0])
        + content
    )
    ok = _frame(0x20 | 0x04, body + want)
    assert decompress_zstd(ok) == content
    bad = bytearray(ok)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch"):
        decompress_zstd(bytes(bad))


def test_declared_content_size_is_enforced():
    payload = _frame(0x20, bytes([6]) + bytes([1 | (5 << 3), 0, 0]) + b"hello")
    with pytest.raises(ValueError, match="declared 6 content bytes but decoded 5"):
        decompress_zstd(payload)


def test_truncated_real_frame_raises_with_offset():
    # a real encoder frame cut short must die on a structural check
    # (declared sizes past the payload end), never return partial output
    comp = _z(b"the quick brown fox " * 500, 3)
    with pytest.raises(ValueError, match=r"zstd .*byte \d+"):
        decompress_zstd(comp[: len(comp) - 4])


# ------------------------------------------------------------- refusals


def test_dictionary_frame_without_dictionary_names_the_id():
    # dict-flag 1, window descriptor, nonzero 1-byte dictionary id —
    # since r16 this is MISSING INPUT (ValueError naming the id), not a
    # missing feature: supply the dictionary and the frame decodes
    payload = _frame(0x01, bytes([0x00, 0x05]))
    with pytest.raises(
        ValueError, match="requires dictionary id 5 but no dictionary"
    ):
        decompress_zstd(payload)


def test_skippable_frames_are_skipped():
    """RFC 8878 §3.1.2: conforming decoders skip skippable frames —
    pzstd/seekable-zstd shards carry them, and ingest must agree with
    zstd_meta's census walk (r15 ADVICE). Truncated ones stay loud."""
    sk = (0x184D2A53).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    real = _z(b"payload after the metadata frame")
    assert decompress_zstd(sk + real) == b"payload after the metadata frame"
    assert decompress_zstd(real + sk) == b"payload after the metadata frame"
    assert decompress_zstd(sk) == b""  # only-metadata: empty content
    with pytest.raises(ValueError, match="skippable frame header truncated"):
        decompress_zstd(sk[:6])
    with pytest.raises(ValueError, match="past the payload end"):
        decompress_zstd(sk[:-2])


def test_corruption_raises_with_offsets():
    with pytest.raises(ValueError, match="bad frame magic"):
        decompress_zstd(b"\x00\x01\x02\x03rest")
    with pytest.raises(ValueError, match="no frame header"):
        decompress_zstd(b"\x28\xb5")
    # reserved block type
    payload = _frame(0x20, bytes([0]) + bytes([1 | (3 << 1), 0, 0]))
    with pytest.raises(ValueError, match="reserved block type"):
        decompress_zstd(payload)
    # reserved frame-descriptor bit
    with pytest.raises(ValueError, match="reserved frame-descriptor bit"):
        decompress_zstd(_frame(0x20 | 0x08, bytes([0])))
    # truncated block header
    with pytest.raises(ValueError, match="block header truncated"):
        decompress_zstd(_frame(0x20, bytes([9, 0x29])))
    # raw block declaring bytes past the payload end
    with pytest.raises(ValueError, match="past the payload end"):
        decompress_zstd(_frame(0x20, bytes([5]) + bytes([1 | (5 << 3), 0, 0]) + b"he"))


def test_output_budget_is_a_loud_guard():
    comp = _z(b"a" * 1_000_000, 3)
    with pytest.raises(ValueError, match="exceeds the 1024-byte budget"):
        decompress_zstd(comp, max_output=1024)


# --------------------------------------------------------------- XXH64


def test_xxh64_known_vectors():
    """Published XXH64 test vectors (seed 0)."""
    assert _xxh64(b"") == 0xEF46DB3751D8E999
    assert _xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert _xxh64(b"abc") == 0x44BC2CF5AD770999
    assert _xxh64(b"Hello, world!") == 0xF58336A78B6F9476


# ----------------------------------------------------------- hypothesis


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_round_trip_property_arbitrary_bytes(data):
    assert decompress_zstd(_z(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=8), st.integers(1, 400)),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([1, 3, 19]),
)
def test_round_trip_property_compressible(runs, level):
    data = b"".join(chunk * n for chunk, n in runs)
    assert decompress_zstd(_z(data, level), max_output=1 << 22) == data


# ------------------------------------------- review-batch regressions (r15)

def _backstream(bits: str) -> bytes:
    """Backward bitstream: sentinel 1 then `bits` read MSB-first."""
    v = int("1" + bits, 2)
    return v.to_bytes((v.bit_length() + 7) // 8, "little")


def test_sequence_expansion_budget_checked_before_copy():
    """A block whose SEQUENCES expand to far beyond the block maximum
    must raise from the pre-copy closed-form check (sum of match
    lengths), never materialize gigabytes first. RLE tables: ll=0,
    of_code=3 (+3 bits -> offset 8), ml_code=52 (+16 bits -> ~131KB per
    sequence), 200 sequences ~ 26 MB >> the 1 KiB window block max."""
    nseq = 200
    seq_bits = ("011" + "1" * 16) * nseq  # of extra=0b011, ml extra=0xFFFF
    bitstream = _backstream(seq_bits)
    body = (
        b"\x00"  # literals: raw, regenerated size 0
        + bytes([0x80 + (nseq >> 8), nseq & 0xFF])  # 2-byte sequence count
        + bytes([0x54])  # LL/OF/ML all RLE mode
        + bytes([0, 3, 52])  # RLE symbols
        + bitstream
    )
    payload = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x00, 0x00])  # fhd: window descriptor follows; wlog 10
        + bytes([0 | (8 << 3), 0, 0]) + b"abcdefgh"  # raw block: history
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body
    )
    with pytest.raises(ValueError, match="block maximum"):
        decompress_zstd(payload, max_output=1 << 26)


def test_match_cannot_reach_into_previous_frame():
    """Frames are independent: a second frame whose first sequence's
    offset reaches into frame 1's output is corrupt, not history."""
    frame1 = _frame(0x20, bytes([4]) + bytes([1 | (4 << 3), 0, 0]) + b"ABCD")
    seq_bits = "11"  # of extra bits for of_code=2 -> ofv=4+3=7 -> offset 4
    bitstream = _backstream(seq_bits)
    body = (
        b"\x00"  # literals: raw, 0 bytes
        + bytes([1])  # one sequence
        + bytes([0x54])  # all RLE
        + bytes([0, 2, 0])  # ll=0, of_code=2, ml_code=0 (ml=3)
        + bitstream
    )
    frame2 = _frame(
        0x00,
        bytes([0x00])
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body,
    )
    with pytest.raises(ValueError, match="frame history"):
        decompress_zstd(frame1 + frame2)


def test_match_offset_bounded_by_declared_window():
    """RFC 8878 §3.1.1.4: a match may not reach further back than the
    frame's declared Window_Size even when enough frame history exists
    (libzstd-strict, r15 ADVICE). Window log 10 = 1024; two 600-byte
    raw blocks give 1200 bytes of history; offset 1103 is inside the
    history but over the window — must refuse by the window, not the
    history, check."""
    ofv = 1103 + 3  # offset + 3
    of_code = ofv.bit_length() - 1  # 10
    extra = ofv - (1 << of_code)
    seq_bits = format(extra, f"0{of_code}b")
    body = (
        b"\x00"  # literals: raw, regenerated size 0
        + bytes([1])  # one sequence
        + bytes([0x54])  # LL/OF/ML all RLE mode
        + bytes([0, of_code, 0])  # ll=0, of extra bits, ml_code=0 (ml=3)
        + _backstream(seq_bits)
    )
    payload = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x00, 0x00])  # fhd: window descriptor follows; wlog 10
        + (0 | (600 << 3)).to_bytes(3, "little") + b"a" * 600
        + (0 | (600 << 3)).to_bytes(3, "little") + b"b" * 600
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body
    )
    with pytest.raises(ValueError, match="declared 1024-byte window"):
        decompress_zstd(payload)


def test_block_size_bounded_by_block_maximum():
    """Block_Size may not exceed Block_Maximum_Size = min(window,
    128 KiB) for raw and compressed blocks alike (RFC 8878 §3.1.1.2;
    libzstd-strict, r15 ADVICE). Window log 10 -> block max 1024."""
    # raw block declaring 2000 regenerated bytes
    payload = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x00, 0x00])
        + (1 | (2000 << 3)).to_bytes(3, "little") + b"x" * 2000
    )
    with pytest.raises(ValueError, match="over the 1024 block maximum"):
        decompress_zstd(payload)
    # compressed block declaring 2000 wire bytes — refused BEFORE parsing
    payload = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x00, 0x00])
        + (1 | (2 << 1) | (2000 << 3)).to_bytes(3, "little") + b"\xff" * 2000
    )
    with pytest.raises(ValueError, match="over the 1024 block maximum"):
        decompress_zstd(payload)


def test_fse_zero_run_is_capped_inside_the_repeat_loop():
    """A 64 KiB run of 0b11 repeat groups must raise at the symbol cap,
    not build a multi-million-entry list first."""
    from hbase_observer_es_spark.operators.zstd import _FwdBits, _fse_read_dist

    # LSB-first: 4 bits AL=0 (-> 5), 5-bit probability value 1 (-> p=0),
    # then endless 0b11 repeat groups
    data = b"\x10\xfe" + b"\xff" * 65536
    with pytest.raises(ValueError, match="more than 36 symbols"):
        _fse_read_dist(_FwdBits(data, 0), 9, 35, "t")


def test_huffman_stream_with_phantom_padding_bits_refuses():
    """A final symbol that consumed past the sentinel (zero-padded
    phantom bits) is corrupt even when the symbol count matches."""
    from hbase_observer_es_spark.operators.zstd import (
        _huf_build,
        _huf_decode_stream,
    )

    table, log = _huf_build([2, 1], "t", 0)  # implicit third weight 1
    assert log == 2
    # stream b'\x02': sentinel at bit 1, ONE real bit (0); peeking 2 bits
    # pads a phantom zero and selects a 2-bit symbol
    with pytest.raises(ValueError, match="phantom bits"):
        _huf_decode_stream(table, log, b"\x02", 1, "t", 0)


# ------------------------------------------------------- encoder (r15)

def test_store_encoder_round_trips_both_decoders():
    """compress_zstd is pinned by an INDEPENDENT decoder (pyarrow's
    libzstd) and by our own; deterministic; checksum verified."""
    from hbase_observer_es_spark.operators.zstd import compress_zstd

    cases = [
        b"", b"x", b"a" * 100_000,
        bytes(_RNG.randrange(256) for _ in range(300_000)),
        b"ab" + b"z" * 500 + b"tail",
        b"run" * 10 + bytes(200),
        b"q" * 300,  # 256..65791 FCS form
    ]
    for data in cases:
        c = compress_zstd(data)
        assert decompress_zstd(c, max_output=1 << 22) == data
        assert pa.Codec("zstd").decompress(
            c, decompressed_size=len(data), asbytes=True
        ) == data
        assert compress_zstd(data) == c
    # checksum is real: flip a content byte in a raw block
    c = bytearray(compress_zstd(b"hello world, checked"))
    c[-6] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch"):
        decompress_zstd(bytes(c))


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300_000))
def test_store_encoder_round_trip_property(data):
    from hbase_observer_es_spark.operators.zstd import compress_zstd

    c = compress_zstd(data)
    assert decompress_zstd(c, max_output=1 << 20) == data
    assert pa.Codec("zstd").decompress(
        c, decompressed_size=len(data), asbytes=True
    ) == data


def test_store_encoder_frames_decode_with_the_system_cli():
    """Third independent implementation: the system zstd CLI must accept
    our frames — incl. a >8 MiB payload, which must NOT be emitted as a
    single-segment frame (streaming decoders cap the window at 128 MiB
    and RFC 8878 interop at 8 MiB; r15 review finding)."""
    import shutil
    import subprocess
    import tempfile, os

    from hbase_observer_es_spark.operators.zstd import compress_zstd

    if not shutil.which("zstd"):
        pytest.skip("no system zstd CLI on this host")
    big = bytes(_RNG.randrange(256) for _ in range(1 << 20)) * 10  # 10 MiB
    for data in (b"hello world " * 300, big):
        with tempfile.TemporaryDirectory() as d:
            f = os.path.join(d, "x.zst")
            with open(f, "wb") as fh:
                fh.write(compress_zstd(data))
            r = subprocess.run(["zstd", "-d", "-c", f], capture_output=True)
            assert r.returncode == 0, r.stderr[:200]
            assert r.stdout == data


def test_zstd_meta_truncation_is_loud():
    """r15 review: zstd_meta must refuse truncated checksums, truncated
    frame headers, and skippable frames declaring bytes past the end —
    the census would otherwise report a truncated blob as clean."""
    from hbase_observer_es_spark.operators.zstd import compress_zstd, zstd_meta

    with pytest.raises(ValueError, match="content checksum truncated"):
        zstd_meta(compress_zstd(b"hello world")[:-2])
    with pytest.raises(ValueError, match="frame header truncated"):
        zstd_meta(b"\x28\xb5\x2f\xfd")
    sk = (0x184D2A50).to_bytes(4, "little") + (100).to_bytes(4, "little") + b"x"
    with pytest.raises(ValueError, match="past the payload end"):
        zstd_meta(compress_zstd(b"x") + sk)
    # a VALID skippable frame is stepped over (survey semantics)
    ok = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
    m = zstd_meta(ok + compress_zstd(b"xy"))
    assert (m["n_frames"], m["content_size"]) == (1, 2)


# ---------------------------------------------------------- dictionaries
#
# RFC 8878 §5. No in-container encoder produces dictionary frames
# (pyarrow's codec API exposes no dictionary parameter), so the pin is
# the repo's hand-assembly discipline: a test-side FSE-description
# writer (independent mirror of the reader), frames whose expected
# output is computed BY HAND from the RFC (formatted case) or by a
# naive sequential-copy replay (hypothesis), and refusals for every
# structural invariant the parser enforces.

from hbase_observer_es_spark.operators.zstd import (  # noqa: E402
    _LL_BASE,
    _LL_BITS,
    _ML_BASE,
    _ML_BITS,
    ZstdDict,
    parse_zstd_dict,
)

_DICT_MAGIC = (0xEC30A437).to_bytes(4, "little")


def _fse_desc(probs, al: int) -> bytes:
    """Independent test-side FSE table description writer (RFC 8878
    §4.1.1) — bit-for-bit mirror of the decoder's variable-width
    field reader, including the small-value one-bit-shorter encoding
    and the mandatory 2-bit zero-repeat field after each 0."""
    fields = [(al - 5, 4)]
    remaining = 1 << al
    i = 0
    while remaining > 0:
        p = probs[i]
        i += 1
        nbits = (remaining + 1).bit_length()
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        v = p + 1
        if v < threshold:
            fields.append((v, nbits - 1))
        elif v <= lower_mask:
            fields.append((v, nbits))
        else:
            fields.append((v + threshold, nbits))
        remaining -= -p if p < 0 else p
        if p == 0:
            fields.append((0, 2))
    acc = 0
    nb = 0
    for v, w in fields:
        acc |= v << nb
        nb += w
    return acc.to_bytes(max((nb + 7) // 8, 1), "little")


def _rle_seq_frame(literals: bytes, ll: int, ml: int, offset: int) -> bytes:
    """One-sequence frame using RLE-mode sequence tables (the existing
    hand-assembly idiom): raw literals, then (ll, ml, offset)."""
    ofv = offset + 3
    of_code = ofv.bit_length() - 1
    ll_code = max(
        i for i, b in enumerate(_LL_BASE)
        if b <= ll and ll - b < (1 << _LL_BITS[i])
    )
    ml_code = max(
        i for i, b in enumerate(_ML_BASE)
        if b <= ml and ml - b < (1 << _ML_BITS[i])
    )
    def _b(v: int, w: int) -> str:
        return format(v, f"0{w}b") if w else ""

    bits = (
        _b(ofv - (1 << of_code), of_code)
        + _b(ml - _ML_BASE[ml_code], _ML_BITS[ml_code])
        + _b(ll - _LL_BASE[ll_code], _LL_BITS[ll_code])
    )
    body = (
        bytes([len(literals) << 3])  # raw literals, 1-byte header
        + literals
        + bytes([1, 0x54, ll_code, of_code, ml_code])
        + _backstream(bits)
    )
    return _frame(
        0x00,
        bytes([0x00])  # window descriptor, wlog 10
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body,
    )


def _replay(dict_content: bytes, literals: bytes, ll: int, ml: int,
            offset: int) -> bytes:
    """Naive sequential-copy reference for one sequence over a
    dictionary prefix (negative indices reach into the dictionary)."""
    out = bytearray(literals[:ll])
    for _ in range(ml):
        src = len(out) - offset
        out.append(out[src] if src >= 0 else dict_content[src])
    out += literals[ll:]
    return bytes(out)


def test_raw_content_dictionary_extends_history():
    """A payload without the dictionary magic is a raw-content
    dictionary: pure history prefix, no entropy seeding."""
    content = b"0123456789abcdefghij"
    frame = _rle_seq_frame(b"", ll=0, ml=5, offset=15)
    # offset 15 with no frame history: 15 bytes into the 20-byte dict
    assert decompress_zstd(frame, dictionary=content) == b"56789"
    # and the same frame WITHOUT the dictionary refuses on history
    with pytest.raises(ValueError, match="frame history"):
        decompress_zstd(frame)


def test_dictionary_cross_boundary_overlap_copy():
    """A match starting in the dictionary and running past the frame
    boundary keeps the RFC's sequential-copy overlap semantics."""
    content = b"0123456789abcdefghij"
    frame = _rle_seq_frame(b"", ll=0, ml=12, offset=4)
    assert (
        decompress_zstd(frame, dictionary=content)
        == _replay(content, b"", 0, 12, 4)
        == b"ghijghijghij"
    )


def test_dictionary_history_bound_is_loud():
    content = b"12345678"  # 8 bytes
    frame = _rle_seq_frame(b"", ll=0, ml=3, offset=20)
    with pytest.raises(
        ValueError, match=r"frame history plus 8-byte dictionary"
    ):
        decompress_zstd(frame, dictionary=content)


def test_formatted_dictionary_full_seeding():
    """The formatted layout end-to-end: the dictionary's Huffman table
    decodes the frame's TREELESS literals, its OF/ML/LL FSE tables
    serve the frame's Repeat_Mode sequence section, its repeated
    offsets replace {1,4,8}, and its content is reachable history.
    Expected output computed by hand from RFC 8878: ll=4 emits the
    treeless literals 'abba', then offset=rep1=10 with 4 bytes of
    frame history reaches 6 bytes into the content tail, ml=3 copies
    content[30:33] = '456'."""
    # Huffman: 98 explicit weights, only symbol 97 ('a') weight 1;
    # implicit last symbol 98 ('b') completes the power of two
    weights = [0] * 98
    weights[97] = 1
    nibbles = bytearray(49)
    for i, w in enumerate(weights):
        nibbles[i // 2] |= w << (4 if i % 2 == 0 else 0)
    huf_desc = bytes([127 + 98]) + bytes(nibbles)
    of_desc = _fse_desc([32], 5)            # all mass at of_code 0
    ml_desc = _fse_desc([32], 5)            # all mass at ml_code 0 (ml=3)
    ll_desc = _fse_desc([-1, -1, -1, -1, 28], 5)  # cell 0 -> ll_code 4
    content = bytes(range(65, 91)) + b"0123456789"  # A..Z + digits, 36B
    reps = (10).to_bytes(4, "little") + (20).to_bytes(4, "little") + (
        30
    ).to_bytes(4, "little")
    dict_payload = (
        _DICT_MAGIC + (7).to_bytes(4, "little")
        + huf_desc + of_desc + ml_desc + ll_desc + reps + content
    )
    zd = parse_zstd_dict(dict_payload)
    assert zd.dict_id == 7 and zd.reps == [10, 20, 30]
    assert zd.content == content and zd.huf is not None

    lit_hdr = (3 | (4 << 4) | (1 << 14)).to_bytes(3, "little")
    body = (
        lit_hdr
        + _backstream("0110")       # treeless stream: a, b, b, a
        + bytes([1, 0xFC])          # one sequence, all Repeat_Mode
        + _backstream("0" * 15)     # ll/of/ml initial states = cell 0
    )
    frame = _frame(
        0x01,                        # dict-id flag: 1 byte
        bytes([0x00, 0x07])          # window descriptor + dict id 7
        + (1 | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
        + body,
    )
    assert decompress_zstd(frame, dictionary=dict_payload) == b"abba456"
    # id consistency: a dictionary with a DIFFERENT id refuses loudly
    other = bytearray(dict_payload)
    other[4] = 9
    with pytest.raises(ValueError, match="dictionary has id 9"):
        decompress_zstd(frame, dictionary=bytes(other))


def test_formatted_dictionary_structural_refusals():
    base = (
        _DICT_MAGIC + (7).to_bytes(4, "little")
        + bytes([127 + 1, 0x10])        # 1 explicit weight (w=1)
        + _fse_desc([32], 5) * 3
    )
    with pytest.raises(ValueError, match="repeated offsets truncated"):
        parse_zstd_dict(base + b"\x01\x00")
    reps_bad0 = (0).to_bytes(4, "little") + (1).to_bytes(4, "little") * 2
    with pytest.raises(ValueError, match=r"repeated offset 1 is 0"):
        parse_zstd_dict(base + reps_bad0 + b"xy")
    reps_big = (9).to_bytes(4, "little") + (1).to_bytes(4, "little") * 2
    with pytest.raises(ValueError, match=r"repeated offset 1 is 9"):
        parse_zstd_dict(base + reps_big + b"xy")
    with pytest.raises(ValueError, match="dictionary id truncated"):
        parse_zstd_dict(_DICT_MAGIC + b"\x07")


def test_zstd_meta_reports_dictionary_ids():
    from hbase_observer_es_spark.operators.zstd import compress_zstd, zstd_meta

    frame = _frame(0x01, bytes([0x00, 0x05, 1 | (0 << 1) | (0 << 3), 0, 0]))
    m = zstd_meta(frame)
    assert m["dictionary_ids"] == [5]
    assert zstd_meta(compress_zstd(b"plain"))["dictionary_ids"] == []


@settings(deadline=None, max_examples=60)
@given(st.data())
def test_dictionary_match_property(data):
    """Arbitrary raw-content dictionary + one-sequence frames against
    the naive sequential-copy replay."""
    content = data.draw(st.binary(min_size=1, max_size=64))
    literals = data.draw(st.binary(max_size=16))
    ll = data.draw(st.integers(0, len(literals)))
    ml = data.draw(st.integers(3, 24))
    offset = data.draw(st.integers(1, ll + len(content)))
    frame = _rle_seq_frame(literals, ll, ml, offset)
    got = decompress_zstd(frame, dictionary=content)
    assert got == _replay(content, literals, ll, ml, offset)


def test_dictionary_frames_from_the_system_cli_decode():
    """The REAL independent encoder for the dictionary path: the system
    zstd CLI compresses against both a raw-content dictionary and a
    trained (formatted) dictionary; our decoder must reproduce the
    payload bit-exactly — this is the case the r16 review caught (the
    window bound must extend by the dictionary span for single-segment
    dictionary frames, whose first matches reach far into the dict)."""
    import os
    import shutil
    import subprocess
    import tempfile

    if not shutil.which("zstd"):
        pytest.skip("no system zstd CLI on this host")
    payload = (b"the quick brown fox jumps over the lazy dog. " * 40)[:1800]
    raw_dict = bytes(range(256)) * 16 + payload[:600]
    with tempfile.TemporaryDirectory() as d:
        pf, df, out = (os.path.join(d, n) for n in ("p", "dict", "p.zst"))
        with open(pf, "wb") as f:
            f.write(payload)
        with open(df, "wb") as f:
            f.write(raw_dict)
        subprocess.run(
            ["zstd", "-q", "-19", "-D", df, pf, "-o", out], check=True
        )
        with open(out, "rb") as f:
            comp = f.read()
        assert decompress_zstd(comp, dictionary=raw_dict) == payload
        # and the frame must NOT decode without its dictionary
        with pytest.raises(ValueError):
            decompress_zstd(comp)

        # trained (formatted) dictionary: entropy tables + rep offsets
        samples = []
        for i in range(40):
            sp = os.path.join(d, f"s{i}")
            samples.append(sp)
            with open(sp, "wb") as f:
                f.write(payload[i * 20 : i * 20 + 900] + b"shared tail " * 8)
        tdict = os.path.join(d, "trained")
        r = subprocess.run(
            ["zstd", "--train", *samples, "-o", tdict, "--maxdict=4096"],
            capture_output=True,
        )
        if r.returncode != 0:
            pytest.skip(f"zstd --train unavailable: {r.stderr[:120]!r}")
        with open(tdict, "rb") as f:
            trained = f.read()
        from hbase_observer_es_spark.operators.zstd import parse_zstd_dict

        zd = parse_zstd_dict(trained)
        assert zd.dict_id != 0 and zd.huf is not None  # formatted layout
        out2 = os.path.join(d, "p2.zst")
        subprocess.run(
            ["zstd", "-q", "-19", "-D", tdict, pf, "-o", out2], check=True
        )
        with open(out2, "rb") as f:
            comp2 = f.read()
        assert decompress_zstd(comp2, dictionary=trained) == payload
        from hbase_observer_es_spark.operators.zstd import zstd_meta

        assert zstd_meta(comp2)["dictionary_ids"] == [zd.dict_id]
