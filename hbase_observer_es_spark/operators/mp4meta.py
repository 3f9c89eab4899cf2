"""MP4 / ISO-BMFF metadata from the public box structure, stdlib-only.

MP4 is the dominant scraped-video container; its SAMPLE data is H.264/
HEVC/AAC — codecs this container cannot honestly hand-roll — so, per the
mp3meta/oggmeta convention, sample decode refuses BY NAME and the box
walk is the real surface. The ISO base-media box grammar is public
(ISO/IEC 14496-12): size+fourcc boxes, 64-bit largesize escape,
container boxes nesting children. Extracted per file:

* ``ftyp``: major brand + compatible brands;
* ``moov/mvhd``: movie timescale + duration → exact rational
  ``duration_us = duration · 10^6 // timescale`` (version 0 and 1 box
  layouts both handled);
* per ``trak``: handler type from ``mdia/hdlr`` (vide/soun/text…), the
  track's OWN timescale/duration from ``mdia/mdhd``, sample-entry
  fourcc from ``stbl/stsd`` (the codec name: avc1, hvc1, mp4a, …), and
  for video tracks the coded width/height from the sample entry;
* guards: box sizes are attacker data — a size that overruns its parent
  names its byte offset; size 0 ("to end of file") is honored only at
  top level; descent is explicit at fixed call sites (no recursion to
  depth-bomb); a missing ``moov`` or ``mvhd`` fails loudly naming the box
  (streaming-optimized files put ``moov`` first, but the walk finds it
  anywhere before EOF); an empty or truncated timing box dies as the
  module's ValueError, never an IndexError.

``mp4_meta_frame`` is the Spark fan-out: one payload → one row per
TRACK (a container fact table — video and audio tracks of one file are
separate rows sharing the doc id), via mapInPandas.

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

import struct

def looks_like_mp4(payload: bytes) -> bool:
    return len(payload) >= 8 and payload[4:8] == b"ftyp"


def _walk(data: bytes, pos: int, end: int, origin: str, top_level: bool = False):
    """Yield (fourcc, body_start, body_end) for boxes in [pos, end).
    Descent is explicit at fixed call sites (moov → trak → mdia → …), so
    there is no recursion to depth-guard."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"mp4 {origin}: truncated box header at byte {pos}")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(
                    f"mp4 {origin}: truncated largesize box at byte {pos}"
                )
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            if not top_level:
                raise ValueError(
                    f"mp4 {origin}: size-0 box {fourcc!r} at byte {pos} is "
                    "only legal at top level"
                )
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"mp4 {origin}: box {fourcc!r} at byte {pos} declares "
                f"{size} bytes, overrunning its container"
            )
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes, origin: str):
    for cc, b0, b1 in _walk(data, pos, end, origin):
        if cc == fourcc:
            return b0, b1
    return None


def _time_facts(data: bytes, b0: int, b1: int, origin: str, label: str) -> tuple:
    """(timescale, duration) from an mvhd/mdhd fullbox — the two share
    one layout, so one parser (truncation guards apply to BOTH the empty
    body and the version-specific lengths; an empty box must die as the
    module's ValueError, never an IndexError that escapes the census)."""
    if b1 - b0 < 1:
        raise ValueError(f"mp4 {origin}: {label} box is empty")
    version = data[b0]
    if version == 0:
        if b1 - b0 < 20:
            raise ValueError(f"mp4 {origin}: {label} v0 truncated")
        timescale, duration = struct.unpack(">II", data[b0 + 12 : b0 + 20])
    elif version == 1:
        if b1 - b0 < 32:
            raise ValueError(f"mp4 {origin}: {label} v1 truncated")
        (timescale,) = struct.unpack(">I", data[b0 + 20 : b0 + 24])
        (duration,) = struct.unpack(">Q", data[b0 + 24 : b0 + 32])
    else:
        raise ValueError(f"mp4 {origin}: {label} version {version} unknown")
    if timescale == 0:
        raise ValueError(f"mp4 {origin}: {label} timescale is zero")
    return timescale, duration


def mp4_meta(data: bytes, origin: str = "<bytes>") -> dict:
    """{"brand", "duration_us", "tracks": [{"handler", "codec",
    "duration_us", "timescale", "width", "height"}, ...]} — one walk, no
    sample data touched."""
    if not looks_like_mp4(data):
        raise ValueError(
            f"mp4 {origin}: not an ISO-BMFF stream (bytes 4-7 {data[4:8]!r})"
        )
    brand = None
    moov = None
    for cc, b0, b1 in _walk(data, 0, len(data), origin, top_level=True):
        if cc == b"ftyp" and brand is None:
            if b1 - b0 < 4:
                raise ValueError(f"mp4 {origin}: ftyp body truncated")
            brand = data[b0 : b0 + 4].decode("ascii", "replace").strip()
        elif cc == b"moov":
            moov = (b0, b1)
    if moov is None:
        raise ValueError(f"mp4 {origin}: missing moov box")
    m0, m1 = moov
    mvhd = _find(data, m0, m1, b"mvhd", origin)
    if mvhd is None:
        raise ValueError(f"mp4 {origin}: moov without mvhd")
    timescale, duration = _time_facts(data, *mvhd, origin, "mvhd")
    tracks = []
    for cc, t0, t1 in _walk(data, m0, m1, origin):
        if cc != b"trak":
            continue
        tnum = len(tracks)
        mdia = _find(data, t0, t1, b"mdia", origin)
        if mdia is None:
            raise ValueError(f"mp4 {origin}: track {tnum} without mdia")
        d0, d1 = mdia
        hdlr = _find(data, d0, d1, b"hdlr", origin)
        if hdlr is None or hdlr[1] - hdlr[0] < 12:
            raise ValueError(f"mp4 {origin}: track {tnum} hdlr missing/truncated")
        handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("ascii", "replace")
        mdhd = _find(data, d0, d1, b"mdhd", origin)
        if mdhd is None:
            raise ValueError(f"mp4 {origin}: track {tnum} without mdhd")
        t_scale, t_dur = _time_facts(data, *mdhd, origin, f"track {tnum} mdhd")
        codec = None
        width = height = 0
        minf = _find(data, d0, d1, b"minf", origin)
        if minf is not None:
            stbl = _find(data, *minf, b"stbl", origin)
            if stbl is not None:
                stsd = _find(data, *stbl, b"stsd", origin)
                if stsd is not None:
                    s0, s1 = stsd
                    if s1 - s0 < 16:
                        raise ValueError(
                            f"mp4 {origin}: track {tnum} stsd truncated"
                        )
                    # fullbox (4) + entry_count (4) + first entry header
                    codec = data[s0 + 12 : s0 + 16].decode("ascii", "replace")
                    if handler == "vide" and s1 - s0 >= 16 + 34:
                        # sample entry: 8 hdr + 6 reserved + 2 dri +
                        # 16 predefined/reserved -> width/height at +32
                        e0 = s0 + 16
                        width, height = struct.unpack(
                            ">HH", data[e0 + 24 : e0 + 28]
                        )
        tracks.append(
            {
                "handler": handler,
                "codec": codec or "",
                "timescale": t_scale,
                "duration_us": t_dur * 1_000_000 // t_scale,
                "width": width,
                "height": height,
            }
        )
    if not tracks:
        raise ValueError(f"mp4 {origin}: moov carries no tracks")
    return {
        "brand": brand or "",
        "duration_us": duration * 1_000_000 // timescale,
        "tracks": tracks,
    }


def decode_mp4_media(payload: bytes, origin: str = "<bytes>"):
    """Stated loudly rather than silently absent: MP4 sample data is
    H.264/HEVC/AAC — no honest from-spec path in this container; the box
    walk (:func:`mp4_meta`) is the real surface."""
    raise NotImplementedError(
        f"mp4 {origin}: sample decode not implemented (no codec library "
        "in-container; the box walk in mp4_meta is the real surface)"
    )


MP4_TRACK_SCHEMA = (
    "brand string, movie_duration_us long, track_idx long, handler string,"
    " codec string, track_duration_us long, width long, height long"
)


def mp4_meta_frame(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """mapInPandas metadata extraction: one row per TRACK (video and
    audio tracks of one file share the doc id), payloads die
    executor-side, zero sample decode."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "brand", "movie_duration_us", "track_idx",
                    "handler", "codec", "track_duration_us", "width", "height",
                )
            }
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp4_meta(bytes(payload), origin=str(key))
                for i, t in enumerate(m["tracks"]):
                    rows[id_col].append(key)
                    rows["brand"].append(m["brand"])
                    rows["movie_duration_us"].append(m["duration_us"])
                    rows["track_idx"].append(i)
                    rows["handler"].append(t["handler"])
                    rows["codec"].append(t["codec"])
                    rows["track_duration_us"].append(t["duration_us"])
                    rows["width"].append(t["width"])
                    rows["height"].append(t["height"])
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {MP4_TRACK_SCHEMA}")
