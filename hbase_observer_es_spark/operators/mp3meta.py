"""MP3 metadata from the public MPEG-1/2 audio framing, stdlib-only.

Scraped audio corpora are full of MP3s. DECODING them honestly needs a
synthesis filterbank this container cannot justify hand-rolling — so,
per the multimodal family's original convention, audio decode REFUSES
by name, and this module extracts what the framing alone provides for
real: the per-file facts a curation pipeline filters on
(duration, bitrate, sample rate, channel mode, frame count) without
touching a single audio sample.

Implemented from the public header layout:

* ID3v2 prefix: header parse (version, flags, syncsafe size, footer
  flag), SKIPPED as a block — tag bytes are not audio;
* MPEG frame headers: 11-bit sync, version (1 / 2 / 2.5), layer
  (I/II/III), the public bitrate and sample-rate tables, padding bit,
  channel mode; per-frame byte length computed exactly per spec
  (144·bitrate/rate for layer III MPEG-1 etc.), so the walk STEPS
  frame-to-frame — a broken step (no sync where one must be) is a loud
  error with the byte offset, never a resync guess;
* duration as an exact rational: frames × samples-per-frame is integer,
  ``duration_us = total_samples · 10^6 // rate`` (no float);
* VBR: bitrate is reported as the exact byte-weighted mean
  (total_bytes·8·rate // (total_samples)), which equals the nominal
  rate for CBR files;
* an ID3v1 trailer (``TAG`` at EOF−128) is recognized and excluded from
  the frame walk;
* free-format bitrate (code 0) and reserved codes refuse by name.

``mp3_meta_frame`` is the Spark fan-out: one binary payload → one typed
metadata row via mapInPandas (payloads never shuffle).

Reference parity: none — builder-brief multimodal surface, SURVEY §2-D.
"""

from __future__ import annotations

# bitrate tables, kbit/s: [version-group][layer][code 1..14]
_BITRATES = {
    # MPEG-1
    (1, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    # MPEG-2 / 2.5
    (2, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLE_RATES = {  # [version][code]
    1: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    25: (11025, 12000, 8000),
}

_SAMPLES_PER_FRAME = {  # [version-group][layer]
    (1, 1): 384, (1, 2): 1152, (1, 3): 1152,
    (2, 1): 384, (2, 2): 1152, (2, 3): 576,
}

_CHANNEL_MODES = ("stereo", "joint-stereo", "dual-channel", "mono")


def looks_like_mp3(payload: bytes) -> bool:
    if payload[:3] == b"ID3":
        return True
    return (
        len(payload) >= 2
        and payload[0] == 0xFF
        and payload[1] & 0xE0 == 0xE0
        and payload[1] & 0x18 != 0x08  # version not reserved
        and payload[1] & 0x06 != 0x00  # layer not reserved
    )


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _skip_id3v2(data: bytes, origin: str) -> int:
    if data[:3] != b"ID3":
        return 0
    if len(data) < 10:
        raise ValueError(f"mp3 {origin}: truncated ID3v2 header")
    flags = data[5]
    size = _syncsafe(data[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)  # footer flag
    if total > len(data):
        raise ValueError(
            f"mp3 {origin}: ID3v2 tag of {total} bytes overruns the file"
        )
    return total


def mp3_meta(data: bytes, origin: str = "<bytes>") -> dict:
    """Walk every frame header; return the curation facts. NO audio is
    decoded (and no decoder exists here — by design, stated loudly)."""
    pos = audio_start = _skip_id3v2(data, origin)
    end = len(data)
    if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer is not audio
    if pos >= end:
        raise ValueError(f"mp3 {origin}: no audio frames after the tags")
    frames = 0
    total_samples = 0
    meta = None
    while pos < end:
        if end - pos < 4:
            raise ValueError(
                f"mp3 {origin}: {end - pos} trailing bytes at {pos} are too "
                "short for a frame header"
            )
        h = int.from_bytes(data[pos : pos + 4], "big")
        if h >> 21 != 0x7FF:
            raise ValueError(
                f"mp3 {origin}: lost frame sync at byte {pos} "
                f"(header {h:#010x})"
            )
        vcode = (h >> 19) & 3
        if vcode == 1:
            raise ValueError(f"mp3 {origin}: reserved MPEG version at byte {pos}")
        version = {0: 25, 2: 2, 3: 1}[vcode]
        vgroup = 1 if version == 1 else 2
        lcode = (h >> 17) & 3
        if lcode == 0:
            raise ValueError(f"mp3 {origin}: reserved layer code at byte {pos}")
        layer = 4 - lcode
        bcode = (h >> 12) & 0xF
        if bcode == 0:
            raise ValueError(
                f"mp3 {origin}: free-format bitrate unsupported (byte {pos})"
            )
        if bcode == 0xF:
            raise ValueError(f"mp3 {origin}: invalid bitrate code at byte {pos}")
        bitrate = _BITRATES[(vgroup, layer)][bcode - 1] * 1000
        scode = (h >> 10) & 3
        if scode == 3:
            raise ValueError(f"mp3 {origin}: reserved sample rate at byte {pos}")
        rate = _SAMPLE_RATES[version][scode]
        padding = (h >> 9) & 1
        mode = _CHANNEL_MODES[(h >> 6) & 3]
        spf = _SAMPLES_PER_FRAME[(vgroup, layer)]
        if layer == 1:
            frame_len = (12 * bitrate // rate + padding) * 4
        else:
            frame_len = spf // 8 * bitrate // rate + padding
        if frame_len < 4:
            raise ValueError(
                f"mp3 {origin}: degenerate frame length {frame_len} at byte {pos}"
            )
        if pos + frame_len > end:
            raise ValueError(
                f"mp3 {origin}: frame at byte {pos} ({frame_len} bytes) "
                "overruns the audio span — truncated file"
            )
        this = (version, layer, rate, mode)
        if meta is None:
            meta = this
        elif this[:3] != meta[:3]:
            raise ValueError(
                f"mp3 {origin}: stream parameters change mid-file at byte "
                f"{pos} ({meta[:3]} -> {this[:3]}) — not a single stream"
            )
        frames += 1
        total_samples += spf
        pos += frame_len
    version, layer, rate, mode = meta
    audio_bytes = end - audio_start
    return {
        "version": version,  # 1, 2, or 25 (for 2.5)
        "layer": layer,
        "sample_rate": rate,
        "channel_mode": mode,
        "n_mpeg_frames": frames,
        "total_samples": total_samples,
        "duration_us": total_samples * 1_000_000 // rate,
        # exact byte-weighted mean — equals the nominal rate for CBR
        "mean_bitrate": audio_bytes * 8 * rate // total_samples,
    }


def decode_mp3_audio(payload: bytes, origin: str = "<bytes>"):
    """Stated loudly rather than silently absent: MP3 SAMPLE decode
    needs the hybrid filterbank + Huffman tables of a real MP3 decoder,
    which this container does not carry — metadata extraction
    (:func:`mp3_meta`) is the honest surface."""
    raise NotImplementedError(
        f"mp3 {origin}: audio decode not implemented (no codec library "
        "in-container; the framing walk in mp3_meta is the real surface)"
    )


MP3_META_SCHEMA = (
    "version long, layer long, sample_rate long, channel_mode string,"
    " n_mpeg_frames long, total_samples long, duration_us long,"
    " mean_bitrate long"
)


def mp3_meta_frame(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """mapInPandas metadata extraction over a binary MP3 column — one
    typed row per file, payloads die executor-side, zero audio decode."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "version", "layer", "sample_rate", "channel_mode",
                    "n_mpeg_frames", "total_samples", "duration_us",
                    "mean_bitrate",
                )
            }
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                m = mp3_meta(bytes(payload), origin=str(key))
                rows[id_col].append(key)
                for k, v in m.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {MP3_META_SCHEMA}")
