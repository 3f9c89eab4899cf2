"""Subtitle/caption parsing (SRT, WebVTT) + audio-segment alignment.

Paired speech-text is what an ASR/multimodal corpus is FOR, and the
pairing arrives as caption files: SubRip (.srt) and WebVTT (.vtt), both
fully public text formats. This module parses them into typed cue rows
with EXACT integer microsecond timestamps (no float time anywhere) and
aligns them to the windowed audio segments ``wav.audio_segments_frame``
produces — a pure DataFrame interval-overlap join, JVM-side, no UDF.

Parsing is strict and loud per the codec-family rule: a malformed
timestamp, a cue whose end precedes its start, or an out-of-order index
names the cue and the payload origin. Formats:

* SRT: numeric index line, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``, text
  lines until a blank line; indexes must be positive — the spec's
  1-based convention — but gaps are allowed (real files renumber);
* WebVTT: ``WEBVTT`` magic (optional BOM), ``NOTE``/``STYLE``/
  ``REGION`` blocks skipped, optional cue identifiers, dot-millisecond
  timestamps with the optional hour field, cue settings after the
  timestamp line ignored (they style, they don't time).

``align_captions`` joins cues to segments on time overlap: a segment
[seg_start_us, seg_end_us) from (start_frame, n_frames, rate) overlaps
cue [start_us, end_us) iff seg_start < cue_end AND cue_start < seg_end
— expressed as Catalyst predicates so AQE can pick the join strategy;
at scale both sides carry doc ids, so the overlap join is an equi-join
on doc plus a range predicate, never a cross join.

Reference parity: none — builder-brief training-data surface
(SURVEY §2-D's multimodal family: the text leg of the audio pair).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SRT_TS = re.compile(r"^(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})$")
_VTT_TS = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_ARROW = "-->"

CUE_SCHEMA = "cue_idx long, start_us long, end_us long, text string"


def _us(h: str | None, m: str, s: str, ms: str) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1_000_000 + int(ms) * 1000


def _cue_times(line: str, pattern: re.Pattern, origin: str, cue: int) -> tuple:
    parts = line.split()
    if len(parts) < 3 or parts[1] != _ARROW:
        raise ValueError(
            f"captions {origin}: cue {cue} timing line {line!r} is not "
            f"'start {_ARROW} end'"
        )
    times = []
    for tok in (parts[0], parts[2]):
        m = pattern.match(tok)
        if not m:
            raise ValueError(
                f"captions {origin}: cue {cue} timestamp {tok!r} malformed"
            )
        g = m.groups()
        times.append(_us(*g) if len(g) == 4 else _us(None, *g))
    start, end = times
    if end <= start:
        raise ValueError(
            f"captions {origin}: cue {cue} ends at {end}us, not after its "
            f"start {start}us"
        )
    return start, end


def parse_srt(text: str, origin: str = "<text>") -> list:
    """SubRip cues → [{"cue_idx", "start_us", "end_us", "text"}, ...].
    Indexes must increase (gaps fine — real files renumber); a BOM is
    tolerated (Windows tools emit them)."""
    cues = []
    last_idx = 0
    blocks = re.split(r"\n\s*\n", text.lstrip('\ufeff').replace("\r\n", "\n").strip())
    for block in blocks:
        lines = [l for l in block.split("\n")]
        if not lines or not lines[0].strip():
            continue
        head = lines[0].strip()
        if not head.isdigit() or int(head) < 1:
            raise ValueError(
                f"captions {origin}: SRT block starts with {head!r}, not a "
                "positive cue index"
            )
        idx = int(head)
        if idx <= last_idx:
            raise ValueError(
                f"captions {origin}: cue index {idx} does not increase "
                f"past {last_idx} — reordered or duplicated cues"
            )
        last_idx = idx
        if len(lines) < 2:
            raise ValueError(f"captions {origin}: cue {idx} has no timing line")
        start, end = _cue_times(lines[1].strip(), _SRT_TS, origin, idx)
        body = "\n".join(lines[2:]).strip()
        if not body:
            raise ValueError(f"captions {origin}: cue {idx} has no text")
        cues.append({"cue_idx": idx, "start_us": start, "end_us": end, "text": body})
    if not cues:
        raise ValueError(f"captions {origin}: no cues in SRT payload")
    return cues


def parse_vtt(text: str, origin: str = "<text>") -> list:
    """WebVTT cues → the same row shape; cue ids become 1-based order
    indexes (VTT ids are free-form strings — ORDER is the stable key)."""
    t = text.lstrip("﻿").replace("\r\n", "\n")
    if not t.startswith("WEBVTT"):
        raise ValueError(
            f"captions {origin}: not a WebVTT payload (starts {t[:12]!r})"
        )
    blocks = re.split(r"\n\s*\n", t.strip())[1:]  # drop the header block
    cues = []
    for block in blocks:
        lines = block.split("\n")
        if not lines or not lines[0].strip():
            continue
        first = lines[0].strip()
        # comment/metadata blocks start with the WORD NOTE/STYLE/REGION —
        # a cue id that merely begins with those letters is still a cue
        if first.split(None, 1)[0] in ("NOTE", "STYLE", "REGION"):
            continue
        if _ARROW not in first:
            # cue identifier line; timings follow
            lines = lines[1:]
            if not lines:
                raise ValueError(
                    f"captions {origin}: VTT cue id {first!r} with no body"
                )
        timing = lines[0].strip()
        # settings after the end timestamp are styling — split them off
        start, end = _cue_times(
            " ".join(timing.split()[:3]), _VTT_TS, origin, len(cues) + 1
        )
        body = "\n".join(lines[1:]).strip()
        if not body:
            raise ValueError(
                f"captions {origin}: VTT cue {len(cues) + 1} has no text"
            )
        cues.append(
            {"cue_idx": len(cues) + 1, "start_us": start, "end_us": end, "text": body}
        )
    if not cues:
        raise ValueError(f"captions {origin}: no cues in WebVTT payload")
    return cues


def parse_captions(text: str, origin: str = "<text>") -> list:
    """Format sniff: WEBVTT magic → VTT, else SRT."""
    t = text.lstrip("﻿")
    if t.startswith("WEBVTT"):
        return parse_vtt(t, origin)
    return parse_srt(t, origin)


def captions_frame(df: DataFrame, text_col: str = "captions", id_col: str = "doc_id") -> DataFrame:
    """One caption document → one row per cue via mapInPandas (format
    sniffed per payload; parse failures name the doc)."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {k: [] for k in (id_col, "cue_idx", "start_us", "end_us", "text")}
            for key, text in zip(pdf[id_col], pdf[text_col]):
                for cue in parse_captions(text, origin=str(key)):
                    rows[id_col].append(key)
                    for k, v in cue.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {CUE_SCHEMA}")


def align_captions(
    segments: DataFrame,
    cues: DataFrame,
    id_col: str = "doc_id",
    rate_col: str = "sample_rate",
) -> DataFrame:
    """Segment × cue time-overlap join, pure Catalyst: segments carry
    (start_frame, n_frames, sample_rate) from
    ``wav.audio_segments_frame``; frames convert to exact integer µs at
    each DOCUMENT's own rate (a global scalar would silently misalign a
    mixed-rate corpus). Equi-join on the doc id plus the half-open
    overlap predicate — the per-doc key keeps this a hash/sort-merge
    join at 100 TB, never a cross product. Output: one row per
    overlapping (segment, cue) with the overlap length."""
    if rate_col not in segments.columns:
        raise ValueError(
            f"captions: segments frame lacks the per-doc rate column "
            f"{rate_col!r} (audio_segments_frame emits it) — a single "
            "global rate silently misaligns mixed-rate corpora"
        )
    seg = segments.select(
        F.col(id_col),
        "seg_idx",
        # integer `div`, never float `/`: exact µs for any frame index,
        # at each DOCUMENT's own rate
        F.expr(f"(start_frame * 1000000L) div {rate_col}").alias("seg_start_us"),
        F.expr(f"((start_frame + n_frames) * 1000000L) div {rate_col}").alias(
            "seg_end_us"
        ),
    )
    c = cues.select(id_col, "cue_idx", "start_us", "end_us", "text")
    joined = seg.join(c, on=id_col).where(
        (F.col("seg_start_us") < F.col("end_us"))
        & (F.col("start_us") < F.col("seg_end_us"))
    )
    return joined.select(
        id_col,
        "seg_idx",
        "cue_idx",
        F.greatest("seg_start_us", "start_us").alias("overlap_start_us"),
        F.least("seg_end_us", "end_us").alias("overlap_end_us"),
        (
            F.least("seg_end_us", "end_us") - F.greatest("seg_start_us", "start_us")
        ).alias("overlap_us"),
        "text",
    )
