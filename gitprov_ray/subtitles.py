"""Subtitle / caption formats for video pipelines: SRT (SubRip) and
WebVTT cue parsing and writing — the text side-channel of a video
corpus (caption-based filtering, alignment, CLIP-style pair mining).

Both parsers are total functions over well-formed inputs and raise
``ValueError`` with a cue index on malformed timestamps; callers in a
curation pipeline quarantine per the engine-wide malformed-record
policy (M15). Timestamps are returned in integer milliseconds, so every
derived stat is oracle-exact.

Reference semantics: the reference exposes no subtitle support — engine
extension surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import re

_SRT_TS = re.compile(
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})")


def _ms(h: str, m: str, s: str, ms: str) -> int:
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mil = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{mil:03d}"


def parse_srt(text: str) -> list[dict]:
    """SRT → [{idx, start_ms, end_ms, text}] (idx = the file's own cue
    counter; multi-line cue text joined with '\\n')."""
    cues = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = [l for l in block.splitlines() if l.strip() != ""]
        if not lines:
            continue
        if len(lines) < 2:
            raise ValueError(f"malformed SRT cue: {block!r}")
        idx = int(lines[0].strip())
        m = _SRT_TS.match(lines[1].strip())
        if not m:
            raise ValueError(f"malformed SRT timestamp in cue {idx}")
        g = m.groups()
        cues.append({"idx": idx, "start_ms": _ms(*g[:4]),
                     "end_ms": _ms(*g[4:]),
                     "text": "\n".join(lines[2:])})
    return cues


def parse_vtt(text: str) -> list[dict]:
    """WebVTT → same cue dicts as parse_srt; cues are numbered in file
    order (VTT has no mandatory counters); NOTE/STYLE blocks and cue
    settings after the timestamp line are skipped."""
    body = text.lstrip("﻿")
    if not body.startswith("WEBVTT"):
        raise ValueError("missing WEBVTT header")
    cues = []
    for block in re.split(r"\n\s*\n", body)[1:]:
        lines = [l for l in block.splitlines() if l.strip() != ""]
        if not lines or lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        ts_line = 0
        if "-->" not in lines[0]:
            ts_line = 1                       # optional cue identifier
            if len(lines) < 2 or "-->" not in lines[1]:
                raise ValueError(f"malformed VTT cue: {block!r}")
        m = _SRT_TS.match(lines[ts_line].strip())
        if not m:
            raise ValueError(f"malformed VTT timestamp: {block!r}")
        g = m.groups()
        cues.append({"idx": len(cues) + 1, "start_ms": _ms(*g[:4]),
                     "end_ms": _ms(*g[4:]),
                     "text": "\n".join(lines[ts_line + 1:])})
    return cues


def write_srt(cues: list[dict]) -> str:
    out = []
    for i, c in enumerate(cues, 1):
        out.append(f"{c.get('idx', i)}\n"
                   f"{_fmt_ts(c['start_ms'], ',')} --> "
                   f"{_fmt_ts(c['end_ms'], ',')}\n{c['text']}")
    return "\n\n".join(out) + "\n"


def write_vtt(cues: list[dict]) -> str:
    out = ["WEBVTT"]
    for c in cues:
        out.append(f"{_fmt_ts(c['start_ms'], '.')} --> "
                   f"{_fmt_ts(c['end_ms'], '.')}\n{c['text']}")
    return "\n\n".join(out) + "\n"
