"""SRT / WebVTT cue parsing (gitprov_ray/subtitles.py): roundtrips,
format quirks (BOM, cue ids, NOTE blocks, ',' vs '.'), malformed cues."""

import pytest

from gitprov_ray import subtitles as st


CUES = [{"idx": 1, "start_ms": 1000, "end_ms": 2500, "text": "hello"},
        {"idx": 2, "start_ms": 3_600_000 + 61_500, "end_ms":
         3_600_000 + 63_000, "text": "two\nlines"}]


def test_srt_roundtrip():
    txt = st.write_srt(CUES)
    assert "01:01:01,500 --> 01:01:03,000" in txt
    back = st.parse_srt(txt)
    assert back == CUES


def test_vtt_roundtrip_and_quirks():
    txt = st.write_vtt(CUES)
    assert txt.startswith("WEBVTT")
    assert "01:01:01.500 --> 01:01:03.000" in txt
    back = st.parse_vtt(txt)
    assert [c["start_ms"] for c in back] == [1000, 3_661_500]
    assert back[1]["text"] == "two\nlines"

    quirky = ("﻿WEBVTT\n\nNOTE a comment\nspanning lines\n\n"
              "intro-cue-id\n00:00:00.000 --> 00:00:01.000\nfirst\n\n"
              "00:00:05.000 --> 00:00:06.250\nsecond")
    cues = st.parse_vtt(quirky)
    assert len(cues) == 2
    assert cues[0]["text"] == "first" and cues[1]["end_ms"] == 6250


def test_malformed_raises():
    with pytest.raises(ValueError):
        st.parse_srt("1\nnot a timestamp\nxx")
    with pytest.raises(ValueError):
        st.parse_vtt("no header\n\n00:00:00.000 --> 00:00:01.000\nx")
    with pytest.raises(ValueError):
        st.parse_vtt("WEBVTT\n\ncue-id\nstill not a timestamp\nx")
