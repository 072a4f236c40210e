"""Matroska/WebM EBML metadata (operators/mkv.py): VINT spec
vectors, round-trips through the writer twin, unknown-size segments,
hostile-input guards, and the operator degrade contract.

No real .mkv/.webm ships in this container (documented in the
registry row), so the anchors are RFC 8794's own VINT examples pinned
as byte literals plus writer-twin round-trips."""

from __future__ import annotations

import struct

import pytest

from impala_cut_spark.operators.mkv import (
    _read_vint,
    build_mkv,
    mkv_metadata,
    mkv_video_metadata,
)


class TestVint:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            (b"\x81", 1),            # RFC 8794 §4: 1-byte VINT, value 1
            (b"\x41\x00", 0x100),    # 2-byte form
            (b"\x82", 2),
            (b"\x10\x00\x00\x02", 2),  # 4-byte long form of 2
        ],
    )
    def test_size_vectors(self, raw, expected):
        val, pos = _read_vint(raw, 0, keep_marker=False)
        assert (val, pos) == (expected, len(raw))

    def test_unknown_size_all_ones(self):
        assert _read_vint(b"\xff", 0, keep_marker=False)[0] == -1
        assert _read_vint(b"\x7f\xff", 0, keep_marker=False)[0] == -1

    def test_id_keeps_marker(self):
        val, _ = _read_vint(b"\x1a\x45\xdf\xa3", 0, keep_marker=True)
        assert val == 0x1A45DFA3

    def test_invalid_and_truncated(self):
        with pytest.raises(ValueError, match="leading byte 0x00"):
            _read_vint(b"\x00", 0, keep_marker=False)
        with pytest.raises(ValueError, match="truncated VINT body"):
            _read_vint(b"\x40", 0, keep_marker=False)


class TestRoundTrip:
    def test_full_metadata(self):
        p = build_mkv(title="A Film", duration_s=90.5,
                      video=("V_VP9", 1920, 1080),
                      audio_tracks=[("A_OPUS", 48000.0, 2),
                                    ("A_VORBIS", 44100.0, 1)])
        m = mkv_metadata(p)
        assert m["doctype"] == "matroska"
        assert m["duration_s"] == pytest.approx(90.5)
        assert m["title"] == "A Film"
        assert m["n_tracks"] == 3
        v, a1, a2 = m["tracks"]
        assert (v["type"], v["codec"], v["width"], v["height"]) == (
            "video", "V_VP9", 1920, 1080)
        assert (a1["codec"], a1["sample_freq"], a1["channels"]) == (
            "A_OPUS", 48000.0, 2)
        assert a2["codec"] == "A_VORBIS"

    def test_unknown_segment_size_streaming_form(self):
        p = build_mkv(doctype="webm", unknown_segment_size=True,
                      video=("V_VP8", 64, 48))
        m = mkv_metadata(p)
        assert m["doctype"] == "webm"
        assert m["tracks"][0]["width"] == 64

    def test_custom_timestamp_scale(self):
        # Duration is stored in TimestampScale units: same wall time,
        # different scale, identical duration_s out
        for scale in (1_000_000, 500_000):
            p = build_mkv(duration_s=12.0, timestamp_scale=scale)
            assert mkv_metadata(p)["duration_s"] == pytest.approx(12.0)


class TestHostile:
    def test_foreign_doctype_rejected(self):
        with pytest.raises(ValueError, match="unsupported doctype"):
            mkv_metadata(build_mkv(doctype="avif-sequence"))

    def test_no_ebml_header(self):
        # a structurally valid empty Segment with no EBML header
        with pytest.raises(ValueError, match="no EBML header"):
            mkv_metadata(b"\x18\x53\x80\x67\x80")

    def test_element_overruns_parent(self):
        good = build_mkv(video=("V_VP9", 10, 10))
        # corrupt the Segment size to claim bytes past the payload
        bad = bytearray(good)
        seg_at = bad.find(bytes.fromhex("18538067"))
        size_pos = seg_at + 4
        # current size vint: rewrite as a huge 4-byte size
        bad[size_pos : size_pos + 1] = b"\x1f\xff\xff\xf0"
        with pytest.raises(ValueError, match="overruns|truncated"):
            mkv_metadata(bytes(bad))

    def test_float_width_guard(self):
        from impala_cut_spark.operators.mkv import _float

        assert _float(b"") == 0.0
        assert _float(struct.pack(">f", 2.5)) == 2.5
        with pytest.raises(ValueError, match="float must be"):
            _float(b"\x00\x00\x00")


class TestOperator:
    def test_rows_and_degrade(self, spark):
        p = build_mkv(title="t", duration_s=3.0, video=("V_VP9", 32, 16),
                      audio_tracks=[("A_OPUS", 48000.0, 1)])
        rows = {r.asset_id: r
                for r in mkv_video_metadata(spark.createDataFrame(
                    [(1, bytearray(p)), (2, b"RIFF not ebml"), (3, None)],
                    "asset_id bigint, payload binary",
                )).collect()}
        assert rows[1].parse_ok and rows[1].video_codec == "V_VP9"
        assert rows[1].audio_codec == "A_OPUS" and rows[1].duration_s == 3.0
        assert not rows[2].parse_ok and not rows[3].parse_ok


def test_hypothesis_mkv_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(alphabet=st.characters(
        blacklist_categories=("Cs", "Cc")), min_size=1, max_size=24)

    @settings(max_examples=60, deadline=None)
    @given(
        st.sampled_from(["matroska", "webm"]),
        st.one_of(st.none(), name),
        st.one_of(st.none(), st.integers(0, 10**6).map(float)),
        st.one_of(st.none(), st.tuples(
            name, st.integers(1, 1 << 24), st.integers(1, 1 << 24))),
        st.lists(st.tuples(name, st.integers(8000, 192000).map(float),
                           st.integers(1, 8)), max_size=3),
        st.booleans(),
    )
    def check(doctype, title, dur, video, audio, unknown):
        p = build_mkv(doctype=doctype, title=title, duration_s=dur,
                      video=video, audio_tracks=audio,
                      unknown_segment_size=unknown)
        m = mkv_metadata(p)
        assert m["doctype"] == doctype and m["title"] == title
        if dur is None:
            assert m["duration_s"] is None
        else:
            assert m["duration_s"] == pytest.approx(dur)
        assert m["n_tracks"] == (1 if video else 0) + len(audio)
        if video:
            v = m["tracks"][0]
            assert (v["codec"], v["width"], v["height"]) == video
        for got, (codec, freq, ch) in zip(
                m["tracks"][1 if video else 0:], audio):
            assert (got["codec"], got["sample_freq"], got["channels"]) == (
                codec, freq, ch)

    check()
