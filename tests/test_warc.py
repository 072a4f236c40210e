"""WARC reader/writer (sources/warc.py) — ISO 28500 framing, the
member-per-record gzip form, and the Spark ingest plumbing."""

from __future__ import annotations

import zlib

import pytest

from impala_cut_spark.sources.warc import (
    build_warc,
    parse_warc,
    warc_ingest,
)


def _recs(n: int = 3) -> list[dict]:
    return [
        {
            "headers": {
                "WARC-Type": "response" if i % 2 == 0 else "request",
                "WARC-Target-URI": f"https://example.org/page/{i}",
                "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
                "Content-Type": "text/plain; charset=utf-8",
            },
            "content": (f"päge {i} body\nwith bytes \x00\x01" * (i + 1)).encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gzipped", [False, True])
def test_roundtrip_multi_record(gzipped):
    recs = _recs(4)
    payload = build_warc(recs, gzipped=gzipped)
    if gzipped:
        assert payload[:2] == b"\x1f\x8b"
    back = parse_warc(payload)
    assert len(back) == 4
    for want, got in zip(recs, back):
        assert got["content"] == want["content"]
        for k, v in want["headers"].items():
            assert got["headers"][k] == v
        assert got["headers"]["Content-Length"] == str(len(want["content"]))


def test_gzip_is_one_member_per_record():
    """The crawl-standard form: a reader must be able to resync at
    member boundaries — assert the stream really has N members."""
    payload = build_warc(_recs(3), gzipped=True)
    members, rest = 0, payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        d.decompress(rest)
        d.flush()
        assert d.eof
        members += 1
        rest = d.unused_data
    assert members == 3


def test_mixed_case_content_length_and_empty_content():
    raw = (
        b"WARC/1.0\r\n"
        b"warc-type: metadata\r\n"
        b"CONTENT-LENGTH: 0\r\n"
        b"\r\n"
        b"\r\n\r\n"
    )
    (rec,) = parse_warc(raw)
    assert rec["content"] == b""
    assert rec["headers"]["warc-type"] == "metadata"


def test_corrupt_payloads_raise():
    good = build_warc(_recs(1))
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"NOPE/1.0\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-10])  # cut inside the terminator/content
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(build_warc(_recs(1), gzipped=True)[:-4])


def test_warc_ingest_dataframe(spark):
    """Records explode executor-side; a malformed archive degrades to
    one parse_ok=false row instead of failing the job."""
    rows = [
        (1, bytearray(build_warc(_recs(3)))),
        (2, bytearray(build_warc(_recs(2), gzipped=True))),
        (3, bytearray(b"not a warc at all")),
    ]
    df = spark.createDataFrame(rows, "source_id long, payload binary")
    got = warc_ingest(df).collect()
    by_src: dict[int, list] = {}
    for r in got:
        by_src.setdefault(r.source_id, []).append(r)
    assert len(by_src[1]) == 3 and all(r.parse_ok for r in by_src[1])
    assert [r.record_index for r in sorted(by_src[1], key=lambda r: r.record_index)] == [0, 1, 2]
    assert by_src[1][0].target_uri == "https://example.org/page/0"
    assert len(by_src[2]) == 2 and all(r.parse_ok for r in by_src[2])
    assert bytes(by_src[2][0].content) == _recs(2)[0]["content"]
    assert len(by_src[3]) == 1 and not by_src[3][0].parse_ok


def test_hypothesis_roundtrip():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        contents=st.lists(st.binary(max_size=300), min_size=1, max_size=5),
        gz=st.booleans(),
    )
    def rt(contents, gz):
        recs = [
            {"headers": {"WARC-Type": "resource", "WARC-Record-ID": f"<r{i}>"}, "content": c}
            for i, c in enumerate(contents)
        ]
        back = parse_warc(build_warc(recs, gzipped=gz))
        assert [r["content"] for r in back] == contents

    rt()
