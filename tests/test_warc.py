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


@pytest.mark.parametrize("gzipped", [False, True])
def test_streaming_iterator_matches_parse_warc(gzipped):
    """iter_warc_records (the mounted-file scan path) must yield the
    exact records parse_warc materializes, in order — plain and
    member-per-record gzip, including tiny chunk sizes that force
    token matches across chunk boundaries."""
    import io

    from impala_cut_spark.sources.warc import iter_warc_records

    recs = _recs(5)
    blob = build_warc(recs, gzipped=gzipped)
    assert list(iter_warc_records(io.BytesIO(blob))) == parse_warc(blob)

    # 7-byte reads: every version line / header / CRLFCRLF spans chunks
    class _Tiny(io.BytesIO):
        def read(self, n=-1):
            return super().read(min(n, 7) if n and n > 0 else n)

    assert list(iter_warc_records(_Tiny(blob))) == parse_warc(blob)


def test_streaming_iterator_truncation_raises():
    import io

    from impala_cut_spark.sources.warc import iter_warc_records

    blob = build_warc(_recs(2), gzipped=True)
    with pytest.raises(ValueError):
        list(iter_warc_records(io.BytesIO(blob[: len(blob) - 9])))
    plain = build_warc(_recs(2))
    with pytest.raises(ValueError):
        list(iter_warc_records(io.BytesIO(plain[: len(plain) - 9])))


def test_pywarc_file_mount(spark, tmp_path):
    """The pywarc DataSource mounts a directory of real .warc/.warc.gz
    files: one partition per archive, streamed records, provenance
    file column, corrupt files degrading to one parse_ok=false row."""
    from impala_cut_spark.sources.warc import read_warc, write_warc_files

    d = str(tmp_path / "crawl")
    recs = _recs(7)
    write_warc_files(
        [(r["headers"], r["content"]) for r in recs], d, records_per_file=3
    )
    write_warc_files(
        [(recs[0]["headers"], recs[0]["content"])], d, records_per_file=1, gzipped=False
    )
    df = read_warc(spark, d)
    assert df.rdd.getNumPartitions() == 4  # 3 gz shards + 1 plain
    rows = df.collect()
    assert len(rows) == 8 and all(r.parse_ok for r in rows)
    gz_rows = [r for r in rows if r.file.endswith(".gz")]
    assert len(gz_rows) == 7
    by_uri = {r.target_uri: r for r in gz_rows}
    for want in recs:
        got = by_uri[want["headers"]["WARC-Target-URI"]]
        assert bytes(got.content) == want["content"]
        assert got.content_length == len(want["content"])
        assert got.content_type == want["headers"]["Content-Type"]
    # corrupt member degrades, good files unaffected
    (tmp_path / "crawl" / "junk.warc").write_bytes(b"NOT WARC\r\n\r\n")
    rows2 = read_warc(spark, d).collect()
    bad = [r for r in rows2 if not r.parse_ok]
    assert len(bad) == 1 and bad[0].file == "junk.warc"
    assert sum(1 for r in rows2 if r.parse_ok) == 8


def test_pywarc_ddl_mount(tmp_path):
    """STORED AS WARC … LOCATION mounts a crawl directory as a session
    view (the avro-mount precedent)."""
    from impala_cut_spark.session import ImpalaSession
    from impala_cut_spark.sources.warc import write_warc_files

    d = str(tmp_path / "crawl_ddl")
    recs = _recs(4)
    write_warc_files(
        [(r["headers"], r["content"]) for r in recs], d, records_per_file=2
    )
    s = ImpalaSession()
    s.sql(f"create external table crawl_t stored as warc location '{d}'")
    got = s.sql(
        "select count(*) n, sum(cast(parse_ok as int)) ok, "
        "sum(content_length) total from crawl_t"
    ).collect()[0]
    assert got.n == 4 and got.ok == 4
    assert got.total == sum(len(r["content"]) for r in recs)


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
