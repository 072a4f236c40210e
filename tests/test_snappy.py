"""Snappy codec (sources/snappy.py) — format × compression matrix parity.

Independent anchors: the JVM's snappy-java (org.xerial.snappy, on
Spark's classpath) for the raw block format and Hadoop's own
SnappyCodec for the BlockCompressorStream framing — both directions,
so encoder and decoder cannot be wrong-but-consistent together (the
same cross-validation precedent as the ImageIO codec checks)."""

from __future__ import annotations

import os
import random
import zlib

import pytest

from impala_cut_spark.sources import snappy

CASES = [
    b"",
    b"x",
    b"abcd",
    b"hello world " * 400,
    bytes(5000),
    b"ab" * 100000,  # overlapping-copy torture
    (b"the quick brown fox jumps over the lazy dog. " * 3000),
]


def _random_cases():
    rng = random.Random(42)
    mixed = bytearray()
    for _ in range(200):
        if rng.random() < 0.5:
            mixed += bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
        else:
            mixed += bytes([rng.randrange(256)]) * rng.randrange(300)
    return [bytes(rng.randrange(256) for _ in range(3000)), bytes(mixed)]


@pytest.mark.parametrize("data", CASES + _random_cases(), ids=range(len(CASES) + 2))
def test_roundtrip_raw_and_hadoop(data):
    assert snappy.decompress(snappy.compress(data)) == data
    assert snappy.hadoop_decompress(snappy.hadoop_compress(data)) == data
    # small block size forces the multi-block hadoop path
    assert snappy.hadoop_decompress(snappy.hadoop_compress(data, block_size=777)) == data


def test_decode_handwritten_stream():
    # varint len 13; literal "abcd"; copy-1 off=4 len=4; literal "e";
    # copy-2 off=9 len=4
    s = bytes([13]) + bytes([(4 - 1) << 2]) + b"abcd"
    s += bytes([((4 - 4) << 2) | (0 << 5) | 1, 4])
    s += bytes([0 << 2]) + b"e"
    s += bytes([((4 - 1) << 2) | 2]) + (9).to_bytes(2, "little")
    assert snappy.decompress(s) == b"abcdabcdeabcd"


def test_overlapping_copy_repeats_pattern():
    # literal "ab" then a copy off=2 len=10 → "ab" * 6
    s = bytes([12]) + bytes([(2 - 1) << 2]) + b"ab"
    s += bytes([((10 - 1) << 2) | 2]) + (2).to_bytes(2, "little")
    assert snappy.decompress(s) == b"ab" * 6


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        snappy.decompress(b"")  # truncated preamble
    with pytest.raises(ValueError):
        # len 4, copy with offset beyond output
        snappy.decompress(bytes([4, ((4 - 1) << 2) | 2, 9, 0]))
    with pytest.raises(ValueError):
        # declared length ≠ decoded length
        snappy.decompress(bytes([9, (4 - 1) << 2]) + b"abcd")


def test_compress_ratio_on_repetitive_input():
    data = b"0123456789abcdef" * 4096  # 64 KiB
    assert len(snappy.compress(data)) < len(data) // 10


@pytest.fixture(scope="module")
def jvm(spark):
    return spark._sc._jvm


def test_raw_block_conforms_to_snappy_java(jvm):
    SJ = jvm.org.xerial.snappy.Snappy
    for data in CASES[1:] + _random_cases():
        theirs = bytes(SJ.compress(bytearray(data)))
        assert snappy.decompress(theirs) == data
        assert bytes(SJ.uncompress(bytearray(snappy.compress(data)))) == data


def test_hadoop_framing_conforms_to_hadoop_snappycodec(jvm):
    conf = jvm.org.apache.hadoop.conf.Configuration()
    codec = jvm.org.apache.hadoop.io.compress.SnappyCodec()
    codec.setConf(conf)
    IOUtils = jvm.org.apache.commons.io.IOUtils
    for data in CASES[1:] + _random_cases():
        bos = jvm.java.io.ByteArrayOutputStream()
        cos = codec.createOutputStream(bos)
        cos.write(bytearray(data))
        cos.close()
        assert snappy.hadoop_decompress(bytes(bos.toByteArray())) == data
        bis = jvm.java.io.ByteArrayInputStream(bytearray(snappy.hadoop_compress(data)))
        assert bytes(IOUtils.toByteArray(codec.createInputStream(bis))) == data


def test_rcfile_snappy_roundtrip_through_spark(spark, tmp_path):
    from impala_cut_spark.sources.rcfile import read_rcfile, write_rcfile

    rows = [[i if i % 3 else None, f"s_{i}" if i % 4 else None] for i in range(200)]
    path = str(tmp_path / "snappy.rc")
    write_rcfile(
        rows, 2, path, rows_per_group=32,
        codec="org.apache.hadoop.io.compress.SnappyCodec",
    )
    df = read_rcfile(spark, path, "id bigint, s string")
    got = sorted(map(tuple, df.collect()), key=repr)
    want = sorted(
        ((i if i % 3 else None, f"s_{i}" if i % 4 else None) for i in range(200)),
        key=repr,
    )
    assert got == want


def test_avro_snappy_codec_roundtrip(tmp_path):
    from impala_cut_spark.sources.avro import read_avro_file, write_avro

    rows = [(i, f"name_{i}" * 20, float(i) / 7) for i in range(500)]
    path = str(tmp_path / "t.avro")
    write_avro(
        path,
        [("id", "long"), ("name", "string"), ("x", "double")],
        rows,
        codec="snappy",
    )
    assert list(read_avro_file(path)) == rows
    # snappy block must actually be smaller than the raw encoding
    assert os.path.getsize(path) < sum(len(r[1]) for r in rows)


def test_avro_snappy_crc_detects_corruption(tmp_path):
    from impala_cut_spark.sources.avro import read_avro_file, write_avro

    path = str(tmp_path / "bad.avro")
    write_avro(path, [("id", "long")], [(1,), (2,)], codec="snappy")
    raw = bytearray(open(path, "rb").read())
    # flip a bit in the stored CRC (the last 4 bytes before the trailing
    # 16-byte sync marker)
    raw[-17] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC|snappy"):
        list(read_avro_file(path))


def test_crc_is_of_uncompressed_bytes(tmp_path):
    """Avro spec: the 4-byte CRC32 covers the UNCOMPRESSED block."""
    from impala_cut_spark.sources.avro import write_avro

    path = str(tmp_path / "c.avro")
    write_avro(path, [("s", "string")], [("hello",)], codec="snappy")
    raw = open(path, "rb").read()
    sync = raw[-16:]
    # block payload sits between header sync and trailing sync
    head_end = raw.index(sync) + 16
    block = raw[head_end:-16]
    # strip the two zigzag varints (count=1, size) — both single-byte here
    payload = block[2:]
    crc = payload[-4:]
    plain = snappy.decompress(payload[:-4])
    assert zlib.crc32(plain) & 0xFFFFFFFF == int.from_bytes(crc, "big")


def test_hypothesis_roundtrip():
    """Property fuzz: arbitrary byte structures survive both framings
    (the §5 property-invariant strategy applied to the codec)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.binary(max_size=4096))
    def rt(data):
        assert snappy.decompress(snappy.compress(data)) == data
        assert snappy.hadoop_decompress(snappy.hadoop_compress(data)) == data

    rt()
