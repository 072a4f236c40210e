"""Brotli decoder (sources/brotli.py) — RFC 7932 conformance.

Independent anchor: the container's own libbrotli (ctypes, tests
only).  libbrotlienc compresses varied corpora at qualities 0-11 and
the from-scratch decoder must reproduce the exact bytes; libbrotlidec
likewise decodes the store-mode encoder's streams.  The corpus forces
every decoder path: simple and complex prefix codes, code-length
repeats, uncompressed meta-blocks (q0 on incompressible data),
context maps + block splitting (q10/11), static-dictionary word
transforms (q11 on small text), and distances through the ring
buffer's short codes.  The RFC constant tables are additionally
pinned against the lib's exported copies
(_kBrotliPrefixCodeRanges, _kBrotliContextLookupTable,
BrotliGetDictionary, BrotliTransformDictionaryWord).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import random
import zlib

import pytest

from impala_cut_spark.sources import brotli
from impala_cut_spark.sources._brotli_tables import (
    BLOCK_LEN,
    CONTEXT_LUT,
    DICT_OFFSETS,
    DICT_SIZE_BITS,
)


def _load(name):
    try:
        return ctypes.CDLL(name)
    except OSError:
        return None


_ENC = _load("libbrotlienc.so.1") or _load(ctypes.util.find_library("brotlienc"))
_DEC = _load("libbrotlidec.so.1") or _load(ctypes.util.find_library("brotlidec"))
_COM = _load("libbrotlicommon.so.1") or _load(ctypes.util.find_library("brotlicommon"))

needs_lib = pytest.mark.skipif(
    _ENC is None or _DEC is None or _COM is None,
    reason="system libbrotli not available",
)


def _lib_compress(data: bytes, quality: int = 9, window: int = 22) -> bytes:
    _ENC.BrotliEncoderCompress.restype = ctypes.c_int
    out = ctypes.create_string_buffer(len(data) * 2 + 2048)
    n = ctypes.c_size_t(len(out))
    assert _ENC.BrotliEncoderCompress(
        quality, window, 0, len(data), data, ctypes.byref(n), out
    )
    return out.raw[: n.value]


def _lib_decompress(data: bytes, expected_len: int) -> bytes:
    _DEC.BrotliDecoderDecompress.restype = ctypes.c_int
    out = ctypes.create_string_buffer(expected_len + 16)
    n = ctypes.c_size_t(len(out))
    r = _DEC.BrotliDecoderDecompress(len(data), data, ctypes.byref(n), out)
    assert r == 1, f"libbrotlidec rejected stream (result {r})"
    return out.raw[: n.value]


def _corpus() -> dict[str, bytes]:
    rng = random.Random(1)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "http://example.com/", "<html>", "data", "that"]
    text = (" ".join(rng.choice(words) for _ in range(8000))).encode()
    mixed = bytearray()
    for _ in range(200):
        if rng.random() < 0.5:
            mixed += bytes(rng.randrange(256) for _ in range(rng.randrange(60)))
        else:
            mixed += bytes([rng.randrange(256)]) * rng.randrange(200)
    return {
        "empty": b"",
        "one": b"a",
        "tiny-dictish": b"the time of the people",  # q11 emits dictionary words
        "text": text,
        "random": bytes(rng.randrange(256) for _ in range(6000)),
        "mixed": bytes(mixed),
        "runs": b"aaaaaaaabbbbbbbb" * 2000,
        "utf8": "köttbullar och 昨日の天気はとても良かったです。".encode() * 50,
        "csvish": b"\n".join(b"%d,name_%d,addr %d" % (i, i, i % 97)
                             for i in range(4000)),
    }


@needs_lib
def test_decodes_libbrotli_output_all_qualities():
    for name, data in _corpus().items():
        for q in (0, 1, 2, 5, 9, 11):
            for w in (10, 18, 24):
                comp = _lib_compress(data, q, w)
                got = brotli.decompress(comp)
                assert got == data, (name, q, w)


@needs_lib
def test_small_text_quality_11_hits_dictionary_transforms():
    # q11 on short web-like text emits static-dictionary references;
    # assert the stream is genuinely smaller than its literals so the
    # dictionary path is actually being exercised.
    for s in [b"This is the time of the people of the world.",
              b'<a href="http://www.example.com/index.html">download</a>',
              b"The quick brown fox. THE QUICK BROWN FOX."]:
        comp = _lib_compress(s, 11, 22)
        assert brotli.decompress(comp) == s


@needs_lib
def test_transform_parity_with_libbrotli():
    class Transforms(ctypes.Structure):
        _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                    ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                    ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                    ("num_transforms", ctypes.c_uint32),
                    ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                    ("params", ctypes.POINTER(ctypes.c_uint8)),
                    ("cutOffTransforms", ctypes.c_int16 * 10)]

    class Dict(ctypes.Structure):
        _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                    ("offsets_by_length", ctypes.c_uint32 * 32),
                    ("data_size", ctypes.c_size_t),
                    ("data", ctypes.POINTER(ctypes.c_uint8))]

    _COM.BrotliGetTransforms.restype = ctypes.POINTER(Transforms)
    _COM.BrotliGetDictionary.restype = ctypes.POINTER(Dict)
    _COM.BrotliTransformDictionaryWord.restype = ctypes.c_int
    t = _COM.BrotliGetTransforms()
    d = _COM.BrotliGetDictionary().contents
    rng = random.Random(7)
    for length in (4, 5, 8, 13, 16, 20, 24):
        bits = DICT_SIZE_BITS[length]
        for tid in range(121):
            for idx in (0, (1 << bits) - 1, rng.randrange(1 << bits)):
                word_id = (tid << bits) | idx
                mine = brotli.transform_dictionary_word(length, word_id)
                dst = ctypes.create_string_buffer(length + 64)
                src = ctypes.addressof(d.data.contents) \
                    + d.offsets_by_length[length] + idx * length
                n = _COM.BrotliTransformDictionaryWord(
                    dst, ctypes.c_void_p(src), length, t, tid)
                assert mine == dst.raw[:n], (length, tid, idx)


@needs_lib
def test_rfc_tables_match_lib_exports():
    raw = bytes((ctypes.c_uint8 * 104).in_dll(_COM, "_kBrotliPrefixCodeRanges"))
    import struct
    lib_block = [struct.unpack_from("<HH", raw, 4 * i) for i in range(26)]
    assert [tuple(e) for e in BLOCK_LEN] == lib_block
    lut = bytes((ctypes.c_uint8 * 2048).in_dll(_COM, "_kBrotliContextLookupTable"))
    assert CONTEXT_LUT == lut

    class Dict(ctypes.Structure):
        _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                    ("offsets_by_length", ctypes.c_uint32 * 32),
                    ("data_size", ctypes.c_size_t),
                    ("data", ctypes.POINTER(ctypes.c_uint8))]
    _COM.BrotliGetDictionary.restype = ctypes.POINTER(Dict)
    d = _COM.BrotliGetDictionary().contents
    assert list(d.size_bits_by_length) == DICT_SIZE_BITS
    assert list(d.offsets_by_length) == DICT_OFFSETS


@needs_lib
def test_store_mode_streams_decode_via_libbrotli():
    for name, data in _corpus().items():
        comp = brotli.compress(data, level=0)
        assert _lib_decompress(comp, len(data)) == data, name
        assert brotli.decompress(comp) == data, name


@needs_lib
def test_store_mode_multi_metablock():
    data = bytes(range(256)) * 70000  # ~17.9 MB: > one 2^24-1 block
    comp = brotli.compress(data, level=0)
    assert brotli.decompress(comp) == data
    assert _lib_decompress(comp, len(data)) == data


@needs_lib
def test_handcrafted_metadata_block_is_skipped():
    # WBITS=16 ('0'), metadata block (ISLAST=0, MNIBBLES code 3,
    # reserved 0, MSKIPBYTES=1, skiplen-1=4), 5 skip bytes, then an
    # empty-last block — both decoders must return b''.
    bits = []
    bits.append((0, 1))   # WBITS = 16
    bits.append((0, 1))   # ISLAST = 0
    bits.append((3, 2))   # MNIBBLES code 3: metadata
    bits.append((0, 1))   # reserved
    bits.append((1, 2))   # MSKIPBYTES = 1
    bits.append((4, 8))   # MSKIPLEN - 1 = 4
    out = bytearray()
    acc = nb = 0
    for v, n in bits:
        acc |= v << nb
        nb += n
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    out += b"META!"        # the 5 skipped bytes
    out.append(0b00000011)  # ISLAST=1, ISLASTEMPTY=1
    stream = bytes(out)
    assert brotli.decompress(stream) == b""
    assert _lib_decompress(stream, 0) == b""


def test_corrupt_streams_raise():
    # store mode: truncation semantics are deterministic (raw bytes
    # missing), unlike entropy streams whose tail may be padding
    good = brotli.compress(b"hello world, hello brotli", level=0)
    with pytest.raises(ValueError):
        brotli.decompress(good[:-4] if len(good) > 4 else b"")
    with pytest.raises(ValueError):
        brotli.decompress(b"")
    with pytest.raises(ValueError):
        brotli.decompress(good + b"trailing garbage")
    # reserved WBITS pattern: first bit 1, next 3 = 0, next 3 = 1
    with pytest.raises(ValueError):
        brotli.decompress(bytes([0b0001_0001, 0, 0]))


def test_max_output_guard():
    comp = brotli.compress(b"x" * 100_000)
    with pytest.raises(ValueError, match="exceeds allowed size"):
        brotli.decompress(comp, max_output=50_000)
    assert len(brotli.decompress(comp, max_output=100_000)) == 100_000


def test_invalid_dictionary_reference_raises():
    with pytest.raises(ValueError):
        brotli.transform_dictionary_word(3, 0)   # length < 4
    with pytest.raises(ValueError):
        brotli.transform_dictionary_word(25, 0)  # length > 24
    bits = DICT_SIZE_BITS[4]
    with pytest.raises(ValueError):
        brotli.transform_dictionary_word(4, (121 << bits))  # transform >= 121


def test_hypothesis_store_mode_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=4096))
    def check(data):
        assert brotli.decompress(brotli.compress(data, level=0)) == data

    check()


@needs_lib
def test_hypothesis_lib_encode_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(max_size=4096), st.integers(0, 11))
    def check(data, q):
        assert brotli.decompress(_lib_compress(data, q, 22)) == data

    check()


# -- HTTP body decoding (the crawl-path consumer) ------------------------------


def test_decode_http_body_identity_and_unknown():
    from impala_cut_spark.sources.warc import decode_http_body

    body, enc = decode_http_body({}, b"plain")
    assert (body, enc) == (b"plain", "identity")
    with pytest.raises(ValueError, match="unsupported content-encoding"):
        decode_http_body({"content-encoding": "compress"}, b"x")


def test_decode_http_body_all_codings():
    from impala_cut_spark.sources import zstd
    from impala_cut_spark.sources.warc import decode_http_body

    payload = b"the quick brown fox, " * 200
    gz = zlib.compressobj(wbits=31)
    cases = [
        ({"content-encoding": "gzip"}, gz.compress(payload) + gz.flush()),
        ({"content-encoding": "deflate"}, zlib.compress(payload)),
        ({"content-encoding": "deflate"},
         zlib.compress(payload)[2:-4]),  # raw-deflate server
        ({"content-encoding": "br"}, brotli.compress(payload)),
        ({"content-encoding": "zstd"}, zstd.compress(payload)),
    ]
    for headers, body in cases:
        got, enc = decode_http_body(headers, body)
        assert got == payload, headers
        assert enc == headers["content-encoding"]


@needs_lib
def test_decode_http_body_real_brotli_encoding():
    from impala_cut_spark.sources.warc import decode_http_body

    payload = open(os.path.join(os.path.dirname(__file__), "..", "README.md"),
                   "rb").read()
    body = _lib_compress(payload, 11, 22)
    got, enc = decode_http_body({"content-encoding": "BR"}, body)
    assert got == payload and enc == "br"


def test_decode_http_body_chunked():
    from impala_cut_spark.sources.warc import decode_http_body

    payload = b"hello chunked world"
    body = (b"5;ext=1\r\nhello\r\n"
            b"E\r\n chunked world\r\n"
            b"0\r\nTrailer: x\r\n\r\n")
    got, enc = decode_http_body({"transfer-encoding": "chunked"}, body)
    assert got == payload and enc == "identity"
    # chunked + gzip composes (transfer coding first, then content coding)
    gz = zlib.compressobj(wbits=31)
    z = gz.compress(payload) + gz.flush()
    body = b"%x\r\n" % len(z) + z + b"\r\n0\r\n\r\n"
    got, enc = decode_http_body(
        {"transfer-encoding": "chunked", "content-encoding": "gzip"}, body)
    assert got == payload and enc == "gzip"
    with pytest.raises(ValueError):
        decode_http_body({"transfer-encoding": "chunked"}, b"5\r\nhel")


def test_decode_http_body_bomb_guard():
    """A KB-sized compressed body expanding past max_output must raise
    in every coding arm, without materializing the expansion."""
    from impala_cut_spark.sources import zstd
    from impala_cut_spark.sources.warc import decode_http_body

    big = b"\x00" * 4_000_000
    gz = zlib.compressobj(wbits=31)
    arms = [
        ({"content-encoding": "gzip"}, gz.compress(big) + gz.flush()),
        ({"content-encoding": "deflate"}, zlib.compress(big)),
        ({"content-encoding": "br"}, _lib_compress(big, 9, 22)
         if _ENC is not None else brotli.compress(big)),
        ({"content-encoding": "zstd"}, zstd.compress(big)),
    ]
    for headers, body in arms:
        with pytest.raises(ValueError, match="exceeds allowed size"):
            decode_http_body(headers, body, max_output=1_000_000)
        got, _ = decode_http_body(headers, body, max_output=len(big))
        assert got == big, headers


def test_truncated_uncompressed_block_raises_not_zero_fills():
    """A store-mode stream cut inside its raw bytes must raise — the
    bit reader's past-the-end zero padding is for short final codes,
    never for raw byte copies."""
    comp = brotli.compress(b"0123456789abcdef", level=0)
    for cut in (1, 2, 3, 4):
        with pytest.raises(ValueError, match="truncated"):
            brotli.decompress(comp[:-cut])


@needs_lib
def test_level1_encoder_decodes_via_libbrotli():
    """The compressing encoder (greedy LZ + entropy-coded meta-blocks)
    must round-trip through BOTH libbrotlidec and the own decoder, and
    actually compress."""
    for name, data in _corpus().items():
        z = brotli.compress(data, level=1)
        assert _lib_decompress(z, len(data)) == data, name
        assert brotli.decompress(z) == data, name
    text = _corpus()["text"]
    assert len(brotli.compress(text, level=1)) < len(text) // 2


@needs_lib
def test_level1_multi_chunk_and_copy_tail():
    # > one 4 MB meta-block, plus a payload that ends ON a copy (the
    # no-sentinel path: trailing command bits would be garbage)
    data = (b"0123456789abcdef" * 300000)[: (1 << 22) + 12345]
    z = brotli.compress(data, level=1)
    assert brotli.decompress(z) == data
    assert _lib_decompress(z, len(data)) == data
    tail_copy = b"hello world " * 10  # ends on a copy of " world "
    z = brotli.compress(tail_copy, level=1)
    assert brotli.decompress(z) == tail_copy
    assert _lib_decompress(z, len(tail_copy)) == tail_copy


def test_level1_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=8192))
    def check(data):
        assert brotli.decompress(brotli.compress(data, level=1)) == data

    check()


def test_level1_uniform_histogram_codes():
    """All 256 literals equally frequent → a flat 8-bit code whose
    code-length code is single-symbol (0-bit) — the emission path the
    VP8L encoder once desynced on."""
    data = bytes(range(256)) * 40
    z = brotli.compress(data, level=1)
    assert brotli.decompress(z) == data
    if _DEC is not None:
        assert _lib_decompress(z, len(data)) == data
