"""Zstandard decoder (sources/zstd.py) — RFC 8878 conformance.

Independent anchor: zstd-jni (com.github.luben.zstd, bundled with
Spark for shuffle/parquet compression) compresses varied corpora at
levels 1..22 and the from-scratch decoder must reproduce the exact
bytes; zstd-jni likewise decodes the store-mode encoder's frames.
The corpus is chosen to force every decoder path: RLE and raw blocks,
1- and 4-stream Huffman literals, direct and FSE-compressed weight
descriptions, treeless repeats, predefined + FSE + RLE + repeat
sequence tables, repeat-offsets (incl. the ll==0 twist), multi-block
frames and frames larger than one 128 KiB block."""

from __future__ import annotations

import os
import random
import struct

import pytest

from impala_cut_spark.sources import zstd


def _corpus() -> dict[str, bytes]:
    rng = random.Random(1)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "zstd", "frame", "entropy", "table"]
    text = (" ".join(rng.choice(words) for _ in range(20000))).encode()
    mixed = bytearray()
    for _ in range(300):
        if rng.random() < 0.5:
            mixed += bytes(rng.randrange(256) for _ in range(rng.randrange(60)))
        else:
            mixed += bytes([rng.randrange(256)]) * rng.randrange(200)
    return {
        "tiny": b"abc",
        "empty": b"",
        "rle": b"a" * 10000,
        "two-symbol": b"ababbaab" * 4000,  # the power-of-2 weight-total tree
        "text": text,
        "random": bytes(rng.randrange(256) for _ in range(20000)),
        "mixed": bytes(mixed),
        "repet": b"abcdefgh" * 30000,
        "csvish": b"\n".join(b"%d,name_%d,addr %d" % (i, i, i % 97)
                             for i in range(30000)),
        "multiblock": (" ".join(rng.choice(words)
                                for _ in range(150000))).encode(),
    }


@pytest.fixture(scope="module")
def jzstd(spark):
    return spark._sc._jvm.com.github.luben.zstd.Zstd


def test_decodes_zstd_jni_output_all_levels(jzstd):
    for name, data in _corpus().items():
        for lvl in (1, 3, 9, 19, 22):
            comp = bytes(jzstd.compress(bytearray(data), lvl))
            got = zstd.decompress(comp, expected=len(data))
            assert got == data, (name, lvl)


def test_store_mode_frames_decode_via_zstd_jni(jzstd):
    for name, data in _corpus().items():
        ours = zstd.compress(data, level=0)
        if not data:
            assert zstd.decompress(ours) == b""
            continue
        back = bytes(jzstd.decompress(bytearray(ours), len(data)))
        assert back == data, name
        # and through our own decoder
        assert zstd.decompress(ours, expected=len(data)) == data, name


def test_store_mode_multiblock_framing():
    data = os.urandom(300 * 1024)  # > 2 raw blocks
    frame = zstd.compress(data, level=0)
    assert zstd.decompress(frame) == data
    # declared frame content size is the 8-byte field after the FHD
    assert struct.unpack_from("<Q", frame, 5)[0] == len(data)


def test_concatenated_and_skippable_frames(jzstd):
    a, b = b"first" * 100, b"second" * 77
    skippable = struct.pack("<II", 0x184D2A53, 7) + b"ignored"
    blob = (bytes(jzstd.compress(bytearray(a), 3)) + skippable
            + bytes(jzstd.compress(bytearray(b), 19)))
    assert zstd.decompress(blob) == a + b


def test_checksum_flag_frames(jzstd):
    # zstd-jni static helpers don't set the checksum flag; build one by
    # hand around a store-mode frame: set FHD bit 2 and append 4 bytes
    data = b"checksummed content " * 50
    frame = bytearray(zstd.compress(data))
    frame[4] |= 0x04
    frame += b"\x00\x00\x00\x00"  # xxh64 low bytes (presence-only)
    assert zstd.decompress(bytes(frame)) == data


def test_corrupt_frames_raise():
    with pytest.raises(ValueError, match="magic"):
        zstd.decompress(b"\x00\x00\x00\x00rest")
    good = zstd.compress(b"hello world")
    with pytest.raises(ValueError):
        zstd.decompress(good, expected=5)
    # reserved block type (3)
    bad = bytearray(good)
    bad[13] |= 0x06  # block header low byte: type bits → 3
    with pytest.raises(ValueError):
        zstd.decompress(bytes(bad))


def test_two_symbol_tree_regression(jzstd):
    """The table-log edge case this implementation got wrong first: a
    Huffman tree whose explicit weight total is an exact power of two
    (two 1-bit symbols, one implied) — tableLog must still grow by one
    for the implied symbol."""
    data = (b"64" * 3000) + b"\n"
    comp = bytes(jzstd.compress(bytearray(data), 19))
    assert zstd.decompress(comp) == data


def test_repeat_offset_histories(jzstd):
    """Alternating near-periodic rows exercise the three-slot repeat
    offsets incl. the literals_length==0 rep1-1 twist at high levels."""
    rng = random.Random(9)
    rows = []
    for i in range(4000):
        rows.append(b"%05d,%s,%05d" % (i, b"const_mid", (i * 7) % 99))
        if rng.random() < 0.2:
            rows.append(rows[-1])  # exact repeats
    data = b"\n".join(rows)
    for lvl in (3, 19):
        comp = bytes(jzstd.compress(bytearray(data), lvl))
        assert zstd.decompress(comp, expected=len(data)) == data


def test_avro_zstandard_codec(tmp_path, jzstd):
    from impala_cut_spark.sources.avro import read_avro_file, write_avro

    rows = [(i, f"name_{i}" * 12) for i in range(400)]
    path = str(tmp_path / "t.avro")
    write_avro(path, [("id", "long"), ("name", "string")], rows,
               codec="zstandard")
    assert list(read_avro_file(path)) == rows
    # cross-direction: an avro file whose zstd block was compressed by
    # zstd-jni (a REAL entropy-coded frame) reads back identically
    plain = str(tmp_path / "plain.avro")
    write_avro(plain, [("id", "long"), ("name", "string")], rows, codec="null")
    raw = open(plain, "rb").read()
    # container: header…sync | count | size | block | sync
    sync = raw[-16:]
    head_end = raw.index(sync) + 16
    body = raw[head_end:-16]
    # strip the two zigzag varints in front of the block
    import io

    from impala_cut_spark.sources.avro import _read_long

    bio = io.BytesIO(body)
    count = _read_long(bio)
    size = _read_long(bio)
    block = body[bio.tell() : bio.tell() + size]
    comp = bytes(jzstd.compress(bytearray(block), 19))

    def wvar(n):
        out = bytearray()
        n = (n << 1) ^ (n >> 63)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # the codec meta value is length-prefixed: zigzag(4)=0x08 "null" →
    # zigzag(9)=0x12 "zstandard"
    hdr = raw[:head_end].replace(b"\x08null", b"\x12zstandard", 1)
    jpath = str(tmp_path / "jzstd.avro")
    open(jpath, "wb").write(hdr + wvar(count) + wvar(len(comp)) + comp + sync)
    assert list(read_avro_file(jpath)) == rows


def test_hypothesis_store_mode_roundtrip():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.binary(max_size=4096))
    def rt(data):
        assert zstd.decompress(zstd.compress(data), expected=len(data)) == data

    rt()


def test_long_form_sequence_count(jzstd):
    """RFC 8878 §3.1.1.3.2.1 long form (byte0 == 0xFF): nseq is an
    arithmetic SUM (byte1 + byte2<<8 + 0x7F00), not a bitwise OR
    (ADVICE r9 high — OR only coincides when byte2's low 7 bits are 0).
    Real encoders rarely exceed 0x7F00 sequences per block (~21k max
    observed at level 19/22 on dense-match input), so this hand-builds
    a conformant frame with exactly 0x8000 sequences — 1 literal +
    3-byte repeat-offset-1 match each, 128 KiB regenerated, RLE
    sequence modes — and cross-validates it against zstd-jni, which
    decodes it to the identical bytes.  nseq bytes FF 00 01: the OR
    form reads 0x7F00 (drops 256 sequences) and truncates the output;
    the SUM form reads 0x8000."""
    import struct

    rng = random.Random(3)
    nseq = 0x8000
    lits = bytes(rng.randrange(65, 91) for _ in range(nseq))
    block = (
        bytes([0x0C, 0x00, 0x08]) + lits      # raw literals, 20-bit size 32768
        + bytes([0xFF, 0x00, 0x01])           # Number_of_Sequences long form
        + bytes([0x54, 0x01, 0x00, 0x00])     # RLE modes; ll=1, of=0, ml=0
        + b"\x01"                             # backward-bitstream sentinel
    )
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([0xA0]) + struct.pack("<I", nseq * 4)  # single-seg, 4-byte FCS
        + (1 | (2 << 1) | (len(block) << 3)).to_bytes(3, "little")
        + block
    )
    expected = b"".join(bytes([c]) * 4 for c in lits)
    assert zstd.decompress(frame, expected=len(expected)) == expected
    # independent anchor: the reference decoder agrees byte-for-byte
    assert bytes(jzstd.decompress(bytearray(frame), len(expected))) == expected


def test_match_offset_cannot_cross_frame_boundary():
    """A frame's matches may only reference its OWN output (ADVICE r9):
    hand-built second frame whose first sequence uses initial repeat
    offset 4 with zero bytes produced — it must raise, not silently
    copy bytes from the previous frame's output."""
    import struct

    # block: raw literals size 0 | nseq=1 | modes=RLE/RLE/RLE |
    # ll=0 of_code=0 ml_code=0 | backward bitstream sentinel byte.
    # Decodes to: ll=0, of_value=1 (+ll==0 → reps[1]=4), ml=3.
    block = bytes([0x00, 0x01, 0x54, 0x00, 0x00, 0x00, 0x01])
    evil = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([0x20, 0x03])  # single-segment, 1-byte FCS = 3
        + (1 | (2 << 1) | (len(block) << 3)).to_bytes(3, "little")
        + block
    )
    # alone: offset 4 with 0 bytes of frame output → reject
    with pytest.raises(ValueError, match="offset beyond window"):
        zstd.decompress(evil)
    # after a frame that DID produce ≥4 bytes: still reject (the old
    # len(out)-wide check silently copied b'EFGH' here)
    with pytest.raises(ValueError, match="offset beyond window"):
        zstd.decompress(zstd.compress(b"ABCDEFGH") + evil)


def test_fse_weight_stream_never_overshoots_limit():
    """_fse_decode_stream appends two symbols per iteration; a corrupt
    Huffman-weight stream must still cap at `limit` (ADVICE r9) rather
    than yield limit+1 weights and build a 257-symbol table."""
    table = zstd._FseTable(1, [1, 1])  # 2-entry table, 1-bit states
    for limit in (1, 2, 3, 4, 5):
        bb = zstd._BackBits(bytes([0xFF] * 8 + [0x01]))
        out = zstd._fse_decode_stream(table, bb, limit)
        assert len(out) <= limit, (limit, len(out))


def test_level1_encoder_roundtrips_via_zstd_jni(jzstd):
    """The level-1 encoder (sequences over the predefined FSE tables,
    tANS state chains derived from the decode tables) must decode via
    the reference implementation AND the own decoder, and actually
    compress repetitive payloads."""
    for name, data in _corpus().items():
        z = zstd.compress(data, level=1)
        if data:
            assert bytes(jzstd.decompress(bytearray(z), len(data))) == data, name
        assert zstd.decompress(z, expected=len(data)) == data, name
    rep = b"abcdefgh" * 30000
    assert len(zstd.compress(rep, level=1)) < len(rep) // 50


def test_level1_multiblock_and_raw_fallback(jzstd):
    # > one 128 KiB block, with a random (incompressible) stretch that
    # must fall back to a raw block mid-frame
    data = (b"the words repeat " * 9000) + bytes(range(256)) * 520 + \
        (b"tail tail tail " * 5000)
    z = zstd.compress(data, level=1)
    assert zstd.decompress(z, expected=len(data)) == data
    assert bytes(jzstd.decompress(bytearray(z), len(data))) == data


def test_level1_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.binary(max_size=8192))
    def check(data):
        assert zstd.decompress(zstd.compress(data, level=1),
                               expected=len(data)) == data

    check()


def test_max_output_enforced_inside_block():
    # r11 ADVICE #4: the bomb guard must fire DURING block decode, not
    # after a hostile block materializes gigabytes.  A highly
    # repetitive input compresses to long repeat-matches; decoding
    # with a tiny max_output must raise, with len(out) never running
    # far past the cap.
    data = b"A" * 100_000
    z = zstd.compress(data, level=1)
    with pytest.raises(ValueError, match="exceeds allowed"):
        zstd.decompress(z, max_output=1024)


def test_block_size_over_128k_rejected():
    # RFC 8878 §3.1.1.2: Block_Maximum_Size is 128 KiB; an RLE block
    # header claiming a bigger regenerated size (bsize is the EXPANSION
    # for RLE — 1 byte in, bsize out) must be rejected before expanding.
    frame = bytearray()
    frame += struct.pack("<I", 0xFD2FB528)
    frame.append((3 << 6) | (1 << 5))  # 8-byte FCS, single-segment
    frame += struct.pack("<Q", 1 << 20)
    bsize = 1 << 20  # 1 MiB claimed RLE expansion
    frame += ((1) | (1 << 1) | (bsize << 3)).to_bytes(3, "little")
    frame.append(0x41)
    with pytest.raises(ValueError, match="128 KiB"):
        zstd.decompress(bytes(frame))
