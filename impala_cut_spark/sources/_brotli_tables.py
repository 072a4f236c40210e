"""Constant tables for the RFC 7932 (Brotli) decoder.

Every table here is published data from RFC 7932 itself: the 121 word
transforms (Appendix B), the literal context lookup tables (section 7.1,
laid out as four 512-byte mode blocks: ctx = LUT[mode*512 + p1] |
LUT[mode*512 + 256 + p2]), the block-count code (section 6), the
insert-and-copy length codes (section 5), and the static dictionary
geometry (Appendix A).  The dictionary bytes themselves ship as
_brotli_dict.bin next to this file (sha256-pinned below).

The reference engine (rampage644/impala-cut) contains no brotli code at
all; this backs the crawl front-end's HTTP Content-Encoding support,
an extension beyond the reference (see sources/warc.py).
"""

import base64

#: section 6 — block count code: symbol -> (first value, extra bits)
BLOCK_LEN = [(1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3), (41, 3), (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5), (177, 5), (209, 5), (241, 6), (305, 6), (369, 7), (497, 8), (753, 9), (1265, 10), (2289, 11), (4337, 12), (8433, 13), (16625, 24)]

#: section 5 — insert length code: symbol -> (first value, extra bits)
INSERT_LEN = [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (8, 1), (10, 2), (14, 2), (18, 3), (26, 3), (34, 4), (50, 4), (66, 5), (98, 5), (130, 6), (194, 7), (322, 8), (578, 9), (1090, 10), (2114, 12), (6210, 14), (22594, 24)]

#: section 5 — copy length code: symbol -> (first value, extra bits)
COPY_LEN = [(2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0), (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4), (54, 4), (70, 5), (102, 5), (134, 6), (198, 7), (326, 8), (582, 9), (1094, 10), (2118, 24)]

#: section 5 — command code -> (insert code base, copy code base)
INSERT_RANGE_BASE = [0, 0, 8, 8, 0, 16, 8, 16, 16]
COPY_RANGE_BASE = [0, 8, 0, 8, 16, 0, 16, 8, 16]

#: section 4 — distance short codes: ring index offset / value delta
DIST_SHORT_INDEX = [3, 2, 1, 0, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2]
DIST_SHORT_DELTA = [0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3]

#: Appendix A — static dictionary geometry (word lengths 4..24)
DICT_SIZE_BITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5, 0, 0, 0, 0, 0, 0, 0]
DICT_OFFSETS = [0, 0, 0, 0, 0, 4096, 9216, 21504, 35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704, 106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016, 122784, 122784, 122784, 122784, 122784, 122784, 122784]
DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"

#: section 7.1 — literal context lookup, four 512-byte mode blocks
CONTEXT_LUT = base64.b64decode(
    "AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIjJCUmJygpKissLS4vMDEyMzQ1Njc4"
    "OTo7PD0+PwABAgMEBQYHCAkKCwwNDg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAx"
    "MjM0NTY3ODk6Ozw9Pj8AAQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRobHB0eHyAhIiMkJSYnKCkq"
    "KywtLi8wMTIzNDU2Nzg5Ojs8PT4/AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIj"
    "JCUmJygpKissLS4vMDEyMzQ1Njc4OTo7PD0+PwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAQEBAQICAgIDAwMDBAQEBAUFBQUGBgYGBwcHBwgICAgJCQkJCgoKCgsLCwsMDAwMDQ0NDQ4O"
    "Dg4PDw8PEBAQEBERERESEhISExMTExQUFBQVFRUVFhYWFhcXFxcYGBgYGRkZGRoaGhobGxsbHBwc"
    "HB0dHR0eHh4eHx8fHyAgICAhISEhIiIiIiMjIyMkJCQkJSUlJSYmJiYnJycnKCgoKCkpKSkqKioq"
    "KysrKywsLCwtLS0tLi4uLi8vLy8wMDAwMTExMTIyMjIzMzMzNDQ0NDU1NTU2NjY2Nzc3Nzg4ODg5"
    "OTk5Ojo6Ojs7Ozs8PDw8PT09PT4+Pj4/Pz8/AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAQEAAAEAAAAAAAAAAAAAAAAAAAAAAAACAwQDAwUDBAYHAwMIAwkDCwsLCwsLCwsLCwg"
    "IBgoHAwMMDQ0NDA0NDQwNDQ0NDQwNDQ0NDQwNDQ0NDQYDBwMDAw4PDw8ODw8PDg8PDw8PDg8PDw8"
    "PDg8PDw8PBgMHAwAAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEAAQABAAEA"
    "AQABAAEAAQABAAEAAQABAAEAAQIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMCAwID"
    "AgMCAwIDAgMCAwIDAgMCAwIDAgMCAwIDAgMAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAQEBAQEBAQICAgICAgICAgICAgICAgICAgICAgIC"
    "AgICAQEBAQEBAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMBAQEBAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAAgI"
    "CAgICAgICAgICAgICBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQ"
    "EBAQEBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgYGBgY"
    "GBgYGBgYGBgYGBggICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAg"
    "ICAgICAgICAgICAgICAgICAgKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgoKCgo"
    "KCgoKCgoKCgoMDAwMDAwMDAwMDAwMDAwOAABAQEBAQEBAQEBAQEBAQECAgICAgICAgICAgICAgIC"
    "AgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMD"
    "AwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDAwMDBAQEBAQEBAQEBAQEBAQEBAQE"
    "BAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAUFBQUFBQUFBQUF"
    "BQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFBQYGBgYGBgYGBgYGBgYGBgc="
)

#: Appendix B — the 121 word transforms: (prefix, type, suffix);
#: type 0 identity, 1-9 omit-last-N, 10 uppercase-first,
#: 11 uppercase-all, 12-20 omit-first-N
TRANSFORMS = [
    (b'', 0, b''),
    (b'', 0, b' '),
    (b' ', 0, b' '),
    (b'', 12, b''),
    (b'', 10, b' '),
    (b'', 0, b' the '),
    (b' ', 0, b''),
    (b's ', 0, b' '),
    (b'', 0, b' of '),
    (b'', 10, b''),
    (b'', 0, b' and '),
    (b'', 13, b''),
    (b'', 1, b''),
    (b', ', 0, b' '),
    (b'', 0, b', '),
    (b' ', 10, b' '),
    (b'', 0, b' in '),
    (b'', 0, b' to '),
    (b'e ', 0, b' '),
    (b'', 0, b'"'),
    (b'', 0, b'.'),
    (b'', 0, b'">'),
    (b'', 0, b'\n'),
    (b'', 3, b''),
    (b'', 0, b']'),
    (b'', 0, b' for '),
    (b'', 14, b''),
    (b'', 2, b''),
    (b'', 0, b' a '),
    (b'', 0, b' that '),
    (b' ', 10, b''),
    (b'', 0, b'. '),
    (b'.', 0, b''),
    (b' ', 0, b', '),
    (b'', 15, b''),
    (b'', 0, b' with '),
    (b'', 0, b"'"),
    (b'', 0, b' from '),
    (b'', 0, b' by '),
    (b'', 16, b''),
    (b'', 17, b''),
    (b' the ', 0, b''),
    (b'', 4, b''),
    (b'', 0, b'. The '),
    (b'', 11, b''),
    (b'', 0, b' on '),
    (b'', 0, b' as '),
    (b'', 0, b' is '),
    (b'', 7, b''),
    (b'', 1, b'ing '),
    (b'', 0, b'\n\t'),
    (b'', 0, b':'),
    (b' ', 0, b'. '),
    (b'', 0, b'ed '),
    (b'', 20, b''),
    (b'', 18, b''),
    (b'', 6, b''),
    (b'', 0, b'('),
    (b'', 10, b', '),
    (b'', 8, b''),
    (b'', 0, b' at '),
    (b'', 0, b'ly '),
    (b' the ', 0, b' of '),
    (b'', 5, b''),
    (b'', 9, b''),
    (b' ', 10, b', '),
    (b'', 10, b'"'),
    (b'.', 0, b'('),
    (b'', 11, b' '),
    (b'', 10, b'">'),
    (b'', 0, b'="'),
    (b' ', 0, b'.'),
    (b'.com/', 0, b''),
    (b' the ', 0, b' of the '),
    (b'', 10, b"'"),
    (b'', 0, b'. This '),
    (b'', 0, b','),
    (b'.', 0, b' '),
    (b'', 10, b'('),
    (b'', 10, b'.'),
    (b'', 0, b' not '),
    (b' ', 0, b'="'),
    (b'', 0, b'er '),
    (b' ', 11, b' '),
    (b'', 0, b'al '),
    (b' ', 11, b''),
    (b'', 0, b"='"),
    (b'', 11, b'"'),
    (b'', 10, b'. '),
    (b' ', 0, b'('),
    (b'', 0, b'ful '),
    (b' ', 10, b'. '),
    (b'', 0, b'ive '),
    (b'', 0, b'less '),
    (b'', 11, b"'"),
    (b'', 0, b'est '),
    (b' ', 10, b'.'),
    (b'', 11, b'">'),
    (b' ', 0, b"='"),
    (b'', 10, b','),
    (b'', 0, b'ize '),
    (b'', 11, b'.'),
    (b'\xc2\xa0', 0, b''),
    (b' ', 0, b','),
    (b'', 10, b'="'),
    (b'', 11, b'="'),
    (b'', 0, b'ous '),
    (b'', 11, b', '),
    (b'', 10, b"='"),
    (b' ', 10, b','),
    (b' ', 11, b'="'),
    (b' ', 11, b', '),
    (b'', 11, b','),
    (b'', 11, b'('),
    (b'', 11, b'. '),
    (b' ', 11, b'.'),
    (b'', 11, b"='"),
    (b' ', 11, b'. '),
    (b' ', 10, b'="'),
    (b' ', 11, b"='"),
    (b' ', 10, b"='"),
]
