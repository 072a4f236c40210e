"""Content-defined chunking (CDC) — byte-shift-resistant dedup
primitives, the missing granularity between whole-document
fingerprints (dedup.py) and shingle families (minhash/jaccard):
boundaries derive from CONTENT, so inserting one byte early in a
document re-chunks O(1) chunks instead of shifting every fixed-size
block (the rsync/LBFS/FastCDC insight; public literature: Muthitacharoen
et al. LBFS SOSP'01, Xia et al. FastCDC ATC'16).

Two arms, same contract as the md5-vs-xxhash dedup twins:

- **`gear_chunks`** — the PRODUCTION arm: FastCDC-style gear rolling
  hash (one shift+add+table-lookup per byte) with min/max chunk-size
  clamps.  The min-size skip makes boundaries stateful, so this arm
  is pytest-verified (shift-resistance, clamp invariants, known
  vectors) rather than SQL-replayed.
- **`poly_chunks`** — the ORACLE arm: a windowed polynomial boundary
  predicate (H over the last `window` chars ≡ 0 mod `modulus`) with
  no clamps.  Every boundary is a pure per-position predicate, so
  DuckDB replays the exact chunk set with range-unnest + substr —
  the registry rows strict-hash-match on it.

Scale: chunking is a linear Arrow-batched narrow map (one document
resident at a time).  The dedup aggregate shuffles one row per CHUNK
keyed by content hash with map-side combine — chunk rows are ~1/64th
the corpus bytes in count and carry only (hash, doc) pairs, never
chunk text.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

#: gear table: 256 deterministic 64-bit values derived from md5 so
#: every engine/worker regenerates the identical table (no RNG)
GEAR = [
    int.from_bytes(hashlib.md5(b"gear-%d" % i).digest()[:8], "big")
    for i in range(256)
]

_M64 = (1 << 64) - 1

#: polynomial-arm parameters (the oracle twin): H = Σ ord(c_k)·31^k
#: over a 4-char window, boundary where H % 64 == 0 → ~64-char chunks
POLY_WINDOW = 4
POLY_BASE = 31
POLY_MODULUS = 64


def gear_chunks(
    data: bytes,
    mask: int = 0x3F,
    min_size: int = 16,
    max_size: int = 256,
) -> list[tuple[int, int]]:
    """FastCDC-style chunking → [(start, end), ...] covering ``data``
    exactly.  The gear hash rolls one shift+add per byte; a boundary
    cuts where ``h & mask == 0`` once ``min_size`` bytes accumulated,
    and ``max_size`` force-cuts pathological runs (the clamp that
    bounds worst-case chunk size on low-entropy input)."""
    if min_size < 1 or max_size < min_size:
        raise ValueError("cdc: need 1 <= min_size <= max_size")
    out: list[tuple[int, int]] = []
    start = 0
    h = 0
    for pos, b in enumerate(data):
        h = ((h << 1) + GEAR[b]) & _M64
        length = pos - start + 1
        if (length >= min_size and h & mask == 0) or length >= max_size:
            out.append((start, pos + 1))
            start = pos + 1
            h = 0
    if start < len(data):
        out.append((start, len(data)))
    return out


def poly_boundaries(
    text: str,
    window: int = POLY_WINDOW,
    base: int = POLY_BASE,
    modulus: int = POLY_MODULUS,
) -> list[int]:
    """End positions (1-based, i.e. chunk-exclusive ends) where the
    windowed polynomial H(i) = Σ_{k=0..w-1} ord(text[i-w+k])·base^(w-1-k)
    is ≡ 0 mod ``modulus`` — each position independent of all others,
    the property the SQL replay rests on."""
    n = len(text)
    out = []
    pows = [base**k for k in range(window - 1, -1, -1)]
    for i in range(window, n + 1):
        h = sum(ord(text[i - window + k]) * pows[k] for k in range(window))
        if h % modulus == 0:
            out.append(i)
    return out


def poly_chunks(text: str, **kw) -> list[tuple[int, int]]:
    """Chunk [start, end) spans from the polynomial boundaries,
    covering ``text`` exactly; empty text → no chunks."""
    bs = poly_boundaries(text, **kw)
    starts = [0] + bs
    ends = bs + [len(text)]
    return [(s, e) for s, e in zip(starts, ends) if e > s]


#: output schema of cdc_chunk_rows — one row per chunk
CDC_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx int, chunk_len int, chunk_md5 string"
)


def cdc_chunk_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    arm: str = "poly",
) -> DataFrame:
    """One row per content-defined chunk (CDC_CHUNK_SCHEMA) — the
    input of chunk-level dedup.  ``arm='poly'`` (oracle twin) chunks
    the TEXT with the polynomial predicate; ``arm='gear'``
    (production twin) chunks the utf-8 BYTES with the clamped gear
    hash.  Hashes are md5 of the chunk's utf-8 bytes either way.
    Linear narrow map; chunk text never leaves the executor."""
    import pandas as pd

    if arm not in ("poly", "gear"):
        raise ValueError(f"cdc: unknown arm {arm!r}")

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = text if isinstance(text, str) else ""
                if arm == "poly":
                    spans = poly_chunks(s)
                    for ci, (a, b) in enumerate(spans):
                        ids.append(int(did))
                        idxs.append(ci)
                        lens.append(b - a)
                        hashes.append(
                            hashlib.md5(s[a:b].encode("utf-8")).hexdigest())
                else:
                    raw = s.encode("utf-8")
                    for ci, (a, b) in enumerate(gear_chunks(raw)):
                        ids.append(int(did))
                        idxs.append(ci)
                        lens.append(b - a)
                        hashes.append(hashlib.md5(raw[a:b]).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int32"),
                "chunk_len": pd.Series(lens, dtype="int32"),
                "chunk_md5": pd.Series(hashes, dtype="object"),
            })

    return docs.select(id_col, text_col).mapInPandas(
        _chunks, CDC_CHUNK_SCHEMA)


def cdc_dup_stats(chunks: DataFrame, docs_source: DataFrame) -> DataFrame:
    """Per-source chunk-dedup report: join chunk rows back to their
    source label and score how much of each source's chunk volume is
    duplicated ELSEWHERE in the corpus → ``(source, n_chunks,
    n_dup_chunks, dup_len, total_len)``.  A chunk counts as dup when
    its hash appears in more than one document corpus-wide.  Three
    hash shuffles (pinned by plan audit): the ownership count
    (map-side combined, its output partitioning reused as the join
    build side), the probe-side repartition of the chunk rows, and
    the source aggregate; the per-hash table carries counts, never
    text, and the doc→source attach is a broadcast."""
    from pyspark.sql import functions as F

    owners = chunks.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = chunks.join(owners, "chunk_md5").withColumn(
        "is_dup", F.col("n_docs") > 1
    )
    labeled = flagged.join(
        F.broadcast(docs_source.select("doc_id", "source")), "doc_id"
    )
    return labeled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_chunks"),
        F.sum(F.when(F.col("is_dup"), F.col("chunk_len")).otherwise(0))
        .alias("dup_len"),
        F.sum("chunk_len").alias("total_len"),
    )
