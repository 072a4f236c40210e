"""Content-defined chunking (operators/cdc.py): coverage invariants,
the shift-resistance property that motivates the family, clamp
behavior, and a DuckDB differential for the polynomial oracle arm."""

from __future__ import annotations

import hashlib

import pytest

from impala_cut_spark.operators.cdc import (
    GEAR,
    cdc_chunk_rows,
    cdc_dup_stats,
    gear_chunks,
    poly_boundaries,
    poly_chunks,
)


def _rand_bytes(n: int, seed: int) -> bytes:
    out = bytearray()
    state = seed.to_bytes(8, "big")
    while len(out) < n:
        state = hashlib.md5(state).digest()
        out += state
    return bytes(out[:n])


class TestGear:
    def test_gear_table_deterministic(self):
        assert len(GEAR) == 256
        assert GEAR[0] == int.from_bytes(
            hashlib.md5(b"gear-0").digest()[:8], "big")

    def test_partition_invariant(self):
        data = _rand_bytes(10_000, 7)
        spans = gear_chunks(data)
        assert spans[0][0] == 0 and spans[-1][1] == len(data)
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c and a < b

    def test_clamps(self):
        data = _rand_bytes(50_000, 9)
        for a, b in gear_chunks(data, min_size=32, max_size=128)[:-1]:
            assert 32 <= b - a <= 128
        # low-entropy input hits the max clamp exactly
        flat = bytes(10_000)
        sizes = {b - a for a, b in gear_chunks(flat, max_size=256)[:-1]}
        assert sizes <= {256}

    def test_shift_resistance(self):
        """The CDC motivation: prepending one byte must re-chunk only
        a bounded prefix — the chunk-hash multiset beyond it is
        preserved (a fixed-size chunker would lose everything)."""
        data = _rand_bytes(20_000, 11)
        shifted = b"X" + data
        h1 = [hashlib.md5(data[a:b]).hexdigest()
              for a, b in gear_chunks(data)]
        h2 = [hashlib.md5(shifted[a:b]).hexdigest()
              for a, b in gear_chunks(shifted)]
        common = len(set(h1) & set(h2))
        assert common >= len(h1) * 3 // 4

    def test_param_validation(self):
        with pytest.raises(ValueError, match="min_size"):
            gear_chunks(b"abc", min_size=0)
        with pytest.raises(ValueError, match="min_size"):
            gear_chunks(b"abc", min_size=8, max_size=4)
        assert gear_chunks(b"") == []


class TestPoly:
    def test_chunks_partition_text(self):
        text = "the quick brown fox " * 40
        spans = poly_chunks(text)
        assert "".join(text[a:b] for a, b in spans) == text
        assert all(b > a for a, b in spans)

    def test_boundaries_are_positional_predicates(self):
        """Each boundary depends only on its 4-char window — the
        property the SQL replay rests on: shifting the text by a
        prefix shifts every boundary by exactly the prefix length
        (where windows don't straddle the seam)."""
        text = "alpha beta gamma delta " * 20
        base = poly_boundaries(text)
        shifted = poly_boundaries("0123" + text)
        assert set(b + 4 for b in base if b >= 4) <= set(shifted)

    def test_short_and_empty(self):
        assert poly_chunks("") == []
        assert poly_chunks("ab") == [(0, 2)]

    def test_differential_vs_duckdb(self):
        """The exact oracle replay, run standalone: DuckDB recomputes
        the chunk md5s from the same polynomial predicate."""
        import duckdb

        texts = ["key agg row scan slow fast table value part hash " * 6,
                 "", "ab", "zebra " * 100]
        con = duckdb.connect()
        con.execute("CREATE TABLE tt (doc_id BIGINT, t VARCHAR)")
        for i, t in enumerate(texts):
            con.execute("INSERT INTO tt VALUES (?, ?)", [i, t])
        got = con.sql("""
            WITH pos AS (SELECT doc_id, t, CAST(unnest(range(4,
                             len(t) + 1)) AS INT) AS i FROM tt),
            hb AS (SELECT doc_id, i FROM pos
                   WHERE (ord(substr(t, i-3, 1)) * 29791
                        + ord(substr(t, i-2, 1)) * 961
                        + ord(substr(t, i-1, 1)) * 31
                        + ord(substr(t, i, 1))) % 64 = 0)
            SELECT doc_id, list_sort(list(i)) FROM hb GROUP BY doc_id
        """).fetchall()
        duck = {d: bs for d, bs in got}
        for i, t in enumerate(texts):
            assert poly_boundaries(t) == duck.get(i, [])


class TestOperators:
    def test_chunk_rows_both_arms(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma " * 30), (2, ""), (3, None)],
            "doc_id bigint, text string",
        )
        poly = cdc_chunk_rows(df, arm="poly").collect()
        assert all(r.doc_id == 1 for r in poly)  # empty/null → no rows
        assert sum(r.chunk_len for r in poly) == len("alpha beta gamma " * 30)
        gear = cdc_chunk_rows(df, arm="gear").collect()
        assert sum(r.chunk_len for r in gear) == len("alpha beta gamma " * 30)
        with pytest.raises(ValueError, match="unknown arm"):
            cdc_chunk_rows(df, arm="simd")

    def test_dup_stats(self, spark):
        shared = "commoncommoncommon " * 10
        df = spark.createDataFrame(
            [(1, shared + "tail one"), (2, shared + "other ending"),
             (3, "completely unrelated text here")],
            "doc_id bigint, text string",
        )
        src = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, source string"
        )
        chunks = cdc_chunk_rows(df, arm="poly")
        stats = {r.source: r for r in cdc_dup_stats(chunks, src).collect()}
        assert stats["a"].n_dup_chunks > 0          # shared prefix dedups
        assert stats["b"].n_dup_chunks == 0
        assert stats["a"].dup_len <= stats["a"].total_len


def test_hypothesis_partitions():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=4096), st.integers(1, 64), st.integers(0, 256))
    def check_gear(data, min_size, extra):
        spans = gear_chunks(data, min_size=min_size,
                            max_size=min_size + extra)
        assert b"".join(data[a:b] for a, b in spans) == data
        for a, b in spans[:-1]:
            assert b - a <= min_size + extra

    check_gear()

    @settings(max_examples=80, deadline=None)
    @given(st.text(max_size=2048))
    def check_poly(text):
        spans = poly_chunks(text)
        assert "".join(text[a:b] for a, b in spans) == text
        assert all(b > a for a, b in spans)

    check_poly()


def test_gear_twin_shares_plan_shape(spark):
    """The gear production arm must plan IDENTICALLY to the
    oracle-checked poly arm (same mapInPandas narrow map over the
    same scan) — so the poly twin's plan audit covers both (the
    xxhash-twin pattern from test_plans)."""
    import re

    from impala_cut_spark.plans import REGISTRY

    def shape(name):
        df = REGISTRY[name].spark(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return re.sub(r"#\d+", "#N", plan)

    assert shape("pipe_cdc_chunks") == shape("pipe_cdc_chunks_gear")
