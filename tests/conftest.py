"""Shared fixtures: one SparkSession + one DuckDB oracle connection.

Mirrors the reference's e2e strategy (SURVEY.md §5: golden query tests
against a live oracle) with DuckDB standing in for the cluster oracle,
at sf0.001 for speed; the driver re-checks at sf0.01.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from impala_cut_spark.session import build_session

    # isolated warehouse: DDL/DML golden cases create managed tables;
    # a repo-local spark-warehouse would leak orphan dirs across
    # sessions (in-memory catalog forgets them → LOCATION_ALREADY_EXISTS)
    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = build_session(
        app_name="impala-cut-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()
