"""Pluggable external data sources (SURVEY.md §2.1 DataSourceScanNode).

The reference scans external systems through a thrift RPC API —
``prepare(schema, predicates) / open / getNext(rows) / close``
(``/root/reference/common/thrift/ExternalDataSource.thrift:58-153``,
executed by ``be/src/exec/data-source-scan-node.cc``), with predicates
offered to the source at prepare time (accepted ones are not
re-evaluated by the engine).

Spark-native mapping: the Python DataSource API (Spark 4) —
``ExternalSource`` below is the same four-phase contract, and
``_ExternalReader.pushFilters`` is the prepare-time predicate offer:
filters the source accepts are pruned from Spark's own evaluation,
exactly the thrift ``prepared_rows``/accepted-conjuncts semantics.

Scale: ``partitions()`` lets the source shard itself (the analogue of
scan ranges); each partition's ``get_next`` iterator streams batches
from one executor task — no driver involvement, 1000-executor safe.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType


class ExternalSource(ABC):
    """The prepare/open/getNext/close contract of
    ExternalDataSource.thrift, one instance per scan partition."""

    @abstractmethod
    def schema(self) -> str:
        """DDL schema string, e.g. ``"id bigint, name string"``."""

    def prepare(self, filters: Sequence[Filter]) -> Sequence[Filter]:
        """Offered the scan conjuncts; return the subset this source
        fully applies itself (default: none — engine re-evaluates all)."""
        return []

    def num_partitions(self) -> int:
        """How many parallel scan ranges this source exposes."""
        return 1

    def open(self, partition: int) -> None:
        """Per-partition initialization (executor-side)."""

    @abstractmethod
    def get_next(self, partition: int) -> Iterator[tuple]:
        """Stream rows for one partition (executor-side)."""

    def close(self, partition: int) -> None:
        """Per-partition cleanup (executor-side)."""


class _ExternalReader(DataSourceReader):
    def __init__(self, source: ExternalSource):
        self.source = source

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        accepted = set(map(id, self.source.prepare(filters)))
        # yield the REJECTED filters back — Spark evaluates only those
        return iter(f for f in filters if id(f) not in accepted)

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.source.num_partitions())]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        self.source.open(i)
        try:
            yield from self.source.get_next(i)
        finally:
            self.source.close(i)


def make_datasource(name_: str, factory) -> type[DataSource]:
    """Wrap an ExternalSource factory as a registrable Spark DataSource.

    Usage::

        spark.dataSource.register(make_datasource("mysrc", MySource))
        df = spark.read.format("mysrc").load()
    """

    class _Wrapped(DataSource):
        def __init__(self, options):
            super().__init__(options)
            self._source: ExternalSource = factory(**dict(options))

        @classmethod
        def name(cls) -> str:
            return name_

        def schema(self) -> str | StructType:
            return self._source.schema()

        def reader(self, schema: StructType) -> DataSourceReader:
            return _ExternalReader(self._source)

    return _Wrapped


class RangeExternalSource(ExternalSource):
    """Demo source: integers [0, n) with squares — the test double the
    reference uses for its data-source tests
    (``fe/.../extdatasource/AllTypesDataSource``-style)."""

    def __init__(self, n: str | int = 1000, parts: str | int = 4, **_opts):
        self.n = int(n)
        self.parts = int(parts)
        self._accepted_filters: list[Filter] = []

    def schema(self) -> str:
        return "id bigint, square bigint"

    def prepare(self, filters: Sequence[Filter]) -> Sequence[Filter]:
        from pyspark.sql.datasource import GreaterThan

        # accept simple "id > x" pushdowns (the thrift API's
        # accepted_conjuncts demo case); everything else stays with Spark
        self._accepted_filters = [
            f
            for f in filters
            if isinstance(f, GreaterThan) and f.attribute == ("id",)
        ]
        return self._accepted_filters

    def num_partitions(self) -> int:
        return self.parts

    def get_next(self, partition: int) -> Iterator[tuple]:
        lo = partition * self.n // self.parts
        hi = (partition + 1) * self.n // self.parts
        bound = max((f.value for f in self._accepted_filters), default=-1)
        for i in range(lo, hi):
            if i > bound:
                yield (i, i * i)
