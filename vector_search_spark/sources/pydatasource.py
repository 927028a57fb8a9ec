"""Spark 4 Python DataSource API — a custom batch source implemented in
pure Python and registered like any format.

The reference reads its dimension catalogs through ad-hoc pandas/DB
glue (nl_targeting_save.py:46-61); the modern Spark-4 analog for a
source Spark has no built-in connector for is this API: implement
``DataSource``/``DataSourceReader``, register once, and every consumer
does ``spark.read.format(...)`` — partition planning included, so the
read parallelizes like a native scan. The concrete source here is a
deterministic synthetic-document generator (the fixture-independent
corpus a load test wants): content depends only on (partition, seq),
so any engine can reproduce it row-for-row — which is what lets the
gate row value-check a source that reads from NO file at all."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def synth_text(part: int, seq: int) -> str:
    """Deterministic 6-word document for (partition, seq) — pure integer
    arithmetic so SQL can reproduce it exactly."""
    return (
        f"alpha{part} beta{seq} gamma{(part * 7 + seq) % 13} "
        f"delta{(seq * 3) % 11} epsilon{(part + seq) % 5} zeta{seq % 2}"
    )


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows_per_partition", 100))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        p = partition.value
        for k in range(self.n):
            yield (p, k, synth_text(p, k))


class SynthDocsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "part bigint, seq bigint, text string"

    def reader(self, schema):
        return SynthDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsSource)
