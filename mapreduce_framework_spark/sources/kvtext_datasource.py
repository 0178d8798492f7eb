"""`key:value` text as a FIRST-CLASS Spark format via the Python
DataSource API (Spark 4).

The reference's only on-disk interchange format is the `key:value`
line sink its reducers write (workerimpl.cc:256-261,319-333) and its
chained jobs re-read (design.md:74).  `compat.read_kv_text` already
parses it with the JVM text reader + regexp — that remains the FAST
lane (whole-stage codegen, zero Python in the scan).  This module
makes the same format a registered source — ``spark.read.format
("kvtext").load(path)`` — through ``pyspark.sql.datasource``, the
extension point a Spark-native engine offers where the reference
hard-codes its format into the worker binary.

What the DataSource does that a manual parse cannot:

- **Partition planning**: one ``InputPartition`` per sink file, so a
  1000-file sink from a 1000-reducer job scans 1000-way parallel with
  per-file locality — the unit of parallelism IS the reference's
  reducer shard.
- **Filter pushdown** (``pushFilters``, Spark 4.1): ``EqualTo``/
  ``IsNotNull`` on ``key`` are accepted and applied INSIDE the reader
  while streaming lines, so a point lookup ships one key's rows to
  the JVM instead of the whole sink.  Every other filter is returned
  to Spark for post-scan evaluation (the contract: returned filters
  are evaluated twice-safe AND-terms).

Scale posture: rows cross Python→JVM Arrow-batched; per-file readers
never materialize a whole file (line-streamed).  For a scan-heavy
100 TB pipeline the JVM lane stays preferred — this source exists for
the extension-point parity and for sinks where pushdown beats raw
scan speed (selective key lookups over many shards).

Everything here is cloudpickle-shipped by value to Python workers;
imports stay inside methods for the same reason as
functions/tokenize.py.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

KV_SCHEMA = "key string, value long"


class KvTextPartition(InputPartition):
    """One reducer-shard file of the sink."""

    def __init__(self, path: str) -> None:
        self.path = path


class KvTextReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._root = options.get("path")
        if not self._root:
            raise ValueError("kvtext: .load(path) is required")
        self._eq_keys: list[str] | None = None  # None = no pushed filter

    def pushFilters(self, filters: list[Filter]):
        """Accept equality on `key` (the reference sink's natural point
        probe); IsNotNull(key) is free (parsed keys are never null).
        Everything else goes back to Spark.  Multiple EqualTo("key")
        terms AND to an impossible predicate — the reader then yields
        nothing, which is exactly the AND semantics."""
        from pyspark.sql.datasource import IsNotNull

        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                self._eq_keys = (self._eq_keys or []) + [f.value]
            elif isinstance(f, IsNotNull) and f.attribute == ("key",):
                pass  # guaranteed by the parse; nothing to evaluate
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> list[KvTextPartition]:
        import os

        files = sorted(
            os.path.join(self._root, f)
            for f in os.listdir(self._root)
            if not f.startswith((".", "_")) and not f.endswith(".crc")
        )
        # Zero-file sinks still need one (empty) partition: Spark
        # requires at least one.
        return [KvTextPartition(p) for p in files] or [KvTextPartition("")]

    def read(self, partition: KvTextPartition):
        if not partition.path:
            return
        want = set(self._eq_keys) if self._eq_keys is not None else None
        if want is not None and len(want) > 1:
            return  # key = a AND key = b: unsatisfiable
        with open(partition.path, encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.rstrip("\n")
                # Split on the LAST colon (compat.read_kv_text contract:
                # keys containing ':' survive the round-trip).
                key, sep, val = line.rpartition(":")
                if not sep:
                    continue
                if want is not None and key not in want:
                    continue
                try:
                    yield (key, int(val))
                except ValueError:
                    continue  # non-numeric tail: not a kv line


class KvTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str | StructType:
        return KV_SCHEMA

    def reader(self, schema: StructType) -> KvTextReader:
        return KvTextReader(self.options)


def register_kvtext(spark) -> None:
    """Idempotent registration: repeated calls replace the prior
    registration (registry-key functions may run many times in one
    session — bench min-of-3, sweeps).  Also enables Python-source
    filter pushdown: with ``pushFilters`` implemented, Spark REFUSES
    to plan a filtered scan while ``spark.sql.python.filterPushdown.
    enabled`` is false (fail-fast upstream guard), and the conf is
    read at plan time — i.e. at the driver's collect on our lazy
    frames — so it must be set-and-left, not set-and-restored."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KvTextDataSource)
