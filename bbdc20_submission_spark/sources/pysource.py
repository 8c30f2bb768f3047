"""Python Data Source API (Spark 4): a custom, pushdown-aware source.

Spark 4 lets a pure-Python class be a first-class `spark.read.format`
source — partition planning on the driver, per-partition generation on
executors, and (4.1) filter pushdown into the Python reader. This
module ships `synth_events`, a deterministic synthetic event generator
used for tests and benchmarks that need N rows of realistic shape with
NO files and NO driver-side materialization:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synth_events")
          .option("rows", 1_000_000).option("partitions", 64)
          .option("seed", 7).load())

Scale shape: `partitions()` plans `partitions` equal row slices, each
executor generates its slice independently from (seed, row index) via
a splitmix-style hash — no RNG state crosses workers, the same
(rows, seed) always yields the same table on any cluster layout, and
generation parallelism = the partition count. `pushFilters` consumes
supported predicates (event_type equality/IN, event_id range) so a
filtered read generates-and-drops inside the Python worker instead of
shipping unused Arrow batches; everything else is returned as residual
for Spark to apply.

Note the division of labor with the rest of `sources/`: real external
contracts (the reference's CSVs, parquet tables) stay on the NATIVE
JVM readers — a Python source is the tool for sources Spark has no
connector for, not a replacement for built-ins.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _mix(x: int) -> int:
    """splitmix64 finalizer — a deterministic int->int hash."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


@dataclass
class _Slice(InputPartition):
    start: int
    end: int
    seed: int


class SyntheticEventsDataSource(DataSource):
    """``synth_events``: deterministic partitioned event generator.

    Options: rows (default 1000), partitions (default 8), seed
    (default 7)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string,"
            " value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 7))
        # pushed-down predicate state (None = unconstrained)
        self.lo = 0
        self.hi = self.rows  # exclusive
        self.types: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if getattr(f, "attribute", None) == ("event_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            if getattr(f, "attribute", None) == ("event_type",):
                # conjunctive semantics: multiple consumed predicates
                # INTERSECT (overwriting would silently drop all but
                # the last one and return rows the query excluded)
                vals = None
                if isinstance(f, EqualTo):
                    vals = {f.value}
                elif isinstance(f, In):
                    vals = set(f.value)  # the In dataclass field is
                    # `value` (a tuple), not `values`
                if vals is not None:
                    self.types = (
                        vals if self.types is None else self.types & vals
                    )
                    continue
            yield f  # residual: Spark applies it after the read

    def partitions(self) -> list[_Slice]:
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        per = max(1, -(-total // self.n_parts)) if total else 1
        out = []
        s = lo
        while s < hi:
            out.append(_Slice(s, min(s + per, hi), self.seed))
            s += per
        return out or [_Slice(0, 0, self.seed)]

    def read(self, part: _Slice) -> Iterator[tuple]:
        types = self.types
        for i in range(part.start, part.end):
            h = _mix(i ^ (part.seed * 0x5DEECE66D))
            et = EVENT_TYPES[h % 5]
            if types is not None and et not in types:
                continue
            yield (
                i,
                (h >> 3) % 1000,
                et,
                round(((h >> 13) % 100_000) / 1000.0, 3),
            )
