"""`tickfile` as a registered Spark data source (Python DataSource API,
Spark 4): ``spark.read.format("tickfile").load(path_or_glob)`` — the
connector-extension-point packaging of the tick-file format, so any
Spark consumer (SQL `CREATE TABLE ... USING tickfile`, other
languages' sessions via the registered name) can scan tick drops
without importing this package's Python helpers.

Contract matches sources/tickfile.py::read_tick_files' per-file
semantics (mirrors the reference parser, VolumeExpansion.jl:95-113):
split on ';', require exactly 5 fields, integer-parse fields 2-5,
silently drop empty/malformed lines; ``line_no`` numbers the PARSED
lines within each file (1-based) and ``file`` carries the source path
— the same (file, line_no) key the multi-file reader exposes.

When to use which: the DEFAULT path stays sources/tickfile.py (a
native JVM text scan + codegen'd split — UDF-free and faster); this
source trades that for the registration surface, and keeps scale
correctness: one InputPartition PER FILE, so a directory of tick
drops fans out across executors and each file streams through its
partition reader line-by-line (nothing is buffered whole)."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _TickFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TickFileDataSource(DataSource):
    """spark.dataSource.register(TickFileDataSource); then
    spark.read.format("tickfile").load(glob)."""

    @classmethod
    def name(cls) -> str:
        return "tickfile"

    def schema(self) -> str:
        return ("file string, line_no long, ts_str string, bid long, "
                "ask long, last long, volume long")

    def reader(self, schema) -> "TickFileReader":
        return TickFileReader(self.options)


class TickFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tickfile source requires a path: .load(<path or glob>)")

    def partitions(self):
        # one partition per file: a drop directory fans out per-file
        import glob as _glob
        import os

        paths = sorted(_glob.glob(self.path)) if any(
            c in self.path for c in "*?[") else [self.path]
        if os.path.isdir(self.path):
            paths = sorted(
                os.path.join(self.path, f) for f in os.listdir(self.path)
            )
        if not paths:
            raise FileNotFoundError(f"no tick files match {self.path}")
        return [_TickFilePartition(p) for p in paths]

    def read(self, partition):
        line_no = 0
        with open(partition.path, "r", errors="replace") as fh:
            for raw in fh:
                line = raw.strip()
                if not line:
                    continue
                parts = line.split(";")
                if len(parts) != 5:
                    continue
                try:
                    bid, ask, last, volume = (int(p.strip()) for p in parts[1:5])
                except ValueError:
                    continue
                line_no += 1
                yield (partition.path, line_no, parts[0].strip(),
                       bid, ask, last, volume)
