"""Custom Python DataSource (Spark 4 DataSource API): the
reference's indexed-CSV point-chunk format (``pidx,dim0,dim1,...``;
reference ``Runner.load_points``, bfr.py:209-217) as a first-class
``spark.read.format("bfr_points")`` source.

Why a real DataSource and not just ``spark.read.csv``: the API is
the extension point for formats Spark has no built-in reader for —
it gives the format a NAME, a schema contract, and (the part that
matters at scale) explicit input partitioning: one
``InputPartition`` per chunk file, so a 10k-chunk dataset reads with
10k-way parallelism and per-chunk locality, exactly how the
reference's chunk loop is meant to distribute.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _chunk_files(path: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(path, "*.csv")))
    if not files and os.path.isfile(path):
        files = [path]
    if not files:
        raise FileNotFoundError(f"no point chunks under {path!r}")
    return files


class PointsDataSource(DataSource):
    """``spark.read.format("bfr_points").option("path", dir)``.

    Schema is probed from the first line of the first chunk on the
    driver (footer-free text format, so one line IS the metadata);
    each chunk file becomes one input partition, read lazily on an
    executor."""

    @classmethod
    def name(cls) -> str:
        return "bfr_points"

    def schema(self) -> str:
        first_file = _chunk_files(self.options.get("path"))[0]
        with open(first_file) as f:
            ndim = len(f.readline().rstrip("\n").split(",")) - 1
        dims = ", ".join(f"d{i} double" for i in range(ndim))
        return f"id bigint, {dims}"

    def reader(self, schema) -> "PointsReader":
        return PointsReader(_chunk_files(self.options.get("path")))


class PointsReader(DataSourceReader):
    def __init__(self, files: list[str]):
        self.files = files

    def partitions(self) -> list[InputPartition]:
        return [_ChunkPartition(p) for p in self.files]

    def read(self, partition: _ChunkPartition):
        # runs on an executor; yields plain tuples matching the schema
        with open(partition.path) as f:
            for line in f:
                parts = line.rstrip("\n").split(",")
                yield (int(parts[0]), *(float(x) for x in parts[1:]))


def register_points_source(spark) -> None:
    """Idempotently register the format with this session. Only the
    duplicate-registration error is swallowed — a genuine failure
    (API mismatch, bad class) propagates instead of resurfacing later
    as a confusing 'format bfr_points not found'."""
    try:
        spark.dataSource.register(PointsDataSource)
    except Exception as e:
        msg = str(e).lower()
        if "already" not in msg and "exist" not in msg:
            raise
