"""Custom Python Data Source (Spark 4 DataSource API): Prometheus text
exposition files -> typed rows.

The reference's task 2 builds a *custom connector* — a FastAPI service
exporting metrics in exposition format for Prometheus to scrape
(fastapi/main.py:18-63). Our engine-side equivalent of 'write a custom
connector' is a first-class Spark data source plugin: register once,
then ``spark.read.format("exposition").load(path)`` anywhere — the
DataSource API is the plugin.path analog for sources the built-ins don't
cover (SURVEY.md §2.6 'Connect plugin API ≙ our extension API').

One InputPartition per file => reads parallelize across the cluster."""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

_LINE = re.compile(
    r"^(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)(?:\{(?P<labels>[^}]*)\})?\s+(?P<value>[-+0-9.eE]+)\s*$"
)

SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("labels", StringType()),
        StructField("value", DoubleType()),
        StructField("source_file", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class ExpositionReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("exposition source requires option 'path'")

    def partitions(self):
        paths = (
            sorted(glob.glob(os.path.join(self.path, "*")))
            if os.path.isdir(self.path)
            else sorted(glob.glob(self.path)) or [self.path]
        )
        return [_FilePartition(p) for p in paths if os.path.isfile(p)]

    def read(self, partition: _FilePartition):
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                m = _LINE.match(line)
                if m:
                    yield (
                        m.group("name"),
                        m.group("labels") or "",
                        float(m.group("value")),
                        os.path.basename(partition.path),
                    )


class ExpositionDataSource(DataSource):
    """Usage:
        spark.dataSource.register(ExpositionDataSource)
        spark.read.format("exposition").option("path", dir_or_glob).load()
    """

    @classmethod
    def name(cls) -> str:
        return "exposition"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return ExpositionReader(self.options)
