"""Custom Spark 4 Python DataSource for the weather landing directory.

S1/S2 in SURVEY §2.1 are HTTP fetchers (dags/fetch_weather.py:30-54)
whose payloads land as JSON files; the engine's other ingest paths read
that directory with the built-in json source (sources/jsonsrc.py, batch)
and readStream (streaming/micro_batch.py). This module is the THIRD,
fully first-class shape: a registered ``spark.read.format(
"weatherlanding")`` connector built on the Spark 4 Python DataSource API
(pyspark.sql.datasource) — the idiomatic way to wrap a bespoke feed
(an API poller, a queue drainer, a vendored SDK) so that it plans like
any other source: one InputPartition per landed file (parallel scan,
locality-free), schema fixed to RAW_WEATHER (never inferred), and a
DataSourceStreamReader whose offset is the count of files in
lexicographic landing order — initialOffset/latestOffset/partitions/
commit give Structured Streaming exactly-once file pickup through its
own checkpointed offset log, with no extra bookkeeping here.

Scale notes (100 TB): partition planning is a driver-side listing
(cheap; a real deployment points this at an object-store prefix and the
listing IS the metadata op), per-file reads run on executors via the
Arrow batch bridge, and the fixed schema keeps the parse single-pass.
The Python DataSource is the right tool for CONNECTOR logic (auth,
pagination, offsets); heavy per-row transforms still belong downstream
in JVM expressions.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import ArrayType, StructType

from ..schemas import RAW_WEATHER


class _FilePartition(InputPartition):
    def __init__(self, path: str | None):
        self.path = path


def _landed_files(path: str) -> list[str]:
    """Lexicographically sorted landing files — the landing convention
    (batchNNN.json) makes name order == arrival order, so a count is a
    valid monotone stream offset."""
    return sorted(
        f
        for pat in ("*.json", "*.jsonl")
        for f in glob.glob(os.path.join(path, pat))
    )


def _to_tuple(obj, dtype):
    """Recursively convert a parsed-JSON value into the tuple shape the
    DataSource row serializer expects for ``dtype`` (None-safe at every
    level; unknown JSON keys are dropped — the explicit schema is the
    contract, exactly like the built-in json reader with a schema)."""
    if obj is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(
            _to_tuple(obj.get(f.name), f.dataType) for f in dtype.fields
        )
    if isinstance(dtype, ArrayType):
        return [_to_tuple(x, dtype.elementType) for x in obj]
    return obj


def _read_file(path: str | None, schema: StructType):
    if path is None:
        return
    with open(path) as fh:
        text = fh.read()
    stripped = text.lstrip()
    if stripped.startswith("["):
        docs = json.loads(stripped)
    else:
        docs = [
            json.loads(line) for line in text.splitlines() if line.strip()
        ]
    for doc in docs:
        yield _to_tuple(doc, schema)


class WeatherLandingReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("weatherlanding requires option('path', dir)")
        self._schema = schema

    def partitions(self):
        files = _landed_files(self._path)
        return [_FilePartition(f) for f in files] or [_FilePartition(None)]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path, self._schema)


class WeatherLandingStreamReader(DataSourceStreamReader):
    """Offset = number of landing files consumed, in lexicographic
    order. Spark checkpoints {start,end} offsets per micro-batch, so a
    restart replays exactly the uncommitted range — exactly-once pickup
    without any state of our own."""

    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("weatherlanding requires option('path', dir)")
        self._schema = schema

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": len(_landed_files(self._path))}

    def partitions(self, start, end):
        files = _landed_files(self._path)[start["pos"] : end["pos"]]
        return [_FilePartition(f) for f in files] or [_FilePartition(None)]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path, self._schema)

    def commit(self, end):
        pass


class WeatherLandingDataSource(DataSource):
    """``spark.dataSource.register(WeatherLandingDataSource)`` then
    ``spark.read.format("weatherlanding").option("path", dir).load()``
    (or ``spark.readStream...``)."""

    @classmethod
    def name(cls) -> str:
        return "weatherlanding"

    def schema(self):
        return RAW_WEATHER

    def reader(self, schema: StructType):
        return WeatherLandingReader(self.options, schema)

    def streamReader(self, schema: StructType):
        return WeatherLandingStreamReader(self.options, schema)
