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
DataSourceStreamReader whose offset is the LAST-CONSUMED FILENAME in
lexicographic landing order (name-anchored, so late uploads or
deletions can never silently shift the committed range — they raise) —
initialOffset/latestOffset/partitions/commit give Structured Streaming
exactly-once file pickup through its own checkpointed offset log, with
no extra bookkeeping here.

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
    (batchNNN.json, zero-padded) makes name order == arrival order, so
    the last-consumed NAME is a valid monotone stream offset (and the
    stream reader raises loudly when the convention is broken)."""
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
    """Offset = the LAST-CONSUMED landing FILENAME (name-anchored).

    A bare file COUNT over a re-sorted listing (the earlier design) is
    not a safe offset: a late upload that sorts before an already-
    committed name, or a deletion, silently shifts every index — some
    files re-ingest, others are skipped forever, with no error. Anchoring
    to the name makes each batch "files strictly greater than the anchor,
    up to the horizon", which no insertion below the anchor or deletion
    can shift. Violations of the landing convention fail LOUDLY instead:

    - ``latestOffset`` raises if a file appears that sorts at-or-below
      the already-served horizon without having been listed before (a
      late/retried upload breaking name-order == arrival-order);
    - ``partitions`` raises if the committed range endpoint has
      disappeared from the directory (a replayed batch would otherwise
      silently lose rows).

    Spark checkpoints {start,end} offsets per micro-batch, so a restart
    replays exactly the uncommitted (start, end] name range —
    exactly-once pickup with no state of our own; the in-memory
    ``_seen`` set only powers the late-arrival guard and rebuilds
    harmlessly after a driver restart. Legacy ``{"pos": N}`` offsets
    from pre-name-anchor checkpoints are still understood (interpreted
    against the current listing, the old semantics) so existing
    checkpoints keep draining; new offsets are always name-anchored."""

    def __init__(self, options, schema: StructType):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("weatherlanding requires option('path', dir)")
        self._schema = schema
        self._horizon = ""  # max name ever served by latestOffset
        self._seen: set[str] = set()  # names listed at/below the horizon

    def initialOffset(self):
        return {"last": ""}  # empty string sorts before every filename

    def latestOffset(self):
        files = _landed_files(self._path)
        late = [f for f in files if f <= self._horizon and f not in self._seen]
        if late:
            raise ValueError(
                "weatherlanding: late-arriving file(s) sort at or below the "
                f"already-served offset {self._horizon!r}: {late} — the "
                "landing convention (name order == arrival order) is broken; "
                "re-land them under names greater than the current horizon"
            )
        if files and files[-1] > self._horizon:
            self._horizon = files[-1]
        self._seen.update(files)
        return {"last": self._horizon}

    @staticmethod
    def _anchor(offset, files: list[str]) -> tuple[str, bool]:
        """(anchor name, is_name_anchored). Legacy count offsets map to
        'name of the pos-th file in the CURRENT listing' — the old
        semantics, kept only so pre-change checkpoints keep working."""
        if "last" in offset:
            return offset["last"], True
        pos = int(offset.get("pos", 0))
        if pos <= 0 or not files:
            return "", False
        return files[min(pos, len(files)) - 1], False

    def partitions(self, start, end):
        files = _landed_files(self._path)
        fset = set(files)
        lo, _ = self._anchor(start, files)
        hi, hi_is_name = self._anchor(end, files)
        # every previously-listed name in the range must still exist, and
        # the committed range endpoint itself must exist (the endpoint
        # check also holds after a driver restart, when _seen is empty)
        gone = sorted(f for f in self._seen if lo < f <= hi and f not in fset)
        if hi_is_name and hi > lo and hi not in fset:
            gone = sorted(set(gone) | {hi})
        if gone:
            raise ValueError(
                f"weatherlanding: committed/listed file(s) {gone} have "
                f"disappeared from {self._path} — a replayed batch would "
                "silently lose rows; restore them or reset the checkpoint"
            )
        batch = [f for f in files if lo < f <= hi]
        return [_FilePartition(f) for f in batch] or [_FilePartition(None)]

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
