"""Output-size observability (SURVEY §2.7 F12).

The reference measures its Gold recap documents as raw JSON bytes + gzipped
bytes (run-once/debug_measure_size_json.py:25-33) to budget Mongo storage.
Engine equivalents:

* :func:`json_size_bytes` — pure Column (`to_json` + `length`), codegen'd.
* :func:`gzipped_size_bytes` — an Arrow-batched pandas UDF (gzip has no
  Column-level function); observability only, never in a query hot path.
  For actual storage budgeting prefer parquet's own column compression
  stats over per-row gzip.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def json_size_bytes(*cols: Column | str) -> Column:
    """Serialized-JSON byte length of a struct of ``cols`` (raw size of the
    row as a JSON document — the reference's pre-gzip number)."""
    return F.length(F.to_json(F.struct(*cols)))


@pandas_udf("bigint")
def _gzip_len(s: pd.Series) -> pd.Series:
    return s.map(lambda x: len(gzip.compress(x.encode("utf-8"), 6)) if x is not None else None)


def gzipped_size_bytes(*cols: Column | str) -> Column:
    """Gzipped byte length of the row's JSON form (compresslevel 6, the
    stdlib default the reference uses)."""
    return _gzip_len(F.to_json(F.struct(*cols)))
