"""Pipeline compositions: the three reference DAGs as DataFrame stages.

SURVEY §3: fetch → transform → recap. The fetch DAG's HTTP side stays
outside the engine (sources/jsonsrc.py reads its landing dir); what the
engine owns is everything after: dedup, incremental selection, flatten,
keyed writes, recap assembly. Airflow's cross-DAG sensors (ST5) become plain
function composition — downstream stages read upstream's committed output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import daily_recap
from ..operators.dedup import dedupe_keep_first
from ..operators.filters import batch_key_filter
from ..operators.joins import anti_join_unprocessed
from ..operators.projections import flatten_raw


def transform_stage(
    raw: DataFrame,
    batch_end: str | None = None,
    processed: DataFrame | None = None,
) -> DataFrame:
    """The Silver transform DAG (dags/transform_raw_weather.py:104-124):

    1. dedup Bronze on (location.id, dag_times.end), keep-first by _id
       (A1-A3 — the reference runs this as a destructive maintenance pass;
       here it's just a transformation on the read path),
    2. incremental selection — EITHER the batch-key predicate (ST2) or an
       anti-join against already-processed ids (J2),
    3. flatten to the 17-column Silver row (P1, with P7 null-rejection).
    """
    deduped = dedupe_keep_first(
        raw, keys=["location.id", "dag_times.end"], order_by=["_id"]
    )
    if batch_end is not None:
        deduped = batch_key_filter(deduped, batch_end)
    if processed is not None:
        deduped = anti_join_unprocessed(deduped, processed, on="_id")
    return flatten_raw(deduped)


def recap_stage(silver: DataFrame, dates: list[str] | None = None) -> DataFrame:
    """The Gold recap DAG (dags/daily_compile_weather.py:96-142) as ONE
    distributed plan — replaces the reference's per-(date,location) query
    loop (SURVEY §4.2). Optional ``dates`` narrows to specific days
    (partition-prunable when Silver is partitioned by date)."""
    if dates:
        silver = silver.where(F.col("date").isin(dates))
    return daily_recap(silver)
