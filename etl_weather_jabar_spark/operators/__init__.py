from .projections import flatten_raw
from .filters import (
    eq_filter,
    in_filter,
    no_future_rows,
    null_reject,
    prefix_filter,
)
from .dedup import dedupe_keep_first, find_duplicate_groups
from .joins import anti_join_unprocessed, broadcast_lookup, grid_align
from .aggregates import daily_recap, deterministic_mode, hourly_agg
from .windows import keep_first_rank, stamp_group_flag

__all__ = [
    "flatten_raw",
    "eq_filter",
    "in_filter",
    "no_future_rows",
    "null_reject",
    "prefix_filter",
    "dedupe_keep_first",
    "find_duplicate_groups",
    "anti_join_unprocessed",
    "broadcast_lookup",
    "grid_align",
    "daily_recap",
    "deterministic_mode",
    "hourly_agg",
    "keep_first_rank",
    "stamp_group_flag",
]
