"""Snapshot-versioned parquet tables: atomic commits, snapshot-isolated
readers, time travel — the transactional layer the reference gets from
MongoDB's per-document atomicity (upsert `update_one($set)` else insert,
dags/daily_compile_weather.py:136-142) re-expressed for immutable files.

Layout::

    <table>/data/<commit>-partNNNN.parquet   immutable data files
    <table>/dv/<commit>-dvNNNN.parquet       deletion-vector sidecars
    <table>/_manifests/v{N:010d}.json        full file listing per version

A commit writes its data files first, then publishes a manifest naming
every LIVE file of the new version. Readers resolve ONE manifest and read
exactly those files — a reader holding version N is untouched by any
later commit (snapshot isolation), and `version=` gives time travel.
Publication is `open(path, "x")` — atomic on POSIX; a concurrent writer
that loses the race re-resolves and retries against the next version
(optimistic concurrency, single winner per version).

Scale notes: the manifest is O(live files) JSON — fine into the tens of
thousands of files; production formats (Delta/Iceberg) switch to delta
logs + checkpoints for millions, same read protocol. Data files are never
mutated or renamed after publish, so object stores without atomic rename
need only the tiny manifest PUT-if-absent. Orphan data files from a lost
race are invisible (no manifest names them) and reclaimable by a GC pass
(`vacuum`).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame


class ConcurrentSnapshotError(RuntimeError):
    """A conflicting commit landed and the operation cannot merge with it
    safely (the Delta ConcurrentModificationException analogue)."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _meta_path(path: str) -> str:
    return os.path.join(path, "_meta.json")


def _read_meta(path: str) -> dict:
    """Vacuum-survivor sidecar: ``vacuum_horizon`` (lowest retained
    version), ``batch_ids`` (dedup ledger folded out of vacuumed
    manifests), ``history`` (their history rows). Absent before the
    first vacuum."""
    try:
        with open(_meta_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"vacuum_horizon": 1, "batch_ids": [], "history": []}


def _write_meta(path: str, meta: dict) -> None:
    tmp = _meta_path(path) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(path))  # atomic on POSIX


def _versions(path: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(_manifest_dir(path), "v*.json"))
    )


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version:010d}.json")) as f:
        return json.load(f)


def _write_data_files(df: DataFrame, path: str) -> tuple[list[str], dict]:
    """Write ``df`` into immutable data files; returns (names, per-file
    row counts). Files exist but are invisible until a manifest names
    them. Row counts come from the parquet footers (no data scan) and
    feed the manifest, making COUNT(*) a metadata-only operation."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    commit = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f"_staging-{commit}")
    df.write.mode("overwrite").parquet(staging)
    new_files, row_counts = [], {}
    for i, part in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
        name = f"{commit}-part{i:04d}.parquet"
        target = os.path.join(data_dir, name)
        os.rename(part, target)
        new_files.append(name)
        row_counts[name] = pq.ParquetFile(target).metadata.num_rows
    shutil.rmtree(staging)
    return new_files, row_counts


def _write_dv_files(df: DataFrame, path: str) -> list[str]:
    """Write a deletion-vector set — (file string, pos bigint) rows — as
    immutable parquet under ``<table>/dv/``; returns the names. Like data
    files, DV files are invisible until a manifest's ``dvs`` list names
    them. The set is coalesced to one file: DVs are small by contract
    (row-level deletes); a production format shards one bitmap per data
    file, same protocol."""
    dv_dir = os.path.join(path, "dv")
    os.makedirs(dv_dir, exist_ok=True)
    commit = uuid.uuid4().hex[:12]
    staging = os.path.join(path, f"_dvstaging-{commit}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    names = []
    for i, part in enumerate(
        sorted(glob.glob(os.path.join(staging, "*.parquet")))
    ):
        name = f"{commit}-dv{i:04d}.parquet"
        os.rename(part, os.path.join(dv_dir, name))
        names.append(name)
    shutil.rmtree(staging)
    return names


def _read_dv_set(spark, path: str, dv_names: list[str]) -> DataFrame:
    return spark.read.parquet(
        *[os.path.join(path, "dv", d) for d in dv_names]
    )


def _dv_apply_read(
    spark,
    path: str,
    m: dict,
    files: list[str],
    merge_schema: bool = False,
) -> DataFrame:
    """Read the given manifest files with the manifest's deletion vectors
    applied. Files with no recorded deletions take the plain scan path
    untouched; dirty files are read with ``_metadata`` row positions and
    anti-joined against the (broadcast) DV set — the scan stays
    shuffle-free because the DV side is small by contract."""
    from pyspark.sql import functions as F

    dv_counts = m.get("dv_counts", {})
    dirty = [f for f in files if dv_counts.get(f)]
    clean = [f for f in files if not dv_counts.get(f)]
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    parts = []
    if clean:
        parts.append(
            reader.parquet(*[os.path.join(path, "data", f) for f in clean])
        )
    if dirty:
        df = reader.parquet(
            *[os.path.join(path, "data", f) for f in dirty]
        )
        cols = df.columns
        dv = _read_dv_set(spark, path, m["dvs"]).select(
            F.col("file").alias("__dv_file"), F.col("pos").alias("__dv_pos")
        )
        parts.append(
            df.select(
                F.col("_metadata.file_name").alias("__dv_file"),
                F.col("_metadata.row_index").alias("__dv_pos"),
                "*",
            )
            .join(F.broadcast(dv), ["__dv_file", "__dv_pos"], "left_anti")
            .select(*cols)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=merge_schema)
    return out


def _stats_encode(v):
    """JSON-safe canonical encoding for manifest stats values. Temporal /
    decimal / binary min-max values are tagged single-key dicts (a scalar
    column value can never be a dict, so tags cannot collide with data);
    everything else passes through. Idempotent: encoded values re-encode
    to themselves, so carried-forward stats survive repeated publishes."""
    import base64
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__date__": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"__dec__": str(v)}
    if isinstance(v, (bytes, bytearray)):
        return {"__b64__": base64.b64encode(bytes(v)).decode()}
    return v


def _stats_decode(v):
    """Inverse of :func:`_stats_encode` — applied at every pruning-side
    comparison so manifest stats compare against live values with the
    original types (ISO strings are NOT compared to date objects)."""
    import base64
    import datetime
    import decimal

    if isinstance(v, dict):
        if "__ts__" in v:
            return datetime.datetime.fromisoformat(v["__ts__"])
        if "__date__" in v:
            return datetime.date.fromisoformat(v["__date__"])
        if "__dec__" in v:
            return decimal.Decimal(v["__dec__"])
        if "__b64__" in v:
            return base64.b64decode(v["__b64__"])
    return v


def _file_stats(spark, path: str, files: list[str], cols: list[str]) -> dict:
    """Per-file min/max of ``cols`` — one column-pruned scan of just the
    named files: ``{file: {col: [lo, hi]}}`` (the manifest-side analogue
    of parquet footer stats, queryable without opening footers). Values
    are stored through :func:`_stats_encode`, so temporal/decimal/binary
    keys are JSON-safe — the encode failure used to surface as a
    json.dump TypeError AFTER data files were written (orphaning them)."""
    from pyspark.sql import functions as F

    if not files:
        return {}
    df = spark.read.parquet(*[os.path.join(path, "data", f) for f in files])
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    rows = (
        df.groupBy(F.col("_metadata.file_name").alias("f")).agg(*aggs).collect()
    )
    return {
        r["f"]: {
            c: [_stats_encode(r[f"lo_{c}"]), _stats_encode(r[f"hi_{c}"])]
            for c in cols
        }
        for r in rows
    }


_BLOOM_K, _BLOOM_M = 3, 1020


def _file_blooms(
    spark,
    path: str,
    files: list[str],
    cols: list[str],
    m_bits: int = _BLOOM_M,
) -> dict:
    """Per-file Bloom lanes for ``cols`` — ``{file: {col: {"m": m_bits,
    "lanes": {lane: bits}}}}`` (60-bit bigint lanes, the certified
    ext/heavy_hitters layout with the md5 hash family). One
    column-pruned scan of the named files; the aggregate output is
    O(files × lanes) rows, driver-safe at manifest scale. Values are
    hashed through their CAST(… AS STRING) form so the driver-side
    probe (:func:`snapshot_lookup_files`) reproduces positions exactly;
    NULLs are not members (a NULL probe key is unsupported).

    Size ``m_bits`` ≈ 10 bits per distinct key per file (the parquet
    bloom rule of thumb) — an undersized filter saturates and degrades
    to "no pruning", never to wrong answers. Manifest-inline lanes are
    the small-table form; at very large file counts a production format
    moves the bitmap into per-file sidecars (parquet stores it in the
    footer), same probe protocol."""
    from functools import reduce

    from pyspark.sql import functions as F

    from .ext.heavy_hitters import _bloom_pos

    if not files or not cols:
        return {}
    df = spark.read.parquet(
        *[os.path.join(path, "data", f) for f in files]
    ).select(
        F.col("_metadata.file_name").alias("f"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    out: dict = {}
    for c in cols:
        positions = reduce(
            lambda a, b: a.unionByName(b),
            [
                df.select("f", _bloom_pos(F.col(c), i, m_bits).alias("p"))
                for i in range(_BLOOM_K)
            ],
        ).where(F.col("p").isNotNull())
        rows = (
            positions.groupBy("f", F.expr("p div 60").alias("lane"))
            .agg(
                F.expr(
                    "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT)))"
                ).alias("bits")
            )
            .collect()
        )
        for r in rows:
            out.setdefault(r["f"], {}).setdefault(
                c, {"m": m_bits, "lanes": {}}
            )["lanes"][str(r["lane"])] = r["bits"]
    return out


def _bloom_may_contain(entry: dict, value) -> bool:
    """Driver-side probe of one per-file Bloom: all k bit positions of
    ``str(value)`` must be set. Bit positions replicate
    ext/heavy_hitters._bloom_pos's md5 formula exactly. ``entry`` is
    the ``{"m": …, "lanes": …}`` manifest record (a bare lane dict from
    a pre-sizing manifest reads as m = 1020)."""
    import hashlib

    if "m" in entry and "lanes" in entry:
        m_bits, lanes = int(entry["m"]), entry["lanes"]
    else:  # legacy manifests: bare lane dict at the default size
        m_bits, lanes = _BLOOM_M, entry
    for i in range(_BLOOM_K):
        p = (
            int(
                hashlib.md5(
                    (str(value) + f":bloom{i}").encode()
                ).hexdigest()[:8],
                16,
            )
            % m_bits
        )
        if not (int(lanes.get(str(p // 60), 0)) >> (p % 60)) & 1:
            return False
    return True


def snapshot_lookup_files(
    path: str, col: str, values, version: int | None = None
) -> list[str]:
    """The files of a version that MAY contain any of ``values`` in
    ``col``, per the manifest's per-file Blooms (``snapshot_write(
    bloom_cols=...)``) — pure metadata, no Spark session. Files without
    a recorded Bloom for ``col`` are returned conservatively. No false
    negatives (Bloom guarantee); a point lookup of an absent key prunes
    to zero files with probability (1 − fp_rate)^files."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    blooms = m.get("blooms", {})

    def may(f: str) -> bool:
        entry = blooms.get(f, {}).get(col)
        if entry is None:
            return True
        return any(_bloom_may_contain(entry, x) for x in values)

    return [f for f in m["files"] if may(f)]


def snapshot_lookup(
    spark, path: str, col: str, values, version: int | None = None
) -> DataFrame:
    """Point/IN-list lookup with Bloom file skipping: open ONLY the
    files whose per-file Bloom admits at least one probe value, then
    apply the exact ``col IN values`` predicate (and any deletion
    vectors). Min/max stats (:func:`snapshot_scan`) prune RANGE
    predicates on clustered columns; the Bloom prunes POINT lookups on
    columns no layout clusters — the Delta/Iceberg bloom-filter-index
    analogue. Same rows as ``snapshot_read(...).where(col.isin(values))``
    by construction (no false negatives). 100 TB: pruning is a
    driver-side manifest walk (k md5s per file × value); the read
    touches the surviving files only."""
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    picked = snapshot_lookup_files(path, col, values, version=v)
    if not picked:
        return snapshot_read(spark, path, version=v).where(F.lit(False))
    if m.get("dvs"):
        df = _dv_apply_read(spark, path, m, picked)
    else:
        df = spark.read.parquet(
            *[os.path.join(path, "data", f) for f in picked]
        )
    return df.where(F.col(col).isin(list(values)))


def _publish(path: str, build) -> int:
    """Atomically publish the next version. ``build(latest_manifest)``
    returns ``(files, op, meta, stats)`` and is re-invoked on a lost
    create-if-absent race, so an append that loses includes the winner's
    files on retry (no lost update)."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    while True:
        vs = _versions(path)
        latest = _read_manifest(path, vs[-1]) if vs else None
        files, op, meta, stats, row_counts = build(latest)
        # resume numbering past the vacuum horizon: a vacuum that dropped
        # every manifest must not make the next commit reuse version 1
        # (folded history is keyed by version number)
        base_v = vs[-1] if vs else _read_meta(path)["vacuum_horizon"] - 1
        version = base_v + 1
        manifest = {
            "version": version,
            "op": op,
            "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
            "files": files,
            "stats": stats,
            "row_counts": row_counts,
            **(meta or {}),
        }
        target = os.path.join(_manifest_dir(path), f"v{version:010d}.json")
        # write the FULL manifest to a temp file first, then hard-link it
        # into place: link() is create-if-absent AND the linked file is
        # complete, so a concurrent reader can never see torn JSON (the
        # bare open("x") + dump had that window)
        tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, target)
            return version
        except FileExistsError:
            continue  # lost the race: re-resolve latest and retry
        finally:
            os.unlink(tmp)


def snapshot_add_constraint(path: str, name: str, expr: str) -> None:
    """Register a table-level CHECK constraint (Delta ``ALTER TABLE ADD
    CONSTRAINT`` semantics): every subsequent :func:`snapshot_write`
    validates its batch against ``expr`` BEFORE any data file is
    written and refuses the commit on violation. SQL three-valued
    semantics: a row violates only when the expression evaluates FALSE
    — NULL passes, as in the standard. Constraints live in the
    ``_meta.json`` sidecar, so they survive vacuum like the batch-id
    ledger. Existing data is NOT retro-checked (same as Delta, which
    requires the table to already satisfy a new constraint — run
    ``ext/profiling.check_constraints`` for the audit)."""
    meta = _read_meta(path)
    cons = dict(meta.get("constraints", {}))
    cons[name] = expr
    meta["constraints"] = cons
    os.makedirs(path, exist_ok=True)
    _write_meta(path, meta)


def snapshot_drop_constraint(path: str, name: str) -> None:
    """Remove a CHECK constraint registered by
    :func:`snapshot_add_constraint`; unknown names raise KeyError."""
    meta = _read_meta(path)
    cons = dict(meta.get("constraints", {}))
    del cons[name]
    meta["constraints"] = cons
    _write_meta(path, meta)


def _enforce_constraints(df: DataFrame, checks: dict) -> None:
    """One aggregate pass counting FALSE rows per constraint; raises
    ValueError naming every violated constraint with its row count.
    Runs BEFORE data files are written — a refused batch leaves no
    orphans and no version."""
    from pyspark.sql import functions as F

    if not checks:
        return
    aggs = [
        F.sum(
            F.when(F.expr(e) == False, 1).otherwise(0)  # noqa: E712
        ).alias(n)
        for n, e in checks.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {n: row[n] for n in checks if row[n]}
    if bad:
        detail = ", ".join(
            f"{n} ({bad[n]} rows): {checks[n]}" for n in sorted(bad)
        )
        raise ValueError(f"CHECK constraint violated — {detail}")


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "append",
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = _BLOOM_M,
    check: str | None = None,
) -> int:
    """Commit ``df`` to the versioned table at ``path``; returns the new
    version. ``mode="append"`` keeps prior files live, ``"overwrite"``
    starts the listing fresh (old versions stay readable — overwrite is
    logical, not physical). Retries the manifest publish on a lost race.
    ``meta`` keys are recorded in the manifest (e.g. the streaming sink's
    ``batch_id``); ``stats_cols`` records per-file min/max for those
    columns, which :func:`snapshot_merge` uses for copy-on-write file
    pruning (carried-forward files keep their recorded stats);
    ``bloom_cols`` records per-file Bloom lanes for point-lookup file
    skipping (:func:`snapshot_lookup`). ``check`` is an ad-hoc CHECK
    expression for this batch; table-level constraints registered via
    :func:`snapshot_add_constraint` are always enforced (both BEFORE
    any file is written — a refused batch leaves nothing behind).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode: {mode}")
    checks = dict(_read_meta(path).get("constraints", {}))
    if check is not None:
        checks["<batch check>"] = check
    _enforce_constraints(df, checks)
    new_files, counts = _write_data_files(df, path)
    stats = (
        _file_stats(df.sparkSession, path, new_files, stats_cols)
        if stats_cols
        else {}
    )
    blooms = (
        _file_blooms(
            df.sparkSession, path, new_files, bloom_cols, m_bits=bloom_bits
        )
        if bloom_cols
        else {}
    )

    def build(latest):
        if latest and mode == "append":
            base = latest["files"]
            base_stats = latest.get("stats", {})
            base_counts = latest.get("row_counts", {})
        else:
            base, base_stats, base_counts = [], {}, {}
        # an append must carry the base version's deletion vectors, or
        # DV-deleted rows would silently resurrect on the next commit
        meta2 = dict(meta or {})
        if latest and mode == "append" and latest.get("dvs"):
            meta2.setdefault("dvs", latest["dvs"])
            meta2.setdefault("dv_counts", latest.get("dv_counts", {}))
        # per-file Blooms ride the same carry rule as stats
        base_blooms = (
            latest.get("blooms", {}) if latest and mode == "append" else {}
        )
        all_blooms = {
            **{f: b for f, b in base_blooms.items() if f in base},
            **blooms,
        }
        if all_blooms:
            meta2["blooms"] = all_blooms
        return (
            base + new_files,
            mode,
            meta2 or None,
            {**{f: s for f, s in base_stats.items() if f in base}, **stats},
            {**{f: n for f, n in base_counts.items() if f in base}, **counts},
        )

    return _publish(path, build)


def snapshot_read(
    spark,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The table as of ``version`` (default: latest). The returned plan
    names the snapshot's exact files, so later commits cannot change what
    this DataFrame reads. ``merge_schema=True`` unions the schemas of all
    the version's files (schema EVOLUTION: files appended before a column
    existed read it as NULL — the Delta/Iceberg add-column semantics);
    the default reads with the first file's schema, which is cheaper and
    right for schema-stable tables."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    m = _read_manifest(path, v)
    files = m["files"]
    if not files:
        raise FileNotFoundError(f"version {v} is empty")
    if m.get("dvs"):
        return _dv_apply_read(spark, path, m, files, merge_schema)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(
        *[os.path.join(path, "data", f) for f in files]
    )


def _history_row(m: dict) -> dict:
    return {
        "version": m["version"],
        "op": m["op"],
        "ts": m["ts"],
        "n_files": len(m["files"]),
    }


def snapshot_history(path: str) -> list[dict]:
    """All committed versions, oldest first: version, op, ts, n_files.
    Vacuumed versions survive as summary rows folded into ``_meta.json``
    (their manifests are gone, so they are no longer time-travelable —
    the history record is what remains)."""
    out = list(_read_meta(path)["history"])
    for v in _versions(path):
        out.append(_history_row(_read_manifest(path, v)))
    return out


def vacuum(
    path: str, keep_versions: int = 1, min_age_seconds: float = 3600.0
) -> list[str]:
    """GC: drop manifests older than the newest ``keep_versions`` and
    delete data files no retained manifest references (orphans from lost
    commit races are collected too). Returns the deleted file names.
    Readers of vacuumed versions break — same contract as Delta VACUUM.

    ``min_age_seconds`` guards the commit race: a concurrent writer's
    data files exist BEFORE its manifest publishes, so an unreferenced
    file younger than the grace window is an in-flight commit, not an
    orphan, and is left alone (Delta VACUUM's retention check, applied
    to unreferenced files). Pass 0 only when no writer can be active."""
    vs = _versions(path)
    keep = vs[-keep_versions:] if keep_versions > 0 else []
    live: set[str] = set()
    live_dvs: set[str] = set()
    for v in keep:
        m = _read_manifest(path, v)
        live.update(m["files"])
        live_dvs.update(m.get("dvs", []))
    deleted = []
    now = time.time()
    for f in glob.glob(os.path.join(path, "data", "*.parquet")):
        if os.path.basename(f) in live:
            continue
        if now - os.path.getmtime(f) < min_age_seconds:
            continue  # young unreferenced file = likely in-flight commit
        os.remove(f)
        deleted.append(os.path.basename(f))
    # deletion-vector sidecars GC by the same rule (a delete commit's
    # consolidation de-references its predecessors' DV files)
    for f in glob.glob(os.path.join(path, "dv", "*.parquet")):
        if os.path.basename(f) in live_dvs:
            continue
        if now - os.path.getmtime(f) < min_age_seconds:
            continue
        os.remove(f)
        deleted.append(os.path.basename(f))
    dropped = [v for v in vs if v not in keep]
    if dropped:
        # Fold the to-be-deleted manifests' durable state (streaming dedup
        # batch ids + history rows + the new retention horizon) into the
        # _meta.json sidecar BEFORE removing them — vacuum must never erase
        # the exactly-once ledger (a stream restarted from an old checkpoint
        # would otherwise double-append a vacuumed-away batch), and fsck
        # validates the retained suffix against the recorded horizon. The
        # write is atomic (tmp + rename); a crash between meta write and
        # manifest removal only leaves duplicate ids/history rows, which
        # the set-union / version-keyed merge absorbs on the next vacuum.
        meta = _read_meta(path)
        ids = set(meta["batch_ids"])
        hist = {h["version"]: h for h in meta["history"]}
        for v in dropped:
            m = _read_manifest(path, v)
            if m.get("batch_id") is not None:
                ids.add(int(m["batch_id"]))
            hist[v] = _history_row(m)
        horizon = min(keep) if keep else (vs[-1] + 1 if vs else 1)
        _write_meta(
            path,
            {
                **meta,  # preserve constraints and any future sidecar keys
                "vacuum_horizon": max(meta["vacuum_horizon"], horizon),
                "batch_ids": sorted(ids),
                "history": [hist[v] for v in sorted(hist)],
            },
        )
    for v in dropped:
        os.remove(os.path.join(_manifest_dir(path), f"v{v:010d}.json"))
    return sorted(deleted)


def snapshot_merge(
    spark,
    path: str,
    changes: DataFrame,
    keys: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    max_retries: int = 10,
) -> int:
    """MERGE INTO for the versioned table: apply a keyed upsert/delete log
    (:func:`operators.diff.apply_cdc` semantics — highest ``seq`` per key
    wins, 'D' deletes, later 'U' resurrects) onto the latest snapshot and
    commit the result as one atomic overwrite version. Readers see either
    the pre-merge or post-merge table, never a mix; the pre-merge version
    stays time-travelable. Copy-on-write at table granularity — the
    honest minimal form; per-file copy-on-write needs file↔key pruning
    stats (the Delta/Iceberg refinement, same commit protocol).

    Concurrency: the merged result is only valid against the exact base
    version it was read from, so a commit landing in between RESTARTS
    the merge from the new latest (same contract as
    :func:`snapshot_merge_pruned`) — publishing the stale result would
    silently drop the racer's rows. ``max_retries`` conflicts →
    :class:`ConcurrentSnapshotError`."""
    from .operators.diff import apply_cdc

    for _ in range(max_retries):
        vs = _versions(path)
        base_version = vs[-1] if vs else None
        if base_version is None:
            # MERGE into a not-yet-created table: base is empty with the
            # change log's row schema (Delta's create-on-first-merge shape)
            base = changes.drop(seq_col, op_col).limit(0)
        else:
            base = snapshot_read(spark, path, version=base_version)
        merged = apply_cdc(
            base, changes, keys, seq_col=seq_col, op_col=op_col
        ).drop(seq_col)
        new_files, counts = _write_data_files(merged, path)

        class _Conflict(Exception):
            pass

        def build(latest_m):
            latest_v = latest_m.get("version") if latest_m else None
            if latest_v != base_version:
                raise _Conflict  # someone committed since the base read
            return (new_files, "overwrite", None, {}, counts)

        try:
            return _publish(path, build)
        except _Conflict:
            continue  # restart from the new latest version
    raise ConcurrentSnapshotError(
        f"merge at {path} lost {max_retries} publish races; giving up"
    )


def snapshot_merge_pruned(
    spark,
    path: str,
    changes: DataFrame,
    key: str,
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    max_change_keys: int = 100_000,
    max_retries: int = 10,
) -> int:
    """Per-FILE copy-on-write MERGE: using the manifest's recorded
    min/max stats for ``key`` (``snapshot_write(stats_cols=[key])``),
    only files whose key range can contain a changed key are rewritten;
    every other file is carried forward BY NAME — at 100 TB with a
    clustered key this turns a full-table rewrite into touching a few
    files, which is the entire point of Delta/Iceberg MERGE.

    The changed-key set is collected when ≤ ``max_change_keys`` (exact
    per-file membership against the [lo, hi] ranges — range overlap
    alone would touch every file between min and max changed key);
    larger change sets, or files with no recorded stats, degrade
    conservatively to "touched". Same apply_cdc semantics as
    :func:`snapshot_merge`; inserts of unseen keys land in the rewritten
    file set. One atomic 'merge' commit; pre-merge version time-travels.

    Concurrency: the hot/cold split is only valid against the exact
    version it was computed from, so a conflicting commit (the latest
    manifest moved while this merge was writing) RESTARTS the whole
    merge from the new latest version — re-split, re-read, re-apply.
    Patching the carried-file list in the publish retry (the previous
    behavior) silently dropped a racing append's files and any rows the
    racer rewrote into new cold files: a lost update. The abandoned
    attempt's data files are unreferenced and reclaimed by
    :func:`vacuum`. After ``max_retries`` conflicts raises
    :class:`ConcurrentSnapshotError` rather than live-locking.
    """
    import bisect

    from .operators.diff import apply_cdc

    for _ in range(max_retries):
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no snapshots at {path}")
        base_version = vs[-1]
        latest = _read_manifest(path, base_version)
        files, stats = latest["files"], latest.get("stats", {})
        counts = latest.get("row_counts", {})

        n_keys = changes.select(key).distinct().count()
        if n_keys > max_change_keys:
            return snapshot_merge(
                spark, path, changes, [key], seq_col=seq_col, op_col=op_col
            )
        ckeys = sorted(
            r[key] for r in changes.select(key).distinct().collect()
        )

        def touched(f: str) -> bool:
            s = stats.get(f, {}).get(key)
            if s is None or s[0] is None:
                return True  # no stats recorded -> conservative rewrite
            lo, hi = _stats_decode(s[0]), _stats_decode(s[1])
            i = bisect.bisect_left(ckeys, lo)
            return i < len(ckeys) and ckeys[i] <= hi

        hot = [f for f in files if touched(f)]
        cold = [f for f in files if f not in set(hot)]
        if hot:
            # apply any deletion vectors on the hot side — the rewrite
            # materializes them; cold files keep theirs (carried below)
            if latest.get("dvs"):
                hot_df = _dv_apply_read(spark, path, latest, hot)
            else:
                hot_df = spark.read.parquet(
                    *[os.path.join(path, "data", f) for f in hot]
                )
        else:
            hot_df = snapshot_read(spark, path, version=base_version).limit(0)
        merged = apply_cdc(
            hot_df, changes, [key], seq_col=seq_col, op_col=op_col
        ).drop(seq_col)
        new_files, new_counts = _write_data_files(merged, path)
        new_stats = _file_stats(spark, path, new_files, [key])

        class _Conflict(Exception):
            pass

        def build(latest_m):
            if latest_m is None or latest_m.get("version") != base_version:
                raise _Conflict  # someone committed since the split
            # carry DV state for the cold files only (hot rewrites just
            # materialized theirs); no dirty cold files -> DV-free version
            cold_dv = {
                f: c
                for f, c in latest.get("dv_counts", {}).items()
                if f in set(cold)
            }
            dv_meta = (
                {"dvs": latest["dvs"], "dv_counts": cold_dv}
                if cold_dv
                else {}
            )
            cold_blooms = {
                f: b
                for f, b in latest.get("blooms", {}).items()
                if f in set(cold)
            }
            if cold_blooms:
                dv_meta["blooms"] = cold_blooms
            dv_meta = dv_meta or None
            return (
                cold + new_files,
                "merge",
                dv_meta,
                {**{f: s for f, s in stats.items() if f in set(cold)},
                 **new_stats},
                {**{f: n for f, n in counts.items() if f in set(cold)},
                 **new_counts},
            )

        try:
            return _publish(path, build)
        except _Conflict:
            continue  # restart the whole merge from the new latest
    raise ConcurrentSnapshotError(
        f"merge at {path} lost {max_retries} publish races; giving up"
    )


def snapshot_delete_dv(
    spark,
    path: str,
    predicate=None,
    *,
    keys: DataFrame | None = None,
    key_col: str | None = None,
    max_retries: int = 10,
) -> int:
    """Row-level DELETE via deletion vectors — the Delta Lake
    merge-on-read delete: instead of rewriting every data file touched
    by the predicate (copy-on-write, O(touched gigabytes) for a
    ten-row GDPR delete), record the deleted ROW POSITIONS in a small
    parquet sidecar and publish a metadata commit. Data files are
    untouched (pinned by mtime in pytest); readers apply the DV as a
    broadcast anti-join on ``(_metadata.file_name,
    _metadata.row_index)`` — positions are stable because data files
    are immutable.

    Consolidation: each delete commit rewrites the live DV set as ONE
    distinct union of (existing DVs ∪ new matches), restricted to the
    current file list — so ``dv_counts`` is exact under overlapping
    re-deletes, a replay of the same predicate is a no-op (returns the
    current version without committing), and old DV files become
    unreferenced (reclaimed by :func:`vacuum`).

    ``predicate`` is a Column or SQL string over the table's columns;
    alternatively pass ``keys`` (a DataFrame of key values) +
    ``key_col`` to delete by key LIST — the GDPR/right-to-be-forgotten
    shape: the list never round-trips the driver, it semi-joins the
    scan (broadcast — delete lists are small by the DV contract).
    Exactly one of the two forms must be given. Replaying the same
    delete (same predicate or same key list) is a no-op, which makes a
    streaming foreachBatch fold of delete batches idempotent under
    retries with no extra ledger.
    Concurrency: the matched positions are only valid against the base
    version they were scanned from; a commit landing in between
    restarts the delete (same contract as :func:`snapshot_merge`).

    100 TB: the predicate scan is one pushdown-filtered pass; the DV
    sidecar is O(deleted rows); every subsequent read pays a broadcast
    anti-join on the dirty files only. Physical reclamation is
    :func:`snapshot_purge_dv` (rewrites ONLY dirty files) or any
    overwrite/OPTIMIZE commit.
    """
    from pyspark.sql import functions as F

    if (predicate is None) == (keys is None):
        raise ValueError("pass exactly one of predicate / keys+key_col")
    if keys is not None and key_col is None:
        raise ValueError("keys requires key_col")
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    for _ in range(max_retries):
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no snapshots at {path}")
        base_version = vs[-1]
        m = _read_manifest(path, base_version)
        files = m["files"]
        scan = spark.read.parquet(
            *[os.path.join(path, "data", f) for f in files]
        ).select(
            F.col("_metadata.file_name").alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
            "*",
        )
        if keys is not None:
            scan = scan.join(
                F.broadcast(keys.select(key_col).distinct()),
                key_col,
                "left_semi",
            )
        else:
            scan = scan.where(pred)
        matches = scan.select(
            F.col("__dv_file").alias("file"),
            F.col("__dv_pos").alias("pos"),
        )
        if m.get("dvs"):
            matches = matches.unionByName(
                _read_dv_set(spark, path, m["dvs"])
            )
        dv_set = (
            matches.where(F.col("file").isin(files)).distinct().cache()
        )
        try:
            per_file = {
                r["file"]: r["n"]
                for r in dv_set.groupBy("file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            old_total = sum(m.get("dv_counts", {}).values())
            if sum(per_file.values()) == old_total:
                return base_version  # nothing newly deleted: no-op
            dv_names = _write_dv_files(dv_set, path)
        finally:
            dv_set.unpersist()

        class _Conflict(Exception):
            pass

        def build(latest_m):
            if latest_m is None or latest_m.get("version") != base_version:
                raise _Conflict
            dv_meta = {"dvs": dv_names, "dv_counts": per_file}
            if m.get("blooms"):  # files unchanged -> blooms still valid
                dv_meta["blooms"] = m["blooms"]
            return (
                files,
                "delete_dv",
                dv_meta,
                m.get("stats", {}),
                m.get("row_counts", {}),
            )

        try:
            return _publish(path, build)
        except _Conflict:
            continue  # restart the scan against the new latest
    raise ConcurrentSnapshotError(
        f"delete at {path} lost {max_retries} publish races; giving up"
    )


def snapshot_purge_dv(spark, path: str, *, max_retries: int = 10) -> int:
    """Materialize deletion vectors: rewrite ONLY the dirty files (the
    ones with recorded deletions) with their DVs applied, carry every
    clean file forward BY NAME, and publish a version with no DVs —
    the maintenance compaction that turns merge-on-read debt back into
    clean scans. At 100 TB this is the entire point of the DV design:
    a delete touching 3 files costs 3 file rewrites at purge time, not
    a table rewrite at delete time. No-op (returns current version) if
    the latest version has no DVs. Pre-purge versions still time-travel
    with their DVs applied."""
    for _ in range(max_retries):
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no snapshots at {path}")
        base_version = vs[-1]
        m = _read_manifest(path, base_version)
        if not m.get("dvs"):
            return base_version
        files = m["files"]
        dv_counts = m.get("dv_counts", {})
        dirty = [f for f in files if dv_counts.get(f)]
        clean = [f for f in files if not dv_counts.get(f)]
        rows = _dv_apply_read(spark, path, m, dirty)
        new_files, new_counts = _write_data_files(rows, path)

        class _Conflict(Exception):
            pass

        def build(latest_m):
            if latest_m is None or latest_m.get("version") != base_version:
                raise _Conflict
            cold = set(clean)
            kept_blooms = {
                f: b for f, b in m.get("blooms", {}).items() if f in cold
            }
            return (
                clean + new_files,
                "purge_dv",
                {"blooms": kept_blooms} if kept_blooms else None,
                {f: s for f, s in m.get("stats", {}).items() if f in cold},
                {
                    **{
                        f: n
                        for f, n in m.get("row_counts", {}).items()
                        if f in cold
                    },
                    **new_counts,
                },
            )

        try:
            return _publish(path, build)
        except _Conflict:
            continue
    raise ConcurrentSnapshotError(
        f"purge at {path} lost {max_retries} publish races; giving up"
    )


def committed_batch_ids(path: str) -> set[int]:
    """Batch ids already committed by :func:`snapshot_stream_sink`:
    the union of ids recorded in retained manifests and ids folded into
    ``_meta.json`` by :func:`vacuum` — so vacuuming old manifests can
    never erase the exactly-once dedup ledger."""
    out = set(int(b) for b in _read_meta(path)["batch_ids"])
    for v in _versions(path):
        b = _read_manifest(path, v).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def snapshot_stream_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    mode: str = "append",
    optimize_every: int | None = None,
    zorder_cols: list[str] | None = None,
    n_files: int = 8,
):
    """Exactly-once streaming sink: each micro-batch becomes ONE atomic
    snapshot commit whose manifest records the batch id, and a replayed
    batch (failure retry, or a restart re-delivering from the checkpoint)
    is skipped because its id is already committed — Spark's standard
    exactly-once contract (checkpointed offsets + idempotent-by-batchId
    sink), here with the dedup ledger inside the table itself.

    ``optimize_every=N`` folds table maintenance into the stream: after
    every Nth batch commit the sink runs :func:`snapshot_optimize`
    (compaction, z-order-clustered when ``zorder_cols`` given) — the
    answer to micro-batch small-file accretion without a separate
    maintenance job. The optimize commit carries no batch id, so replay
    dedup is unaffected; readers stay snapshot-isolated throughout.
    Returns the DataStreamWriter; caller picks the trigger and starts it.

    The committed-id set is loaded ONCE (manifests + the vacuum-surviving
    ``_meta.json`` ledger) and cached in the sink, then INCREMENTALLY
    refreshed each batch from manifests newer than the cached load point
    — the steady-state per-batch cost is one directory glob plus reads
    of only the manifests published since the last batch (usually just
    this sink's own), not an O(versions) rescan. The refresh means a
    second writer against the same table (another sink instance, or a
    manual ``snapshot_write`` carrying a ``batch_id``) is SEEN rather
    than silently breaking exactly-once dedup behind a stale cache; the
    single-stream-writer checkpoint contract still governs who should
    write, but violating it no longer corrupts the ledger.
    """
    commit = _stream_committer(path, mode, optimize_every, zorder_cols, n_files)
    return (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
    )


def _stream_committer(
    path: str,
    mode: str = "append",
    optimize_every: int | None = None,
    zorder_cols: list[str] | None = None,
    n_files: int = 8,
):
    """The foreachBatch closure behind :func:`snapshot_stream_sink`,
    exposed separately so the ledger-refresh behavior is directly
    testable without driving a real stream."""
    seen: set[int] | None = None
    load_point = 0

    def commit(batch: DataFrame, batch_id: int) -> None:
        nonlocal seen, load_point
        # Re-verify against manifests published since our cached load
        # point (ADVICE r2: the once-per-stream cache silently missed a
        # concurrent writer's batch ids). Cheap: glob + only-new reads.
        # The first batch seeds from the vacuum-surviving _meta.json
        # ledger and then reads the listed manifests through the SAME
        # loop — one read per manifest per sink lifetime, no double
        # startup scan, no race window between ledger and listing.
        vs = _versions(path)
        if seen is None:
            seen = set(int(b) for b in _read_meta(path)["batch_ids"])
        for v in vs:
            if v > load_point:
                b = _read_manifest(path, v).get("batch_id")
                if b is not None:
                    seen.add(int(b))
        if vs:
            load_point = vs[-1]
        if batch.isEmpty() or batch_id in seen:
            return
        snapshot_write(batch, path, mode=mode, meta={"batch_id": batch_id})
        seen.add(batch_id)
        if optimize_every and (batch_id + 1) % optimize_every == 0:
            snapshot_optimize(
                batch.sparkSession,
                path,
                zorder_cols=zorder_cols,
                n_files=n_files,
            )

    return commit


def snapshot_scan(
    spark,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Data-skipping read: open ONLY the files whose recorded [min, max]
    for ``col`` intersects [lo, hi] (manifest stats from
    ``snapshot_write(stats_cols=...)``), then apply the exact predicate —
    the reader-side twin of :func:`snapshot_merge_pruned`'s pruning, and
    the manifest-level form of parquet footer skipping: with a clustered
    ``col`` a selective scan opens a handful of files out of thousands.
    Files without stats are read conservatively. Same rows as
    ``snapshot_read(...).where(lo <= col <= hi)``, by construction.
    """
    return snapshot_scan_multi(spark, path, {col: (lo, hi)}, version=version)


def snapshot_scan_multi(
    spark,
    path: str,
    preds: dict,
    version: int | None = None,
) -> DataFrame:
    """Multi-column data-skipping read: ``preds`` maps column → (lo, hi);
    a file is opened only if EVERY predicate's range intersects its
    recorded [min, max] (conjunctive pruning — the z-order companion:
    clustering on (a, b) makes both columns' per-file ranges tight, so
    two-column point lookups prune to ~one file). Missing stats on a
    column read conservatively. The exact predicate conjunction is
    applied after pruning, so the result equals the unpruned filter."""
    from pyspark.sql import functions as F

    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    stats = m.get("stats", {})

    def may_match(f: str) -> bool:
        for col, (lo, hi) in preds.items():
            s = stats.get(f, {}).get(col)
            if s is None or s[0] is None:
                continue  # no stats for this column -> can't prune on it
            flo, fhi = _stats_decode(s[0]), _stats_decode(s[1])
            if fhi < lo or flo > hi:
                return False
        return True

    exact = None
    for col, (lo, hi) in preds.items():
        c = (F.col(col) >= lo) & (F.col(col) <= hi)
        exact = c if exact is None else (exact & c)
    picked = [f for f in m["files"] if may_match(f)]
    if not picked:
        return snapshot_read(spark, path, version=v).where(F.lit(False))
    if m.get("dvs"):
        df = _dv_apply_read(spark, path, m, picked)
    else:
        df = spark.read.parquet(
            *[os.path.join(path, "data", f) for f in picked]
        )
    return df.where(exact)


def snapshot_count(path: str, version: int | None = None) -> int:
    """COUNT(*) of a snapshot from manifest row counts alone — no Spark
    job, no file opens (the footer counts are recorded at write time).
    Raises if the manifest predates row-count recording."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    counts = m.get("row_counts", {})
    missing = [f for f in m["files"] if f not in counts]
    if missing:
        raise ValueError(
            f"version {v} lacks row counts for {len(missing)} files "
            "(written before row-count manifests); read and count instead"
        )
    dv = m.get("dv_counts", {})
    return sum(counts[f] - dv.get(f, 0) for f in m["files"])


def snapshot_minmax(path: str, col: str, version: int | None = None):
    """Exact global (min, max) of ``col`` from manifest stats alone — no
    Spark job, no file opens (the reader-side twin of
    :func:`snapshot_count`'s metadata-only COUNT). Only valid when
    EVERY live file recorded stats for the column AND the version has
    no deletion vectors (a DV-deleted row may have been the extremum,
    and per-file stats cannot see that) — both cases raise rather than
    silently degrade, pushing the caller to the honest scan."""
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    v = vs[-1] if version is None else version
    m = _read_manifest(path, v)
    if m.get("dvs"):
        raise ValueError(
            f"version {v} carries deletion vectors; metadata min/max "
            "would be wrong if a deleted row was the extremum — scan, "
            "or purge first"
        )
    los, his = [], []
    for f in m["files"]:
        s = m.get("stats", {}).get(f, {}).get(col)
        if s is None or s[0] is None:
            raise ValueError(
                f"version {v}: file {f} has no stats for {col!r} "
                "(write with stats_cols to enable metadata min/max)"
            )
        los.append(_stats_decode(s[0]))
        his.append(_stats_decode(s[1]))
    return min(los), max(his)


def snapshot_optimize(
    spark,
    path: str,
    zorder_cols: list[str] | None = None,
    n_files: int = 8,
    bits: int = 8,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = _BLOOM_M,
) -> int:
    """OPTIMIZE as a snapshot commit: rewrite the latest version's rows
    into ``n_files`` right-sized files — Z-order clustered when
    ``zorder_cols`` is given — and publish atomically as a new version.
    Readers keep snapshot isolation throughout (pre-optimize versions
    remain time-travelable; a reader mid-scan of vN is untouched).
    ``stats_cols`` defaults to ``zorder_cols``, so the rewritten files'
    manifests carry the min/max ranges that make :func:`snapshot_scan`
    and :func:`snapshot_merge_pruned` effective — clustering is what
    turns those stats from decoration into pruning.
    """
    from pyspark.sql import functions as F

    from .operators.partitioning import zorder_key

    df = snapshot_read(spark, path)
    if zorder_cols:
        out = (
            zorder_key(df, zorder_cols, bits=bits)
            .repartitionByRange(n_files, F.col("zkey"))
            .sortWithinPartitions("zkey")
            .drop("zkey")
        )
    else:
        out = df.coalesce(n_files)
    return snapshot_write(
        out,
        path,
        mode="overwrite",
        meta={"optimized": True},
        stats_cols=stats_cols or zorder_cols,
        bloom_cols=bloom_cols,
        bloom_bits=bloom_bits,
    )


def snapshot_restore(path: str, version: int) -> int:
    """RESTORE TABLE to an earlier version — committed as a NEW version
    whose file listing is the old version's (Delta RESTORE semantics:
    history moves forward, nothing is rewritten or deleted, and the
    restore itself is time-travelable/undoable). Data files are immutable
    and never renamed, so restoring is a metadata-only commit: the old
    manifest's files, stats, and row counts are republished verbatim.
    Raises if ``version`` was vacuumed (its files may be gone)."""
    vs = _versions(path)
    if version not in vs:
        raise FileNotFoundError(
            f"version {version} not retained at {path} (have {vs})"
        )
    old = _read_manifest(path, version)

    def build(latest):
        meta = {"restored_from": version}
        if old.get("dvs"):  # restoring a DV version restores its DVs
            meta["dvs"] = old["dvs"]
            meta["dv_counts"] = old.get("dv_counts", {})
        if old.get("blooms"):
            meta["blooms"] = old["blooms"]
        return (
            old["files"],
            "restore",
            meta,
            old.get("stats", {}),
            old.get("row_counts", {}),
        )

    return _publish(path, build)


def snapshot_changes(
    spark,
    path: str,
    keys: list[str],
    compare_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two committed versions — Delta's CDF
    derived from time travel instead of stored change files: read both
    snapshots and classify every key as added/removed/changed via
    operators.diff.snapshot_diff (null-safe, names the changed columns).
    O(both snapshots) per call — the honest cost of deriving changes
    from full-snapshot manifests; a stored per-commit change log is the
    optimization when callers poll every version.
    """
    from .operators.diff import snapshot_diff

    old = snapshot_read(spark, path, version=from_version)
    new = snapshot_read(spark, path, version=to_version)
    return snapshot_diff(old, new, keys, compare_cols)


def snapshot_appended_rows(
    spark, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Rows added between two versions of an APPEND-ONLY history, read
    from only the files present in ``to_version`` but not
    ``from_version`` — O(new data), no diff join, no old-version scan.
    The manifest file-name diff is exact because data files are
    immutable. Raises if any ``from_version`` file is gone from
    ``to_version`` (an overwrite/merge/optimize happened in between —
    row identity via file names no longer holds; use
    :func:`snapshot_changes` there)."""
    vs = _versions(path)
    v_to = (vs[-1] if to_version is None else to_version)
    m_old = _read_manifest(path, from_version)
    m_new = _read_manifest(path, v_to)
    old = set(m_old["files"])
    new = m_new["files"]
    removed = old - set(new)
    if removed:
        raise ValueError(
            f"history v{from_version}->v{v_to} is not append-only "
            f"({len(removed)} files rewritten); use snapshot_changes"
        )
    if (m_old.get("dvs"), m_old.get("dv_counts")) != (
        m_new.get("dvs"),
        m_new.get("dv_counts"),
    ):
        raise ValueError(
            f"history v{from_version}->v{v_to} includes deletion-vector "
            "changes (rows removed without touching files); use "
            "snapshot_changes"
        )
    added = [f for f in new if f not in old]
    if not added:
        return snapshot_read(spark, path, version=v_to).limit(0)
    return spark.read.parquet(
        *[os.path.join(path, "data", f) for f in added]
    )


def incremental_agg_update(
    prev_agg: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    agg_exprs: dict[str, str],
) -> DataFrame:
    """Incremental view maintenance for ADDITIVE aggregates: fold only
    the new rows' partial aggregate into the previous materialized
    aggregate — ``agg_exprs`` maps output column → 'sum' | 'count' | 
    'min' | 'max' (the merge-able aggregates; avg = maintain sum+count).
    Cost is O(new data + |aggregate|): the union re-aggregation combines
    two already-grouped inputs, never rescanning history. min/max are
    only correct under append-only history (deletes would need full
    recompute — exactly the contract snapshot_appended_rows enforces).
    """
    from pyspark.sql import functions as F

    # partial over the new rows, then merge with the previous aggregate:
    # count partials merge by SUM; sum/min/max merge by themselves. For
    # sum/min/max the measured column in new_rows must carry the OUTPUT
    # name (alias it before calling).
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def partial(out: str, kind: str):
        if kind == "count":
            return F.count(F.lit(1)).alias(out)
        return combine[kind](out).alias(out)

    delta = new_rows.groupBy(*keys).agg(
        *[partial(out, kind) for out, kind in agg_exprs.items()]
    )
    return (
        prev_agg.unionByName(delta)
        .groupBy(*keys)
        .agg(
            *[
                combine[kind](out).alias(out)
                for out, kind in agg_exprs.items()
            ]
        )
    )


def snapshot_fsck(path: str) -> dict:
    """Table integrity check — what an operator runs before trusting a
    snapshot table after an incident:

    * ``versions_ok`` — the retained manifests are a contiguous ascending
      suffix of the version sequence, starting no earlier than the
      recorded vacuum horizon (anchoring at 1 falsely flagged every
      healthy vacuumed table, since :func:`vacuum` deletes old manifests
      by design),
    * ``missing_files`` — files named by a manifest but absent on disk
      (data loss: affected versions cannot be read),
    * ``stats_drift`` — stats entries naming files outside the version's
      file list (harmless but indicates a buggy writer),
    * ``n_orphans`` — data files no manifest references (in-flight or
      crashed commits; :func:`vacuum` reclaims them after the grace
      window).

    Pure filesystem walk — no Spark session needed, O(manifests + files).
    """
    vs = _versions(path)
    horizon = _read_meta(path)["vacuum_horizon"]
    # healthy invariant: retained manifests are contiguous and start
    # exactly at the recorded vacuum horizon (vs[0] > horizon means a
    # manifest was deleted outside vacuum; < horizon means a stale
    # manifest reappeared)
    versions_ok = (
        vs == list(range(vs[0], vs[0] + len(vs))) and vs[0] == horizon
        if vs
        else True
    )
    on_disk = {
        os.path.basename(f)
        for f in glob.glob(os.path.join(path, "data", "*.parquet"))
    }
    dv_on_disk = {
        os.path.basename(f)
        for f in glob.glob(os.path.join(path, "dv", "*.parquet"))
    }
    missing: dict[int, list[str]] = {}
    stats_drift: dict[int, list[str]] = {}
    dv_drift: dict[int, list[str]] = {}
    referenced: set[str] = set()
    dv_referenced: set[str] = set()
    for v in vs:
        m = _read_manifest(path, v)
        files = m["files"]
        referenced.update(files)
        dv_referenced.update(m.get("dvs", []))
        lost = [f for f in files if f not in on_disk] + [
            d for d in m.get("dvs", []) if d not in dv_on_disk
        ]
        if lost:
            missing[v] = lost
        drift = [f for f in m.get("stats", {}) if f not in set(files)]
        if drift:
            stats_drift[v] = drift
        # dv_counts must only name live files of the same version
        dvd = [f for f in m.get("dv_counts", {}) if f not in set(files)]
        if dvd:
            dv_drift[v] = dvd
    return {
        "versions_ok": versions_ok,
        "n_versions": len(vs),
        "missing_files": missing,
        "stats_drift": stats_drift,
        "dv_drift": dv_drift,
        "n_orphans": len(on_disk - referenced)
        + len(dv_on_disk - dv_referenced),
        "ok": versions_ok and not missing and not stats_drift
        and not dv_drift,
    }
