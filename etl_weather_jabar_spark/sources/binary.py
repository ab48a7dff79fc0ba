"""Binary-file source: opaque media blobs as rows.

The ingestion front door for the multimodal tier (ext/multimodal.py):
``spark.read.format("binaryFile")`` turns a directory of image/audio/video
files into (path, modificationTime, length, content) rows — content is the
raw bytes, exactly the opaque ``binary`` column the decode/featurize
operators consume. Reference parity: none (the reference ingests JSON API
docs only); this is the driver-mandated multimodal extension's source.

Scale notes: binaryFile is a real FileFormat — distributed listing,
per-file tasks, partition-count driven by ``spark.sql.files.maxPartitionBytes``
(size it ≥ the largest blob: one file never splits). Push the
``pathGlobFilter`` down so non-media files are never opened, and keep the
payload OUT of shuffles — derive metadata columns first, write payloads
straight to a sink (the same discipline ext/multimodal.py documents).
"""

from __future__ import annotations

import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read every file under ``path`` (optionally matching ``glob``) as one
    row: (media_id, file_name, mime, length, payload). ``media_id`` is a
    deterministic 64-bit id from the file path RELATIVE to the load root
    (xxhash64 — stable across reruns and engines, and unique per file even
    when two subdirectories contain the same basename), ``mime`` is inferred
    from the extension (the decode operators re-verify against magic
    bytes)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext == "ppm", F.lit("image/x-ppm"))
        .when(ext == "wav", F.lit("audio/x-wav"))
        .when(ext.isin("jpg", "jpeg"), F.lit("image/jpeg"))
        .when(ext == "png", F.lit("image/png"))
        .when(ext == "mp3", F.lit("audio/mpeg"))
        .when(ext == "mp4", F.lit("video/mp4"))
        .otherwise(F.lit("application/octet-stream"))
    )
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    # media_id hashes the load-root-relative path, not the basename:
    # with recursive=True two subdirs may hold the same basename, and a
    # basename-only hash would silently conflate distinct blobs in every
    # downstream join/dedup keyed on media_id. The `path` column is a URI
    # (file:/...); strip the scheme, then the normalized load root, so the
    # id is stable even if the corpus directory is relocated.
    root = os.path.abspath(path).rstrip("/")
    no_scheme = F.regexp_replace(F.col("path"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "/")
    rel_path = F.regexp_replace(no_scheme, "^" + re.escape(root + "/"), "")
    # On this Spark line, binaryFile's `path` is the DECODED
    # Path.toString (probed: spaces, '%', '+', '#' all arrive literal),
    # so the raw strip above matches any root. Hadoop variants that DO
    # percent-encode the URI path would never match it, though, and
    # media_id would silently fall back to hashing the absolute URI (not
    # relocation-stable) — so also try the encoded-root form and decode
    # the remainder. In a URI *path* '+' is a literal plus (the +=space
    # rule is query-string-only) while url_decode follows URLDecoder, so
    # '+' is re-framed as %2B before decoding.
    enc_root = urllib.parse.quote(root, safe="/")
    if enc_root != root:
        enc_rel = F.url_decode(
            F.regexp_replace(
                F.regexp_replace(
                    no_scheme, "^" + re.escape(enc_root + "/"), ""
                ),
                r"\+",
                "%2B",
            )
        )
        rel_path = F.when(
            no_scheme.startswith(enc_root + "/"), enc_rel
        ).otherwise(rel_path)
    return df.select(
        F.xxhash64(rel_path).alias("media_id"),
        name.alias("file_name"),
        mime.alias("mime"),
        F.col("length"),
        F.col("content").alias("payload"),
    )


def write_binary_dir(df: DataFrame, path: str, name_col: str = "file_name",
                     payload_col: str = "payload") -> int:
    """Materialize payload rows back to individual files (the export side:
    one file per row, named by ``name_col``). Driver-side iteration over a
    toLocalIterator — streams one partition at a time, never the whole
    table; export of blob tables is inherently a per-file operation.

    Names are data-controlled, so they are validated before touching the
    filesystem: a name must be a plain basename (no separators, no '..',
    not absolute) or the row is rejected with ValueError — otherwise a
    crafted name could escape ``path`` and overwrite arbitrary files.
    Duplicate names also raise (the second write would silently clobber
    the first while the returned count still claimed both exported)."""
    os.makedirs(path, exist_ok=True)
    n = 0
    seen: set[str] = set()
    for row in df.select(name_col, payload_col).toLocalIterator():
        name = row[name_col]
        if (
            not name
            or name in (".", "..")
            or os.path.basename(name) != name
            or os.sep in name
            or (os.altsep and os.altsep in name)
        ):
            raise ValueError(f"write_binary_dir: unsafe file name {name!r}")
        if name in seen:
            raise ValueError(f"write_binary_dir: duplicate file name {name!r}")
        seen.add(name)
        with open(os.path.join(path, name), "wb") as f:
            f.write(bytes(row[payload_col]))
        n += 1
    return n
