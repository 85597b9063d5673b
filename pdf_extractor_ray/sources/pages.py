"""Pages-table readers: prune at the read.

Reference analog: the ingest + storage surface (SURVEY.md §2.1). The
reference's upload endpoint / local FS / S3 writers
(``/root/reference/backend/src/main.py:324-489``, ``:401-431``) collapse
here into "the corpus IS a Parquet table": ``read_parquet`` accepts local
dirs or ``s3://`` URIs unchanged, so the reference's S3 key scheme
(``projects/{p}/documents/{d}/v1/{name}``, ``main.py:404-418``) becomes a
path prefix. The shared-volume + Redis-lock file coordinator
(``backend/src/file_coordinator.py:37-79``) is obsolete: payload bytes
travel inside Arrow blocks through the object store.

Scale rules enforced here:
* columns are ALWAYS pruned to what the consumer asked for (a read that
  loads the 5-column table for a 2-column transform is wrong);
* row filters push down to parquet row groups via dataset filter
  expressions (lang/url-prefix predicates never leave storage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EXTRACT_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(
    input_path: str,
    columns: list[str] | None = None,
    *,
    include_paths: bool = False,
) -> rd.Dataset:
    """Column-pruned read; default drops the carried-through WET ``text``.
    ``include_paths`` adds the source shard as a ``path`` column (needed
    only when the dup index contains equal-timestamp ties)."""
    return rd.read_parquet(
        input_path, columns=columns or EXTRACT_COLUMNS, include_paths=include_paths
    )


def read_pages_filtered(
    input_path: str,
    *,
    lang: str | None = None,
    url_prefix: str | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Predicate-pushdown read: lang equality prunes row groups at the
    scan (parquet statistics); url_prefix applies as a scan filter."""
    expr = None
    if lang is not None:
        expr = pc.field("lang") == lang
    if url_prefix is not None:
        pre = (pc.field("url") >= url_prefix) & (
            pc.field("url") < url_prefix + "￿"
        )
        expr = pre if expr is None else (expr & pre)
    return rd.read_parquet(
        input_path, columns=columns or EXTRACT_COLUMNS, filter=expr
    )


def list_shards(input_path: str) -> list[str]:
    """Canonical shard listing: sorted top-level *.parquet files of a dir,
    or the single file itself. Shared by grouping, key scans and metadata
    row counts so every consumer sees the same file set."""
    import glob as _glob
    import os as _os

    if _os.path.isdir(input_path):
        return sorted(_glob.glob(_os.path.join(input_path, "*.parquet")))
    return [input_path]
