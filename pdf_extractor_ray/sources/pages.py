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


_SHARD_ID_BITS = 40  # rows-per-shard budget: 2^40 ≈ 1.1e12 rows/shard


def read_pages_with_ids(
    input_path: str,
    columns: list[str] | None = None,
    *,
    include_paths: bool = False,
) -> rd.Dataset:
    """Column-pruned read that assigns the COLLISION-FREE read-time doc id
    ``doc_id = (shard_index << 40) | row_in_shard`` — shard index over the
    canonical sorted shard list, row index in file order. Deterministic
    across runs and across execution modes (stream vs checkpoint both see
    sorted shards read in file order), collision-free by construction at
    any corpus size (no birthday bound — cf. the retired 60-bit md5(url)
    scheme), and assigned at the scan so no downstream stage ever hashes a
    string to identify a row.

    Shape: shard metadata fans out as (shard, row-group) descriptors; each
    task reads its row groups with pruned columns — the same
    one-task-per-row-group-range parallelism ``read_parquet`` plans, plus
    the id column."""
    import numpy as np
    import pyarrow.parquet as pq

    shards = list_shards(input_path)
    if len(shards) >= (1 << (63 - _SHARD_ID_BITS)):
        raise ValueError(f"too many shards for the id scheme: {len(shards)}")
    items = []
    for si, path in enumerate(shards):
        md = pq.read_metadata(path)
        if md.num_rows >= (1 << _SHARD_ID_BITS):
            raise ValueError(f"shard {path} exceeds 2^40 rows")
        off = 0
        for rg in range(md.num_row_groups):
            items.append(
                {"shard": si, "path": path, "rg": rg, "row_off": off}
            )
            off += md.row_group(rg).num_rows
    cols = columns or EXTRACT_COLUMNS

    def read_frag(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq  # worker-side

        tabs = []
        for shard, path, rg, row_off in zip(
            batch["shard"].to_pylist(),
            batch["path"].to_pylist(),
            batch["rg"].to_pylist(),
            batch["row_off"].to_pylist(),
        ):
            t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
            ids = (shard << _SHARD_ID_BITS) + row_off + np.arange(
                t.num_rows, dtype=np.int64
            )
            t = t.append_column("doc_id", pa.array(ids, pa.int64()))
            if include_paths:
                t = t.append_column(
                    "path", pa.array([path] * t.num_rows, pa.string())
                )
            tabs.append(t)
        return pa.concat_tables(tabs)

    # a handful of row groups per task keeps task count ~= read_parquet's
    return rd.from_items(items).map_batches(
        read_frag, batch_size=4, batch_format="pyarrow"
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
