"""Sniff + partition-assignment stage (vectorized where it counts).

Reference analog: extension/magic routing at ingest
(``/root/reference/backend/src/main.py:366-399``). The reference has no data
partitioning (Celery round-robin, SURVEY.md §4); here every row gets a
deterministic ``partition_id = crc32(url) % P`` — the ONE partitioning key
reused by dedup, the shuffle, per-partition outputs and resume manifests.

PDF / empty discrimination is pure ``pyarrow.compute`` over the binary
column (zero-copy); only the residual rows (html-vs-unknown needs a
whitespace-lstrip look at the head bytes) take the per-row path, on a
256-byte slice.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.sniff import sniff_bytes


def url_partition_ids(urls: pa.ChunkedArray | pa.Array, n_partitions: int) -> pa.Array:
    """Deterministic partition id per url (crc32 mod P) — stable across
    processes/runs, required for resume manifests."""
    ids = np.fromiter(
        (zlib.crc32(u.encode()) % n_partitions for u in urls.to_pylist()),
        dtype=np.int32,
        count=len(urls),
    )
    return pa.array(ids, pa.int32())


def sniff_and_partition(
    batch: pa.Table,
    *,
    n_partitions: int = 32,
    skip_partitions: frozenset[int] | None = None,
) -> pa.Table:
    """Add ``content_type`` + ``partition_id`` columns; optionally drop rows
    belonging to already-completed partitions (resume fast path — filtered
    BEFORE the shuffle so completed partitions never move)."""
    payload = batch["html"]
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()

    n = len(payload)
    is_pdf = pc.starts_with(payload, pattern=b"%PDF-").to_numpy(zero_copy_only=False)
    lengths = pc.binary_length(payload).to_numpy(zero_copy_only=False)
    is_empty = (lengths == 0) | pc.is_null(payload).to_numpy(zero_copy_only=False)

    ctypes = np.empty(n, dtype=object)
    ctypes[is_pdf] = "pdf"
    ctypes[is_empty & ~is_pdf] = "empty"
    residual = ~(is_pdf | is_empty)
    if residual.any():
        heads = pc.binary_slice(payload, 0, 256)
        for i in np.flatnonzero(residual):
            ctypes[i] = sniff_bytes(heads[i].as_py())

    out = batch.append_column("content_type", pa.array(ctypes, pa.string()))
    pids = url_partition_ids(batch["url"], n_partitions)
    out = out.append_column("partition_id", pids)
    if skip_partitions:
        mask = pa.array([p not in skip_partitions for p in pids.to_pylist()])
        out = out.filter(mask)
    return out
