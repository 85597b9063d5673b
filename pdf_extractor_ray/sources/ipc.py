"""Arrow IPC (Feather v2 / .arrow) ingest/egress for the documents table
— the zero-parse interchange format next to parquet (scale path), JSONL
and CSV. IPC blocks deserialize zero-copy, so this is the cheapest hop
between two Arrow-native jobs that don't need parquet's columnar pruning.

Reference analog: the reference normalizes whatever container the client
posts (``/root/reference/backend/src/main.py:324-489``); the contract
here is the same as the JSONL/CSV adapters — every batch is cast to the
canonical schema inside ``map_batches`` so downstream stages see blocks
identical to the parquet reader's.

The sink writes ONE .arrow file per block from inside the task (atomic
tmp-then-rename like the parquet partition sink, content-hash filenames
so an idempotent re-run overwrites byte-identical files), and returns
the (file, rows) manifest table.
"""

from __future__ import annotations

import hashlib
import os
from glob import glob

import pyarrow as pa

import ray.data as rd

from .jsonl import DOCS_SCHEMA, _select_cast


def read_docs_ipc(input_path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Documents table from a directory of *.arrow IPC files (one block
    per file — shard accordingly upstream; IPC has no row groups)."""
    cols = columns or [f.name for f in DOCS_SCHEMA]
    paths = sorted(glob(f"{input_path}/*.arrow"))

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch["bytes"].to_pylist():
            t = pa.ipc.open_file(pa.BufferReader(b)).read_all()
            tables.append(_select_cast(t, DOCS_SCHEMA, cols))
        if not tables:
            return pa.table({c: pa.array([], DOCS_SCHEMA.field(c).type) for c in cols})
        return pa.concat_tables(tables)

    return rd.read_binary_files(paths).map_batches(parse, batch_format="pyarrow")


def write_docs_ipc(ds: rd.Dataset, output_path: str) -> pa.Table:
    """Documents egress: one IPC file per block, written distributed with
    atomic rename; returns the (file, rows) manifest."""
    from ..functions.agg import collect

    os.makedirs(output_path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, batch.schema) as w:
            w.write_table(batch)
        data = sink.getvalue().to_pybytes()
        name = hashlib.md5(data).hexdigest()[:16]
        # pid-scoped tmp name: two tasks holding IDENTICAL blocks would
        # otherwise interleave writes into one tmp file before the rename
        tmp = os.path.join(output_path, f".part-{name}.{os.getpid()}.tmp")
        final = os.path.join(output_path, f"part-{name}.arrow")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        return pa.table(
            {
                "file": pa.array([final], pa.string()),
                "rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    manifest = collect(ds.map_batches(write_block, batch_format="pyarrow"))
    if manifest is None:
        return pa.table(
            {"file": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
        )
    return manifest
