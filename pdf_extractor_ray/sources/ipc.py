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
tmp-then-rename like the parquet partition sink) and then commits a
``_MANIFEST.json`` naming exactly the run's files — the authoritative
read-back set. Filenames carry a per-block-occurrence component so two
DISTINCT blocks with byte-identical contents never collapse to one file
(the row multiset is preserved exactly); stale part files from earlier
runs are pruned at commit, so a re-run converges the directory to the
new run's file set (idempotent at the directory level, not the filename
level).
"""

from __future__ import annotations

import hashlib
import json
import os
from glob import glob
from itertools import count

import pyarrow as pa

import ray.data as rd

from .jsonl import DOCS_SCHEMA, _select_cast

_BLOCK_SEQ = count()  # per-worker-process block-occurrence counter
_MANIFEST = "_MANIFEST.json"


def _empty_docs(cols: list[str]) -> pa.Table:
    return pa.table({c: pa.array([], DOCS_SCHEMA.field(c).type) for c in cols})


def read_docs_ipc(input_path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Documents table from an IPC egress directory (one block per file —
    shard accordingly upstream; IPC has no row groups). Reads the sink's
    ``_MANIFEST.json`` file list when present (exact multiset of the last
    committed run); falls back to a directory glob for hand-built dirs.
    An empty directory yields an empty canonical-schema dataset."""
    cols = columns or [f.name for f in DOCS_SCHEMA]
    mpath = os.path.join(input_path, _MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            paths = sorted(e["file"] for e in json.load(f)["files"])
    else:
        paths = sorted(glob(f"{input_path}/*.arrow"))
    if not paths:  # empty egress: canonical-schema empty dataset
        return rd.from_arrow(_empty_docs(cols))

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for b in batch["bytes"].to_pylist():
            t = pa.ipc.open_file(pa.BufferReader(b)).read_all()
            tables.append(_select_cast(t, DOCS_SCHEMA, cols))
        if not tables:
            return _empty_docs(cols)
        return pa.concat_tables(tables)

    return rd.read_binary_files(paths).map_batches(parse, batch_format="pyarrow")


def write_docs_ipc(ds: rd.Dataset, output_path: str) -> pa.Table:
    """Documents egress: one IPC file per block, written distributed with
    atomic rename; commits ``_MANIFEST.json`` and prunes part files not in
    it; returns the (file, rows) manifest table."""
    from ..functions.agg import collect

    os.makedirs(output_path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, batch.schema) as w:
            w.write_table(batch)
        data = sink.getvalue().to_pybytes()
        # filename = content hash + (pid, per-process seq): two DISTINCT
        # blocks with byte-identical contents must not collapse to one
        # file (the row multiset would silently shrink on read-back); a
        # filename collision now requires same pid + same seq + same
        # bytes, i.e. a retried task rewriting its own block — where
        # overwrite is the correct, idempotent outcome. A retry landing
        # in a different process can orphan its first file; the manifest
        # commit below names only SUCCESSFUL task returns and the orphan
        # is pruned.
        seq = next(_BLOCK_SEQ)
        name = f"{hashlib.md5(data).hexdigest()[:16]}-{os.getpid()}-{seq}"
        tmp = os.path.join(output_path, f".part-{name}.tmp")
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
        manifest = pa.table(
            {"file": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
        )
    # commit: manifest atomically, then prune parts not in it (stale files
    # from a previous run to the same dir, or orphans of retried tasks)
    entries = [
        {"file": f, "rows": r}
        for f, r in zip(manifest["file"].to_pylist(), manifest["rows"].to_pylist())
    ]
    mtmp = os.path.join(output_path, f".{_MANIFEST}.{os.getpid()}.tmp")
    with open(mtmp, "w") as f:
        json.dump({"files": entries}, f, indent=1)
    os.replace(mtmp, os.path.join(output_path, _MANIFEST))
    keep = {e["file"] for e in entries}
    for p in glob(f"{output_path}/part-*.arrow"):
        if p not in keep:
            os.remove(p)
    return manifest
