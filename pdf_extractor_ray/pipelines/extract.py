"""The flagship pipeline: Common-Crawl-style pages -> extracted main content.

Ray-Data restatement of the reference's upload -> fan-out -> extract ->
persist lifecycle (``/root/reference/backend/src/main.py:324-489`` +
``backend/src/tasks.py:154-351``; SURVEY.md §3.1):

    read_parquet(pages shards, columns pruned)
      -> [keys-only dup-index scan, broadcast]        # stages/dedup.py
      -> map_batches(fused task stage)                # sniff + dedup-filter
      -> write parquet | iterate                      #   + extract, one hop

The payload-bearing dataflow is **shuffle-free**: dedup is decided from a
16-byte-per-row key scan broadcast back as a filter (measured: a payload
all-to-all for dedup cost 6-8x the entire rest of the pipeline at sf0.1;
see stages/dedup.py for the scale argument and its documented limits).

Two physical modes:

* ``stream`` — fully pipelined streaming Dataset; extraction is a cached
  task transform; output is sharded parquet. Fastest; crash = rerun.
* ``checkpoint`` — resumable. Partition = deterministic contiguous group of
  input shards (the Common-Crawl pattern: a WARC shard range is the unit of
  re-run). Each partition is ONE raw Ray task: column-pruned read ->
  broadcast-dedup -> sniff -> extract -> per-url-sorted atomic write +
  `_MANIFEST.json`. Raw tasks (not Dataset) because per-partition atomic
  visibility + skip-on-resume is exactly what the Dataset API can't express
  (SURVEY.md §4 checkpoint row). A re-run with ``resume=True`` skips
  completed partitions entirely — their bytes are never read again.

Scale notes (100 TB): no stage materializes the corpus; the only global
state is the duplicated-url index (small by assumption, asserted). Skew:
oversized documents are parsed page-wise inside the kernel and partitions
are ~equal input-shard counts; 4x more partitions than cluster cores keeps
stragglers rebalancing. The url-hash ``partition_id`` column (crc32(url)%P)
rides on every output row for downstream bucketing/joins.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.sniff import sniff_and_partition
from ..stages.dedup import (
    build_dup_index,
    dedup_first_wins,
    drop_dup_losers,
    index_has_ties,
)
from ..stages.extract import FusedExtractor, extract_batch
from ..state.manifest import (
    PartitionManifest,
    completed_partitions,
    input_fingerprint,
    write_partition_atomic,
)

from ..sources.pages import EXTRACT_COLUMNS as READ_COLUMNS  # noqa: E402
from ..sources.pages import read_pages  # noqa: E402,F401

DEFAULT_URL_BUCKETS = 1024  # modulus of the url-hash partition_id COLUMN


def extracted_dataset(
    input_path: str,
    *,
    n_partitions: int = 1024,  # url-hash bucket modulus (== DEFAULT_URL_BUCKETS)
    dedup: bool = True,
    batch_size: int = 128,
    concurrency: tuple[int, int] | int | None = None,
    emit_pages: bool = False,
    skip_partitions: frozenset[int] | None = None,
    skew_threshold_bytes: int | None = None,
    assign_doc_ids: bool = False,
) -> rd.Dataset:
    """Lazy streaming Dataset of extracted rows (mode=stream core).
    ``assign_doc_ids``: carry the collision-free read-time
    ``(shard << 40) | row`` id through extraction (training compositions)."""
    if os.path.isdir(input_path):
        from ..sources.pages import list_shards

        if not list_shards(input_path):
            # fail loud with the same message as checkpoint mode (the
            # stream path otherwise dies later with an opaque ArrowInvalid)
            raise ValueError(
                f"no input parquet shards found under '{input_path}'"
            )
    dup_index = build_dup_index(input_path) if dedup else None
    # equal-timestamp ties need row provenance so the filter can pick the
    # ONE global winner — (win_file, win_row) is a total order, so the
    # id-carrying read is required whenever ties exist (FusedExtractor
    # derives _row_in_file from the read-time id and drops doc_id again
    # unless the caller asked for it)
    has_ties = index_has_ties(dup_index)
    if assign_doc_ids or has_ties:
        from ..sources.pages import read_pages_with_ids

        ds = read_pages_with_ids(input_path, include_paths=has_ties)
    else:
        ds = read_pages(input_path)
    # ONE fused TASK stage (sniff + dedup-filter + extract): payload blocks
    # hop the object store exactly once; the staged pipeline measured 2.2x
    # slower at 32 CPUs (see stages/extract.py FusedExtractor). Tasks, not
    # an actor pool: Ray Data ships the fused instance once per operator
    # and caches it per worker process, so kernel/filter state amortizes
    # identically — and the pool's spin-up + queueing measured ~2x slower
    # wall time at 32 CPUs on identical interleaved runs (18-46s pool vs
    # 12-18s tasks), with far higher variance.
    inst = FusedExtractor(
        dup_index=dup_index,
        n_partitions=n_partitions,
        skip_partitions=skip_partitions,
        emit_pages=emit_pages,
        skew_threshold_bytes=skew_threshold_bytes,
        keep_doc_ids=assign_doc_ids,
    )

    def fused_stage(batch: pa.Table, _inst=inst) -> pa.Table:
        return _inst(batch)

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return ds.map_batches(
        fused_stage,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        **kwargs,
    )


def run_stream(
    input_path: str,
    output_path: str | None = None,
    *,
    partition_output: bool = False,
    **kwargs,
) -> rd.Dataset:
    """Stream mode; with ``partition_output`` the write is hive-partitioned
    by the url-hash ``partition_id`` column (no shuffle — each task appends
    files under every partition dir it touches; downstream readers get
    partition pruning, but per-partition atomicity needs checkpoint mode).
    """
    ds = extracted_dataset(input_path, **kwargs)
    if output_path:
        if partition_output:
            ds.write_parquet(output_path, partition_cols=["partition_id"])
        else:
            ds.write_parquet(output_path)
        return rd.read_parquet(output_path)
    return ds


# --------------------------------------------------------------------------
# checkpoint mode: partition = contiguous shard group, one raw Ray task each
# --------------------------------------------------------------------------

def shard_groups(input_path: str, n_partitions: int) -> list[list[str]]:
    """Deterministic contiguous grouping of sorted input shards. Resume
    requires re-running with the same (input file set, n_partitions)."""
    from ..sources.pages import list_shards

    files = list_shards(input_path)
    if not files:
        raise ValueError(f"no input parquet shards found under {input_path!r}")
    n = min(n_partitions, len(files))
    base, rem = divmod(len(files), n)
    groups, off = [], 0
    for i in range(n):
        size = base + (1 if i < rem else 0)
        groups.append(files[off : off + size])
        off += size
    return groups


def _partition_keep_masks(
    files: list[str], dup_index: pa.Table | None
) -> tuple[int, int, list]:
    """Keys-only dedup pass over a shard group: read ONLY (url, warc_ts)
    (~16 B/row — payload bytes stay on disk), apply the exact same global
    broadcast filter + within-group first-wins as the old whole-group path,
    and return ``(rows_in, input_fingerprint, per-file boolean keep
    masks)``. The payload pass then streams row-group batches through the
    masks, so a partition task's memory is bounded by one parquet row
    group, not the partition's byte size."""
    import numpy as np

    need_paths = index_has_ties(dup_index)
    tabs = []
    for f in files:
        t = pq.read_table(f, columns=["url", "warc_ts"])
        if need_paths:
            t = t.append_column(
                "path", pa.array([f] * t.num_rows, pa.string())
            ).append_column(
                "_row_in_file",
                pa.array(np.arange(t.num_rows, dtype=np.int64)),
            )
        tabs.append(t)
    offs = np.cumsum([0] + [t.num_rows for t in tabs])
    keys = pa.concat_tables(tabs)
    rows_in = keys.num_rows
    fp = input_fingerprint(keys["url"], keys["warc_ts"])
    keys = keys.append_column(
        "_row", pa.array(np.arange(rows_in, dtype=np.int64))
    )
    if dup_index is not None:
        keys = drop_dup_losers(keys, dup_index=dup_index)
    keys = dedup_first_wins(keys)
    keep = np.zeros(rows_in, dtype=bool)
    keep[keys["_row"].to_numpy(zero_copy_only=False)] = True
    masks = [keep[offs[j] : offs[j + 1]] for j in range(len(files))]
    return rows_in, fp, masks


def process_partition(
    pid: int,
    files: list[str],
    output_dir: str,
    dup_index: pa.Table | None,
    *,
    n_url_buckets: int = DEFAULT_URL_BUCKETS,
    emit_pages: bool = True,
    emit_links: bool = False,
    batch_size: int = 64,
    skew_threshold_bytes: int | None = None,
    shard_base: int | None = None,
) -> pa.Table:
    """One checkpoint partition end-to-end; returns a one-row metrics table
    (the reference's per-job latency/cost instrumentation,
    ``backend/src/tasks.py:265-282``). ``shard_base``: global index of
    ``files[0]`` in the sorted shard list — when given, each row gets the
    collision-free read-time id ``(shard_index << 40) | row_in_shard``
    (identical to stream mode's read_pages_with_ids assignment).

    Memory model (100 TB posture): dedup is decided in a keys-only pass
    (``_partition_keep_masks``); payloads then STREAM as parquet row-group
    batches through sniff+extract into incremental ParquetWriters inside
    the atomic temp dir — the task never materializes the shard group, so
    peak RSS is bounded by one row group × the extraction working set and
    is independent of partition byte size (tested at 4× group sizes).
    Output rows land in input order (the old per-partition url sort only
    served file-layout determinism; input order is equally deterministic —
    every reader joins or sorts on url anyway)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.links import links_batch

    t0 = time.perf_counter()
    rows_in, fp, masks = _partition_keep_masks(files, dup_index)
    counts = {"ok": 0, "empty": 0, "error": 0, "unknown": 0}
    totals = {"rows_out": 0, "bytes_in": 0}

    def writer(dir_path: str) -> PartitionManifest:
        writers: dict[str, pq.ParquetWriter] = {}
        # buffer per-batch outputs into real row groups (a write per
        # 64-row extract batch makes hundreds of tiny row groups per file
        # and measurably slows both the write and every later read); the
        # buffer is a bounded CONSTANT (rows/bytes cap), so the streaming
        # memory bound stands
        buf: dict[str, list[pa.Table]] = {}
        _FLUSH_ROWS, _FLUSH_BYTES = 8192, 64 << 20

        def flush(name: str) -> None:
            parts = buf.pop(name, [])
            if not parts:
                return
            t = pa.concat_tables(parts)
            w = writers.get(name)
            if w is None:
                w = writers[name] = pq.ParquetWriter(
                    os.path.join(dir_path, f"{name}.parquet"), t.schema
                )
            w.write_table(t)

        def emit(name: str, table: pa.Table) -> None:
            parts = buf.setdefault(name, [])
            parts.append(table)
            if (
                sum(p.num_rows for p in parts) >= _FLUSH_ROWS
                or sum(p.nbytes for p in parts) >= _FLUSH_BYTES
            ):
                flush(name)

        def handle(t: pa.Table) -> None:
            totals["bytes_in"] += int(
                pc.sum(pc.binary_length(t["html"])).as_py() or 0
            )
            t = sniff_and_partition(t, n_partitions=n_url_buckets)
            out = extract_batch(
                t,
                emit_pages=emit_pages,
                skew_threshold_bytes=skew_threshold_bytes,
            )
            totals["rows_out"] += out.num_rows
            for sv in pc.value_counts(out["status"]):
                s = sv["values"].as_py()
                if s in counts:
                    counts[s] += sv["counts"].as_py()
            emit(
                "extracted",
                out.drop_columns(
                    [c for c in ("pages", "page_tables") if c in out.column_names]
                ),
            )
            if emit_pages:
                emit("extracted_pages", _explode_pages(out))
            if emit_links:
                # second product off the same payload pass (WAT-file
                # analog): per-page ordered anchors, shared scanner
                emit("links", links_batch(t.select(["url", "html"])))

        for j, f in enumerate(files):
            pf = pq.ParquetFile(f)
            row_off = 0
            try:
                for rb in pf.iter_batches(
                    batch_size=batch_size, columns=READ_COLUMNS
                ):
                    t = pa.Table.from_batches([rb])
                    n = t.num_rows
                    if shard_base is not None:
                        ids = ((shard_base + j) << 40) + row_off + np.arange(
                            n, dtype=np.int64
                        )
                        t = t.append_column("doc_id", pa.array(ids, pa.int64()))
                    m = masks[j][row_off : row_off + n]
                    row_off += n
                    if not m.any():
                        continue
                    if not m.all():
                        t = t.filter(pa.array(m))
                    handle(t)
            finally:
                pf.close()

        if not writers and not buf:
            # zero-row partition (all rows were dedup losers, or an empty
            # shard): emit empty tables with the full schema so the
            # manifest still lands and resume can skip it
            sch = pq.read_schema(files[0])
            empty = pa.schema([sch.field(c) for c in READ_COLUMNS]).empty_table()
            if shard_base is not None:
                empty = empty.append_column("doc_id", pa.array([], pa.int64()))
            handle(empty)

        for name in list(buf):
            flush(name)
        for w in writers.values():
            w.close()
        return PartitionManifest(
            partition_id=pid,
            rows_in=rows_in,
            rows_out=totals["rows_out"],
            n_ok=counts["ok"],
            n_empty=counts["empty"],
            n_error=counts["error"],
            n_unknown=counts["unknown"],
            n_other=totals["rows_out"] - sum(counts.values()),
            bytes_in=totals["bytes_in"],
            wall_s=round(time.perf_counter() - t0, 4),
            input_fingerprint=fp,
            files=list(files),
            file_sizes=[os.path.getsize(f) for f in files],
        )

    write_partition_atomic(output_dir, pid, writer)
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "rows_out": pa.array([totals["rows_out"]], pa.int64()),
            "n_ok": pa.array([counts["ok"]], pa.int64()),
            "n_error": pa.array([counts["error"]], pa.int64()),
            "bytes_in": pa.array([totals["bytes_in"]], pa.int64()),
            "wall_s": pa.array(
                [round(time.perf_counter() - t0, 4)], pa.float64()
            ),
        }
    )


def _explode_pages(out: pa.Table) -> pa.Table:
    """extracted (with pages list col) -> one row per (url, page_number) —
    the reference's DocumentPageContent long table
    (``backend/src/models/database.py:61-73``, 1-based pages). Vectorized:
    ``list_flatten`` + ``list_parent_indices`` + a repeat-offset arange for
    the 1-based page number — no per-row Python (this runs on every
    checkpoint partition with ``emit_pages=True``, the default)."""
    import numpy as np
    import pyarrow.compute as pc

    pages = out["pages"].combine_chunks()
    flat = pc.list_flatten(pages)  # skips null/empty lists, keeps elements
    parent = pc.list_parent_indices(pages)
    counts = (
        pc.fill_null(pc.list_value_length(pages), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    starts = np.cumsum(counts) - counts  # flat start offset per source row
    page_numbers = (
        np.arange(int(counts.sum()), dtype=np.int64)
        - np.repeat(starts, counts)
        + 1
    )
    cols = {
        "url": pc.take(out["url"], parent),
        "page_number": pa.array(page_numbers.astype(np.int32), pa.int32()),
        "page_text": pc.cast(flat, pa.large_string()),
    }
    if "page_tables" in out.column_names:
        # aligned element-wise with pages (extract_batch guarantees equal
        # list lengths), so the same parent/flatten applies
        cols["page_tables"] = pc.cast(
            pc.list_flatten(out["page_tables"].combine_chunks()),
            pa.large_string(),
        )
    return pa.table(cols)


def run_checkpoint(
    input_path: str,
    output_dir: str,
    *,
    n_partitions: int = 32,
    resume: bool = True,
    emit_pages: bool = True,
    emit_links: bool = False,
    dedup: bool = True,
    skew_threshold_bytes: int | None = None,
    assign_doc_ids: bool = False,
    batch_size: int = 256,
) -> pa.Table:
    """Resumable run; returns the per-partition metrics table.

    ``batch_size`` is the payload-pass rows-per-extract-batch: memory stays
    bounded by one parquet row group regardless (iter_batches slices row
    groups), so a larger batch only amortizes per-batch Python/Arrow
    overhead — 256 measured ~15% faster end-to-end than the former 64 at
    sf0.1/32cpus with identical output."""
    import ray

    os.makedirs(output_dir, exist_ok=True)
    groups = shard_groups(input_path, n_partitions)
    # drop output dirs beyond the current group count (a previous run with
    # more groups would otherwise leave stale part-K dirs that duplicate
    # rows in read_extracted)
    for name in os.listdir(output_dir):
        if name.startswith("part-"):
            try:
                pid = int(name.split("-", 1)[1])
            except ValueError:
                continue
            if pid >= len(groups):
                import shutil as _shutil

                _shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
    skip = completed_partitions(output_dir, groups) if resume else frozenset()
    if assign_doc_ids and skip:
        # a checkpoint written by a pre-doc_id release would otherwise
        # surface as an opaque KeyError deep in the packing exchange —
        # validate the finished partitions' schema up front (footer-only
        # read) and fail actionably
        import pyarrow.parquet as _pq

        for pid in skip:
            p = os.path.join(output_dir, f"part-{pid}", "extracted.parquet")
            if "doc_id" not in _pq.read_schema(p).names:
                raise ValueError(
                    f"stale checkpoint: {p} has no 'doc_id' column (written "
                    "by a run without assign_doc_ids); delete the workdir "
                    "or re-run with resume=False to re-extract"
                )
    dup_index = build_dup_index(input_path) if dedup else None
    dup_ref = ray.put(dup_index)  # broadcast once, read zero-copy per task
    # infra-level retry budget from the engine's declared config (reference
    # per-extractor {max_retries, countdown}, constants.py:72-95 applied at
    # tasks.py:334-340); kernels never throw, so a task failure is a worker
    # death and retry_exceptions stays False (infra errors are not
    # app-retried, tasks.py:112-123 semantics)
    from ..stages.registry import get_extractor

    budget = int(get_extractor("main_content").info().get("max_retries", 1))
    worker = ray.remote(
        num_cpus=1, max_retries=budget, retry_exceptions=False
    )(process_partition)
    bases: list[int] = []
    off = 0
    for g in groups:  # global shard index of each group's first file
        bases.append(off)
        off += len(g)
    futures = [
        worker.remote(
            pid, files, output_dir, dup_ref, emit_pages=emit_pages,
            emit_links=emit_links,
            batch_size=batch_size,
            skew_threshold_bytes=skew_threshold_bytes,
            shard_base=bases[pid] if assign_doc_ids else None,
        )
        for pid, files in enumerate(groups)
        if pid not in skip
    ]
    tables = [t for t in ray.get(futures) if t.num_rows]
    return (
        pa.concat_tables(tables)
        if tables
        else pa.table({"partition_id": pa.array([], pa.int32())})
    )


def read_extracted(output_dir: str) -> rd.Dataset:
    """Read back a checkpoint-mode output directory as one Dataset."""
    paths = [
        os.path.join(output_dir, d, "extracted.parquet")
        for d in sorted(os.listdir(output_dir))
        if d.startswith("part-")
    ]
    return rd.read_parquet(paths)


def main() -> None:
    import argparse

    import ray

    ap = argparse.ArgumentParser(description="run the extraction pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["stream", "checkpoint"], default="checkpoint")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--skew-threshold-mb", type=float, default=8.0,
        help="PDFs above this many MiB are page-range-split across the cluster",
    )
    ap.add_argument(
        "--emit-links", action="store_true",
        help="also write per-partition links.parquet (url, link_idx, href, "
             "anchor) — the link-graph product off the same payload pass",
    )
    ap.add_argument(
        "--extractors", default=None,
        help="comma-separated registry engines (reference extractor "
             "selection, main.py:343-354); >1 name runs the fan-out "
             "pipeline writing the (url, extractor, text, status) long "
             "table instead of the flagship",
    )
    ap.add_argument(
        "--fake-services", action="store_true",
        help="deterministic fakes for stub (external-service) engines",
    )
    args = ap.parse_args()

    extractors = None
    if args.extractors:
        from ..stages.registry import get_extractor

        extractors = [e.strip() for e in args.extractors.split(",") if e.strip()]
        for e in extractors:
            get_extractor(e)  # validate against the registry; raises on unknown

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        skew_bytes = int(args.skew_threshold_mb * 1024 * 1024) or None
        if extractors and extractors != ["main_content"]:
            from .fanout import fan_out

            out = fan_out(
                read_pages(args.input), extractors,
                fake_services=args.fake_services,
            )
            out.write_parquet(args.output)
            print(
                f"fan-out [{','.join(extractors)}] -> {args.output}"
            )
        elif args.mode == "stream":
            run_stream(
                args.input, args.output, n_partitions=args.partitions,
                skew_threshold_bytes=skew_bytes,
            )
            print(f"stream output -> {args.output}")
        else:
            metrics = run_checkpoint(
                args.input, args.output, n_partitions=args.partitions,
                resume=args.resume, emit_links=args.emit_links,
                skew_threshold_bytes=skew_bytes,
            )
            done = metrics.num_rows
            total_rows = sum(metrics["rows_out"].to_pylist()) if done else 0
            print(f"checkpoint: {done} partitions processed, {total_rows} rows -> {args.output}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
