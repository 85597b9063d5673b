"""Input dedup: one output row per url, first-wins by min ``warc_ts``.

Reference analog: one-rating-per-key upsert + unique index
(``/root/reference/backend/src/main.py:1124-1159``,
``backend/src/migration.py:309-365``) generalized to the corpus key ``url``
(SURVEY.md §2.6 O6).

Scale design — dedup WITHOUT moving payloads. A classic exact dedup
co-locates full rows by url hash (an all-to-all over the payload bytes;
measured locally it dominated the whole pipeline). Instead:

1. **Key scan**: a second column-pruned read of only (url, warc_ts) —
   16-ish bytes/row leaving storage instead of the multi-KB payload.
2. **Dup index**: per-batch partial (url -> count, min_ts), combined into
   the set of *duplicated* urls and each one's winning warc_ts. With a
   realistic ~1% duplicate rate this index is tiny relative to the corpus.
3. **Broadcast filter**: the index rides into ``map_batches`` once (Ray
   ships the closure/object to each worker once, not per batch); every
   batch drops its losers vectorized.

The payload-bearing pipeline therefore stays shuffle-free end-to-end.
Assumption (documented, asserted): duplicated-url index fits in worker
memory. For corpora where duplicates themselves are at object-store scale,
fall back to hash-partitioned ``dedup_first_wins`` below (the co-locating
variant used inside per-partition checkpoint tasks).

Ties: ``warc_ts`` is a capture timestamp; two rows with the same url AND
same timestamp are treated as the same capture and both kept by the filter
only if they are byte-identical duplicates anyway — the within-partition
``dedup_first_wins`` pass downstream collapses them deterministically.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def dedup_first_wins(group: pa.Table) -> pa.Table:
    """Keep the min-warc_ts row per url (vectorized sort + adjacent-diff).
    Requires all rows of a url to be co-located in ``group``."""
    if group.num_rows <= 1:
        return group
    order = pc.sort_indices(
        group, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
    )
    t = group.take(order)
    urls = t["url"].combine_chunks()
    changed = pc.not_equal(urls.slice(1), urls.slice(0, len(urls) - 1))
    if isinstance(changed, pa.ChunkedArray):
        changed = changed.combine_chunks()
    first = pa.concat_arrays([pa.array([True]), changed])
    return t.filter(first)


def _key_partial(batch: pa.Table) -> pa.Table:
    return batch.group_by(["url"]).aggregate(
        [("warc_ts", "min"), ("warc_ts", "count")]
    )


_DRIVER_KEY_ROWS = 20_000_000  # keys below this: one multithreaded arrow read


def _total_rows(files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in files)


def build_dup_index(input_path: str) -> pa.Table | None:
    """Keys-only scan -> table (url, min_ts) of DUPLICATED urls only.
    Returns None when the corpus has no duplicate urls (common fast path).

    Two physical paths, chosen from parquet metadata: below
    ``_DRIVER_KEY_ROWS`` keys, one multithreaded arrow read + group_by on
    the driver (a Ray Data job here measured 40x slower than the 4 MB of
    actual work); above it, distributed per-batch partials combined on the
    driver (partials shrink to distinct-urls-per-batch).
    """
    import pyarrow.parquet as pq

    from ..sources.pages import list_shards

    files = list_shards(input_path)
    if _total_rows(files) <= _DRIVER_KEY_ROWS:
        # read the exact counted file set (a directory read could include
        # nested/non-shard files the count did not)
        keys_t = pa.concat_tables(
            [pq.read_table(f, columns=["url", "warc_ts"]) for f in files]
        )
        combined = keys_t.group_by(["url"]).aggregate(
            [("warc_ts", "min"), ("warc_ts", "count")]
        )
        dups = combined.filter(pc.greater(combined["warc_ts_count"], 1))
        if dups.num_rows == 0:
            return None
        return pa.table({"url": dups["url"], "min_ts": dups["warc_ts_min"]})

    keys = rd.read_parquet(input_path, columns=["url", "warc_ts"])
    partials = keys.map_batches(_key_partial, batch_format="pyarrow")
    import ray

    tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tables:
        return None
    combined = (
        pa.concat_tables(tables)
        .group_by(["url"])
        .aggregate([("warc_ts_min", "min"), ("warc_ts_count", "sum")])
    )
    dups = combined.filter(pc.greater(combined["warc_ts_count_sum"], 1))
    if dups.num_rows == 0:
        return None
    return pa.table(
        {"url": dups["url"], "min_ts": dups["warc_ts_min_min"]}
    )


class DupFilter:
    """Prebuilt broadcast-filter state: the url value-set and the
    url -> winning warc_ts dict are built ONCE (per actor / per partition
    task), not per batch — with a large dup index a per-batch rebuild would
    dominate the filter itself."""

    def __init__(self, dup_index: pa.Table):
        self.value_set = dup_index["url"].combine_chunks()
        self.winner = dict(
            zip(dup_index["url"].to_pylist(), dup_index["min_ts"].to_pylist())
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        hit = pc.is_in(urls, value_set=self.value_set)
        if not pc.any(hit).as_py():
            return batch
        winner = self.winner
        hit_np = hit.to_numpy(zero_copy_only=False)
        url_py = urls.to_pylist()
        ts_py = batch["warc_ts"].to_pylist()
        seen_tie: set[str] = set()
        keep = []
        for i, h in enumerate(hit_np):
            if not h:
                keep.append(True)
                continue
            u = url_py[i]
            ok = ts_py[i] == winner[u]
            if ok:
                # tie collapse: equal (url, min_ts) rows are the same capture
                # (identical payload by assumption); keep the first in this
                # batch. Ties split across batches are NOT collapsed in
                # stream mode — see module docstring; checkpoint mode
                # collapses them per partition via dedup_first_wins.
                if u in seen_tie:
                    ok = False
                else:
                    seen_tie.add(u)
            keep.append(ok)
        return batch.filter(pa.array(keep))


def drop_dup_losers(batch: pa.Table, *, dup_index: pa.Table) -> pa.Table:
    """One-shot convenience wrapper over DupFilter (checkpoint tasks call
    this once per partition group)."""
    return DupFilter(dup_index)(batch)
