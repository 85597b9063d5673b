"""Input dedup: one output row per url, first-wins by min ``warc_ts``.

Reference analog: one-rating-per-key upsert + unique index
(``/root/reference/backend/src/main.py:1124-1159``,
``backend/src/migration.py:309-365``) generalized to the corpus key ``url``
(SURVEY.md §2.6 O6).

Scale note: exact dedup requires co-locating all rows of a url. Rather than
a dedicated ``groupby("url")`` (second all-to-all), rows are already
hash-clustered by ``partition_id = crc32(url) % P`` — the pipeline's single
shuffle — so dedup runs vectorized WITHIN each partition group, and the
same exchange doubles as the output partitioning. Tie-break for equal
(url, warc_ts): stable input order within the sort.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def dedup_first_wins(group: pa.Table) -> pa.Table:
    """Keep the min-warc_ts row per url (vectorized sort + adjacent-diff)."""
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
