"""Checkpoint partition tasks must STREAM, not materialize the shard group.

A partition at 100 TB scale is tens of GB of payload; the task reads
row-group batches through extract and writes incrementally, so peak RSS is
bounded by (row group x extraction working set), independent of the
partition's byte size. Verified empirically: run the same partition task in
fresh subprocesses over a 1x and a 4x payload corpus and require the RSS
delta to stay far below the input-size delta (a materializing
implementation regresses by >= the extra corpus bytes).
"""

import json
import subprocess
import sys

_CHILD = r"""
import json, os, resource, sys
import pyarrow as pa, pyarrow.parquet as pq

src, out, n_rows = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(src, exist_ok=True)
word = b"lorem ipsum dolor sit amet consectetur "
body = word * 26000  # ~1.0 MiB of extractable text per page
half = n_rows // 2
for s in range(2):
    w = pq.ParquetWriter(
        os.path.join(src, f"part-{s:05d}.parquet"),
        pa.schema([
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("lang", pa.string()),
            ("html", pa.large_binary()),
        ]),
    )
    # build + write in 8-row chunks so corpus construction itself never
    # holds the shard in memory (it would mask the pipeline's peak)
    for lo in range(s * half, (s + 1) * half, 8):
        ids = list(range(lo, min(lo + 8, (s + 1) * half)))
        w.write_table(pa.table({
            "url": pa.array([f"https://x.test/{i:06d}" for i in ids]),
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + i for i in ids],
                pa.timestamp("us", tz="UTC"),
            ),
            "lang": pa.array(["en"] * len(ids)),
            "html": pa.array(
                [b"<!doctype html><html><body><p>" + body
                 + f"tail{i}</p></body></html>".encode() for i in ids],
                pa.large_binary(),
            ),
        }))
    w.close()

from pdf_extractor_ray.pipelines.extract import process_partition, shard_groups

groups = shard_groups(src, 1)
process_partition(0, groups[0], out, None, emit_pages=False, batch_size=8)
print(json.dumps({
    "maxrss_kb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss,
}))
"""


def _peak_rss_kb(tmp_path, n_rows: int) -> int:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD,
         str(tmp_path / f"src{n_rows}"), str(tmp_path / f"out{n_rows}"),
         str(n_rows)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])["maxrss_kb"]


def test_partition_peak_rss_independent_of_group_size(tmp_path):
    small = _peak_rss_kb(tmp_path, 32)    # ~33 MiB of payload
    big = _peak_rss_kb(tmp_path, 128)     # ~133 MiB of payload (4x)
    # input grew by ~100 MiB; a streaming task's peak must not track it
    # (materializing the group regresses by >= the full corpus delta)
    assert big - small < 60_000, (
        f"peak RSS scaled with partition size: {small} KB -> {big} KB"
    )
