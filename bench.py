"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default mode: one fresh Ray session (num_cpus=$RAY_GRAFT_CPUS, default 32),
times the flagship extraction pipeline over a deterministic synthetic web
corpus (sf-scaled, cached under /tmp) plus every SQL-checked operator query
over the sf tables. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "extract": {docs_per_s, mb_per_s, rows}}

--scaling: runs the extraction pipeline in TWO fresh subprocesses
(num_cpus=8 then 32) on the same corpus and reports throughput at both
plus scaling efficiency = T_32 / (4 * T_8)  (the sandbox stand-in for the
north rule's N vs 4N node clusters); also appended to BENCH/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_rows(sf: float) -> int:
    return max(500, int(240_000 * sf))


def ensure_corpus(sf: float) -> str:
    """sf-scaled synthetic web-page corpus, cached under /tmp by row count."""
    from pdf_extractor_ray.corpus import write_corpus

    rows = corpus_rows(sf)
    path = f"/tmp/graft_bench_corpus_{rows}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        write_corpus(path, n_rows=rows, seed=42, n_shards=max(16, rows // 2000))
        open(marker, "w").close()
    return path


def bench_extract(corpus_path: str, num_cpus: int) -> dict:
    """Time the flagship pipeline end-to-end (read -> sniff -> dedup ->
    actor-pool extract -> consume), report docs/s and input MB/s."""
    import pyarrow.dataset as pads

    from pdf_extractor_ray.pipelines.extract import extracted_dataset

    frag_bytes = sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path)
        if f.endswith(".parquet")
    )
    t0 = time.perf_counter()
    ds = extracted_dataset(
        corpus_path,
        n_partitions=max(64, 4 * num_cpus),
        batch_size=32,
        concurrency=(1, num_cpus),
    )
    n_rows = 0
    n_bytes = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=1024):
        n_rows += batch.num_rows
        n_bytes += batch.nbytes
    wall = time.perf_counter() - t0
    return {
        "rows": n_rows,
        "wall_s": round(wall, 3),
        "docs_per_s": round(n_rows / wall, 1),
        "mb_per_s": round(frag_bytes / wall / 1e6, 2),
        "input_mb": round(frag_bytes / 1e6, 1),
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as E

    out: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # consume lazily-returned datasets fully
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main_bench(sf_dir: str, num_cpus: int, skip_queries: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    sf = sf_of(sf_dir)
    corpus = ensure_corpus(sf)
    extract = bench_extract(corpus, num_cpus)
    queries = {} if skip_queries else run_queries(sf_dir)
    total = extract["wall_s"] + sum(queries.values())
    result = {
        "metric": "extraction+operator wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"extract_corpus": extract["wall_s"], **queries},
        "sf": sf,
        "num_cpus": num_cpus,
        "extract": extract,
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str) -> dict:
    """Two fresh processes at 8 and 32 CPUs over the same corpus."""
    sf = sf_of(sf_dir)
    # pre-generate corpus once so neither timed run pays generation
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    ensure_corpus(sf)
    ray.shutdown()

    levels = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--_child", "--sf-dir", sf_dir,
             "--cpus", str(cpus)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        levels[cpus] = json.loads(line)["extract"]
    eff = levels[32]["docs_per_s"] / (4 * levels[8]["docs_per_s"])
    report = {
        "metric": "scaling efficiency 8->32 cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "levels": {str(k): v for k, v in levels.items()},
        "sf": sf,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING.md", "a") as f:
        f.write(
            f"\n- sf={sf}: 8cpu {levels[8]['docs_per_s']} docs/s "
            f"({levels[8]['mb_per_s']} MB/s), 32cpu {levels[32]['docs_per_s']} docs/s "
            f"({levels[32]['mb_per_s']} MB/s), efficiency={eff:.3f}\n"
        )
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir)))
    elif args._child:
        print(json.dumps(main_bench(args.sf_dir, args.cpus, skip_queries=True)))
    else:
        print(json.dumps(main_bench(args.sf_dir, args.cpus)))


if __name__ == "__main__":
    main()
