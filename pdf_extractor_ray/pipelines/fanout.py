"""Multi-extractor fan-out: one corpus through k registered engines.

Reference analog — its core product shape: each uploaded document fans out
to a SET of extraction engines and per-extractor results are stored side by
side for comparison (``/root/reference/backend/src/main.py:77-137`` builds
one job per document x extractor; ``backend/src/tasks.py:250-264`` stores
the per-job page rows). Here each extractor is one actor-pool
``map_batches`` branch over the same pages Dataset and the branches union
into a long table::

    url:string, extractor:string, extracted_text:large_string, status:string

Scale notes: branches run as independent streaming stages, so the input is
read once PER EXTRACTOR (the reference likewise parses each document once
per engine — extraction dominates the re-read). No shuffle anywhere; the
union is a logical concatenation of streams. Branches are TASK stages, not
actor pools: k fixed-size pools would reserve k x concurrency CPUs and
deadlock the streaming executor whenever that exceeds the cluster (measured:
4 branches x 2 actors hang a 4-CPU session); tasks time-share. Extractor
state still amortizes — instances are built once on the driver and Ray
worker processes are reused, so compiled kernel tables are process-global
(SURVEY §2.3 T6 semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.extract import DocumentExtractor
from ..stages.registry import get_extractor

FANOUT_COLUMNS = ["url", "extractor", "extracted_text", "status"]


def fan_out(
    pages: rd.Dataset,
    extractors: Sequence[str],
    *,
    batch_size: int = 64,
    fake_services: bool = False,
    materialize_input: bool = False,
) -> rd.Dataset:
    """Run ``pages`` through every named registry extractor; returns the
    (url, extractor, extracted_text, status) long table — one row per
    url x extractor, the reference's per-job result set
    (``tasks.py:250-264``). ``fake_services`` enables the deterministic
    fake for stub (external-service) engines so the full dataflow runs in
    sandboxes without network/binaries. ``materialize_input`` pins the
    input blocks in the object store so the k branches share one read —
    right when the corpus (or the filtered slice being compared) fits in
    cluster memory; leave False at full-corpus scale and let each branch
    stream its own read."""
    if not extractors:
        raise ValueError("fan_out needs at least one extractor name")
    if materialize_input:
        pages = pages.materialize()
    branches = []
    for name in extractors:
        cls = get_extractor(name)  # raises on unknown, like get_reader
        kwargs: dict = {}
        kind = cls.info().get("kind")
        if kind == "stub":
            kwargs["fake"] = fake_services
        elif isinstance(cls, type) and issubclass(cls, DocumentExtractor):
            kwargs["emit_pages"] = False
        inst = cls(**kwargs)

        def _stage(b: pa.Table, _inst=inst, _name: str = name) -> pa.Table:
            out = _inst(b)
            return pa.table(
                {
                    "url": out["url"],
                    "extractor": pa.array([_name] * out.num_rows, pa.string()),
                    "extracted_text": pc.cast(
                        out["extracted_text"], pa.large_string()
                    ),
                    "status": out["status"],
                }
            )

        branches.append(
            pages.map_batches(
                _stage,
                batch_format="pyarrow",
                batch_size=batch_size,
                # per-extractor infra retry budget (constants.py:72-95)
                max_retries=int(cls.info().get("max_retries", 2)),
            )
        )
    out = branches[0]
    if len(branches) > 1:
        out = out.union(*branches[1:])
    return out


DEFAULT_FANOUT = [
    "main_content",
    "markdown_pages",
    "ocr_tesseract",
    "vision_api",
    "textract",
]


def fanout_extract(sf_dir: str) -> rd.Dataset:
    """Driver-data entry: documents -> synthetic pages -> fan-out through
    the default engine set (service stubs in deterministic-fake mode)."""
    from .webpages import docs_to_pages

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = ds.map_batches(docs_to_pages, batch_format="pyarrow")
    return fan_out(pages, DEFAULT_FANOUT, fake_services=True)
