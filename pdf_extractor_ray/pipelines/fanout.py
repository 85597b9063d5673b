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


def _build_instances(
    extractors: Sequence[str], fake_services: bool
) -> list[tuple[str, object, int]]:
    insts = []
    for name in extractors:
        cls = get_extractor(name)  # raises on unknown, like get_reader
        kwargs: dict = {}
        kind = cls.info().get("kind")
        if kind == "stub":
            kwargs["fake"] = fake_services
        elif isinstance(cls, type) and issubclass(cls, DocumentExtractor):
            kwargs["emit_pages"] = False
        insts.append(
            (name, cls(**kwargs), int(cls.info().get("max_retries", 2)))
        )
    return insts


def _long_rows(out: pa.Table, name: str) -> pa.Table:
    return pa.table(
        {
            "url": out["url"],
            "extractor": pa.array([name] * out.num_rows, pa.string()),
            "extracted_text": pc.cast(
                out["extracted_text"], pa.large_string()
            ),
            "status": out["status"],
        }
    )


def fan_out(
    pages: rd.Dataset,
    extractors: Sequence[str],
    *,
    batch_size: int = 64,
    fake_services: bool = False,
    materialize_input: bool = False,
    fused: bool = False,
) -> rd.Dataset:
    """Run ``pages`` through every named registry extractor; returns the
    (url, extractor, extracted_text, status) long table — one row per
    url x extractor, the reference's per-job result set
    (``tasks.py:250-264``). ``fake_services`` enables the deterministic
    fake for stub (external-service) engines so the full dataflow runs in
    sandboxes without network/binaries.

    Two physical shapes:

    * ``fused=True`` — ONE streaming stage runs all k engines over each
      batch and emits k rows per document: one storage read, one
      object-store hop, no re-parse of the payload columns. The right
      default when every engine is a CPU-local kernel; the retry budget is
      the max over the fused engines (per-engine budgets can't attach to a
      shared stage).
    * ``fused=False`` — k independent streaming branches unioned, each
      with its OWN per-extractor retry budget (constants.py:72-95) and
      failure isolation; the input is read once per extractor. Choose this
      when engines have very different cost/failure profiles (external
      services) and the re-read is cheaper than coupling them.
      ``materialize_input`` pins the input blocks in the object store so
      the k branches share one read — right when the corpus (or the
      filtered slice being compared) fits in cluster memory."""
    if not extractors:
        raise ValueError("fan_out needs at least one extractor name")
    insts = _build_instances(extractors, fake_services)

    if fused:
        def fused_stage(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [_long_rows(inst(b), name) for name, inst, _ in insts]
            )

        return pages.map_batches(
            fused_stage,
            batch_format="pyarrow",
            batch_size=batch_size,
            max_retries=max(r for _, _, r in insts),
        )

    if materialize_input:
        pages = pages.materialize()
    branches = []
    for name, inst, retries in insts:
        def _stage(b: pa.Table, _inst=inst, _name: str = name) -> pa.Table:
            return _long_rows(_inst(b), _name)

        branches.append(
            pages.map_batches(
                _stage,
                batch_format="pyarrow",
                batch_size=batch_size,
                # per-extractor infra retry budget (constants.py:72-95)
                max_retries=retries,
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


PAGE_CONTENT_COLUMNS = ["url", "extractor", "page_number", "content_key", "text"]


def page_contents_batch(batch: pa.Table, fake_services: bool = True) -> pa.Table:
    """pages batch -> the reference's DocumentPageContent long table
    (``backend/src/models/database.py:61-73`` + ``tasks.py:250-264``): one
    row per (url, extractor, page, CONTENT KEY) — the per-page multi-key
    content vocabulary the reference stores as a dict per page:

      main_content   -> COMBINED + TABLE per page (pdfplumber's exact dict
                        shape, ``pdfplumber_extractor.py:44-47`` — TABLE is
                        "" on table-free pages, both keys always present)
      markdown_pages -> MARKDOWN per split page (llamaparse.py:149-163)
      mathpix        -> LATEX  (stub; deterministic fake when fake_services)
      ocr_tesseract  -> TEXT   (stub; deterministic fake when fake_services)

    One fused pass per batch (each engine is pure CPU over the same
    payload); no shuffle anywhere."""
    from ..functions.textops import split_markdown_pages
    from ..kernels import extract_document
    from ..stages.registry import get_extractor

    mathpix = get_extractor("mathpix")(fake=fake_services)
    ocr = get_extractor("ocr_tesseract")(fake=fake_services)

    urls: list[str] = []
    exts: list[str] = []
    pnums: list[int] = []
    keys: list[str] = []
    texts: list[str] = []

    def add(u: str, e: str, n: int, k: str, t: str) -> None:
        urls.append(u)
        exts.append(e)
        pnums.append(n)
        keys.append(k)
        texts.append(t)

    for u, p in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
        _ctype, res = extract_document(p)
        tables = res.tables_aligned()
        for i, (pg, tb) in enumerate(zip(res.pages, tables), start=1):
            add(u, "main_content", i, "COMBINED", pg)
            add(u, "main_content", i, "TABLE", tb)
        md = (p or b"").decode("utf-8", errors="replace")
        sp = split_markdown_pages(md)
        for n in sorted(sp):
            add(u, "markdown_pages", n, "MARKDOWN", sp[n])
        add(
            u, "mathpix", 1, "LATEX",
            mathpix._fake_text(p) if fake_services else "",
        )
        add(
            u, "ocr_tesseract", 1, "TEXT",
            ocr._fake_text(p) if fake_services else "",
        )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "extractor": pa.array(exts, pa.string()),
            "page_number": pa.array(pnums, pa.int32()),
            "content_key": pa.array(keys, pa.string()),
            "text": pa.array(texts, pa.large_string()),
        }
    )


def page_contents(sf_dir: str) -> rd.Dataset:
    """Driver-data entry for the per-page content-key long table: documents
    -> synthetic pages -> one fused pass through the engine set. DuckDB-
    checkable because every key is derivable from the deterministic page
    template (COMBINED from the text, MARKDOWN = the raw payload, stub
    fakes = md5 of the payload)."""
    from .webpages import docs_to_pages

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = ds.map_batches(docs_to_pages, batch_format="pyarrow")
    return pages.map_batches(page_contents_batch, batch_format="pyarrow")


def fanout_extract(sf_dir: str) -> rd.Dataset:
    """Driver-data entry: documents -> synthetic pages -> fan-out through
    the default engine set (service stubs in deterministic-fake mode)."""
    from .webpages import docs_to_pages

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = ds.map_batches(docs_to_pages, batch_format="pyarrow")
    # all default engines are CPU-local kernels/fakes -> fused single pass
    return fan_out(pages, DEFAULT_FANOUT, fake_services=True, fused=True)
