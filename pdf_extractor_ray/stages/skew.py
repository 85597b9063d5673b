"""Skew-splitting of oversized documents (north-rule requirement).

The reference's only skew mitigation is rejecting uploads > 20 MB
(``/root/reference/backend/src/main.py:386-392``); a 1000-page PDF is one
Celery task. Here an oversized PDF row is split INSIDE the extraction
stage: the payload goes to the object store once (``ray.put``), page-range
chunks are extracted by nested Ray tasks spread across the cluster, and the
per-page texts are reassembled in order through the same
``assemble_pdf_result`` the whole-document path uses — so the output is
byte-identical by construction (asserted in tests/test_skew.py).

Why nested tasks rather than a dataset-level flat_map + groupby(url)
reassembly: splitting at the Dataset level either re-reads the corpus
(branch = re-execution) or drags every extracted row through a url shuffle
to reassemble the rare giant ones. Nested tasks keep the pipeline
single-pass and shuffle-free, bound the extraction stage's per-batch wall
time, and parallelize the one straggler document across otherwise idle
workers — exactly the skew case. Pages are independently parseable
(PDF page objects + their content streams), which is the partitioning
assumption this stage relies on.

HTML documents are not split: the DOM scoring is a whole-document
computation and web pages are KB-scale; the oversized path is a PDF
phenomenon (the corpus's ``pdf_big`` class).
"""

from __future__ import annotations

from ..kernels.pdf_extract import (
    assemble_pdf_result,
    extract_pdf_pages,
    pdf_page_count,
)
from ..kernels.result import ExtractResult

# documents above this many bytes take the split path
DEFAULT_SKEW_THRESHOLD_BYTES = 8 * 1024 * 1024
DEFAULT_PAGES_PER_CHUNK = 25


_CHUNK_REMOTE = None


def _chunk_remote():
    """Cached remote fn (one export per worker process, not per document)."""
    global _CHUNK_REMOTE
    if _CHUNK_REMOTE is None:
        import ray

        @ray.remote(num_cpus=1)
        def _extract_chunk(
            payload: bytes, lo: int, hi: int
        ) -> list[tuple[str, str]]:
            return extract_pdf_pages(payload, lo, hi)

        _CHUNK_REMOTE = _extract_chunk
    return _CHUNK_REMOTE


def extract_pdf_skew_split(
    payload: bytes,
    *,
    pages_per_chunk: int = DEFAULT_PAGES_PER_CHUNK,
) -> ExtractResult:
    """Whole-document PDF extraction, parallelized page-range-wise over the
    cluster. Falls back to error status on malformed input, mirroring
    ``extract_pdf``'s swallow-and-flag contract."""
    import ray

    try:
        n = pdf_page_count(payload)
        if n == 0:
            # unparseable or empty page tree -> same answer the whole-doc
            # kernel gives
            from ..kernels.pdf_extract import extract_pdf

            return extract_pdf(payload)
        fn = _chunk_remote()
        payload_ref = ray.put(payload)  # ship bytes to the cluster once
        futures = [
            fn.remote(payload_ref, lo, min(lo + pages_per_chunk, n))
            for lo in range(0, n, pages_per_chunk)
        ]
        pages: list[str] = []
        tables: list[str] = []
        for chunk in ray.get(futures):
            for t, tb in chunk:
                pages.append(t)
                tables.append(tb)
        return assemble_pdf_result(pages, tables)
    except Exception:
        # a failed chunk surfaces as RayTaskError, whose message differs
        # from the inline kernel's; re-extract inline so the (rare)
        # malformed oversized document produces the EXACT error row the
        # oracle produces — byte-identity holds for error columns too
        from ..kernels.pdf_extract import extract_pdf

        return extract_pdf(payload)
