"""Pure extraction kernels: ``bytes -> ExtractResult``, stdlib-only, deterministic.

These are the compute analog of the reference's extractor classes
(``/root/reference/backend/src/extractors/*.py``): the reference calls
third-party parsers (PyPDF2/pdfplumber/PyMuPDF/...) per document and
returns ``{page: {"content": {...}, "metadata": {...}}}``; here the same
document -> per-page-text semantics is a pure function so the Ray stages,
the single-process oracle and the pytest goldens all share one body of
truth (byte-identity requirement in BASELINE.json.north_rule).
"""

from .result import ExtractResult, Span
from .sniff import sniff_bytes
from .html_extract import extract_html
from .pdf_extract import extract_pdf
from .dispatch import extract_document, extract_routed

__all__ = [
    "ExtractResult",
    "Span",
    "sniff_bytes",
    "extract_html",
    "extract_pdf",
    "extract_document", "extract_routed",
]
