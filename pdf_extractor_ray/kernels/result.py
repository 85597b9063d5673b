"""The in-flight record produced by every extraction kernel.

Mirrors the reference's per-document result dict
``{page_number: {"content": {...}, "metadata": {...}}}`` (e.g.
``/root/reference/backend/src/extractors/pypdf2_extractor.py:21-50``) but as
a fixed, Arrow-friendly shape: merged document text + per-page texts +
typed spans + a status flag instead of an exception (the reference's
swallow-and-emit-empty pattern, ``pypdf2_extractor.py:41-48``, and the
meaningful-content check ``backend/src/tasks.py:228-249`` inverted into
``status='empty'``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Span:
    """Character-offset span into the final extracted text.

    Analog of the reference's ``Annotation.selection_start/selection_end``
    columns (``backend/src/models/database.py:99-102``) — offsets are into
    the *final normalized* ``ExtractResult.text``.
    ``kind`` in {"title", "heading", "paragraph", "list", "table", "page"}.
    """

    start: int
    end: int
    kind: str


@dataclass
class ExtractResult:
    text: str = ""                       # merged doc text (pages joined with "\f")
    pages: list[str] = field(default_factory=list)   # 1-based page order
    spans: list[Span] = field(default_factory=list)
    status: str = "ok"                   # ok | empty | error | unknown
    error: str = ""
    # per-page TABLE product, aligned with ``pages`` ("" = no table on that
    # page; [] = kernel has no table concept). The reference's pdfplumber
    # extractor emits a separate pipe-joined "TABLE" content key per page
    # alongside "COMBINED" (/root/reference/backend/src/extractors/
    # pdfplumber_extractor.py:30-47); rows " | "-joined, tables on one page
    # "\n\n"-joined — that exact format per element here.
    page_tables: list[str] = field(default_factory=list)

    @property
    def n_pages(self) -> int:
        return len(self.pages)

    def tables_aligned(self) -> list[str]:
        """``page_tables`` padded/truncated to exactly ``len(pages)``."""
        t = self.page_tables
        n = len(self.pages)
        return (t + [""] * n)[:n]

    @property
    def doc_tables(self) -> str:
        """Document-level TABLE column: per-page table strings joined with
        the same "\\f" page separator as ``text`` — or "" when no page has
        a table (so table-free docs stay cheap and obviously empty)."""
        t = self.tables_aligned()
        return "\f".join(t) if any(t) else ""
