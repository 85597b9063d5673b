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

    @property
    def n_pages(self) -> int:
        return len(self.pages)
