"""HTML main-content extraction: boilerplate stripping via block-level
text-density / link-density scoring (Readability/trafilatura-style
heuristics, per BASELINE.json.north_star), stdlib-only (no lxml in this
environment — SURVEY.md §0), with a from-scratch regex tag scanner
(originally stdlib ``html.parser``; the scanner produces the identical
event stream — equivalence-checked over the full corpus — at ~2x speed).

Reference analog: the whole-document text conversion path
(``/root/reference/backend/src/extractors/markitdown_extractor.py:19-65`` —
one text per document) combined with the reference's "meaningful content"
notion (``backend/src/tasks.py:228-249``): a document whose kept blocks are
empty gets ``status='empty'`` instead of an exception.

Frozen byte-identity invariants (SURVEY.md §7.1):
  * drop subtrees: script/style/noscript/template/nav/header/footer/aside/
    form/iframe/svg/button/select/option/label/input/textarea + comments
  * blocks start at block-level tags; inline tags continue the current block
  * normalization per block: whitespace collapsed to single spaces, NFC,
    strip
  * keep a block iff it survives the density filter:
      heading: >=3 chars and link_density < 0.5
      other:   >=25 chars and link_density < 0.4
    (<title> is always kept first when non-empty, kind='title')
  * final text = kept blocks joined with "\n\n"
  * spans = (start, end, kind) offsets into the final text, one per block
"""

from __future__ import annotations

import re
import unicodedata
from html import unescape as _unescape

from .result import ExtractResult, Span

DROP_TAGS = frozenset(
    "script style noscript template nav header footer aside form iframe "
    "svg button select option label input textarea object embed applet".split()
)

# Block-level boundaries (entering/leaving one flushes the current block).
BLOCK_TAGS = frozenset(
    "p div section article main ul ol li table thead tbody tr td th "
    "pre blockquote h1 h2 h3 h4 h5 h6 dl dt dd figure figcaption caption "
    "body address fieldset hr center".split()
)

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

_WS_RE = re.compile(r"\s+")

MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 3
MAX_LINK_DENSITY = 0.4
MAX_HEADING_LINK_DENSITY = 0.5


def _kind_for(tag: str) -> str:
    if tag in _HEADINGS:
        return "heading"
    if tag in ("li", "dt", "dd"):
        return "list"
    if tag in ("td", "th", "caption"):
        return "table"
    return "paragraph"


def normalize_text(raw: str) -> str:
    """Collapse whitespace to single spaces, NFC-normalize, strip.
    ``" ".join(raw.split())`` is collapse+strip in one C pass; its
    whitespace set is codepoint-identical to regex ``\\s`` (verified
    exhaustively over U+0000..U+10FFFF). NFC is the identity on pure-ASCII
    input, so it is skipped there (``str.isascii`` is a cheap C call; most
    corpus blocks are ASCII)."""
    collapsed = " ".join(raw.split())
    if collapsed.isascii():
        return collapsed
    return unicodedata.normalize("NFC", collapsed).strip()


# -- fast HTML scanner ----------------------------------------------------
# Replaces stdlib html.parser (measured ~45% of whole-kernel CPU): one
# compiled regex matches any tag construct; raw-text elements
# (script/style/title/textarea) skip straight to their close tag; data
# segments are entity-decoded only when '&' is present. Malformed input is
# salvaged byte-at-a-time (a '<' that opens no recognizable construct is
# literal text), never raised.

_TAG_RE = re.compile(
    r"<(?:"
    r"(?P<comment>!--)"
    r"|(?P<decl>![^>]*>)"
    r"|(?P<pi>\?[^>]*>?)"
    r"|/(?P<end>[a-zA-Z][-a-zA-Z0-9:._]*)[^>]*>"
    r"|(?P<start>[a-zA-Z][-a-zA-Z0-9:._]*)(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>"
    r")",
    re.S,
)

_RAWTEXT_TAGS = ("script", "style", "textarea", "title")
# the lookahead anchors the tag-name boundary: without it '</titlefoo>'
# (or '</title-x>', a distinct custom-element name) would close a <title>
# element earlier than html.parser does
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</{t}(?=[\s/>])[^>]*>", re.I) for t in _RAWTEXT_TAGS
}


def _scan_html(text: str, collector: "_BlockCollector") -> None:
    """Drive collector callbacks over ``text`` (html.parser event parity
    for the constructs the collector consumes)."""
    i, n = 0, len(text)
    find_lt = text.find
    while i < n:
        lt = find_lt("<", i)
        if lt == -1:
            collector.handle_data_raw(text[i:])
            break
        if lt > i:
            collector.handle_data_raw(text[i:lt])
        m = _TAG_RE.match(text, lt)
        if m is None:
            collector.handle_data_raw("<")
            i = lt + 1
            continue
        i = m.end()
        lg = m.lastgroup  # one attribute read instead of 5 group() calls
        if lg == "comment":
            # degenerate complete comments per the HTML spec: <!--> <!--->
            if text.startswith(">", i):
                i += 1
                continue
            if text.startswith("->", i):
                i += 2
                continue
            close = text.find("-->", i)
            i = n if close == -1 else close + 3
            continue
        if lg == "decl" or lg == "pi":
            continue
        if lg == "end":
            collector.handle_endtag(m.group("end").lower())
            continue
        tag = m.group("start").lower()
        attrs = m.group("attrs") or ""
        stripped = attrs.rstrip()
        if stripped.endswith("/") and (
            len(stripped) == 1 or stripped[-2] in " \t\n\r\"'"
        ):
            # self-closing only when '/' is a standalone token — in
            # <a href=http://x.com/> the slash belongs to the unquoted
            # attribute value (html.parser semantics) and this IS a start tag
            collector.handle_startendtag(tag, attrs)
            continue
        if tag in _RAWTEXT_TAGS:
            cm = _RAWTEXT_CLOSE[tag].search(text, i)
            collector.handle_starttag(tag, attrs)
            raw = text[i : cm.start()] if cm else text[i:]
            if raw:
                collector.handle_data_raw(raw)
            collector.handle_endtag(tag)
            i = cm.end() if cm else n
            continue
        collector.handle_starttag(tag, attrs)


class _BlockCollector:
    """Streaming block collector; lenient on malformed HTML by design
    (the scanner treats unrecognizable '<' as literal text)."""

    def __init__(self) -> None:
        self.blocks: list[tuple[str, str, float]] = []  # (kind, text, link_density)
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._kind = "paragraph"
        self._drop_depth = 0
        self._link_depth = 0
        self._in_title = False
        self._title_parts: list[str] = []
        self.title = ""

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        parts = self._parts
        if not parts:  # nothing buffered -> counters are already zero
            return
        raw = "".join(parts)
        # whitespace-only buffers (the inter-tag newlines between blocks)
        # normalize to "" anyway; isspace() is one C call vs join+split
        if not raw.isspace():
            text = normalize_text(raw)
            if text:
                density = self._link_chars / self._chars if self._chars else 0.0
                self.blocks.append((self._kind, text, density))
        self._parts = []
        self._chars = 0
        self._link_chars = 0

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            # a nested/unclosed <a> auto-closes the previous one (HTML5);
            # += here would poison every later block with link_density 1.0
            self._link_depth = 1
            return
        if tag == "br":
            self._parts.append(" ")
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._kind = _kind_for(tag)
            # block boundary implicitly closes inline <a> (HTML5 agency);
            # without this an unclosed anchor discards the whole document
            self._link_depth = 0

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "br" and not self._drop_depth:
            self._parts.append(" ")
        # void drop-tags (e.g. <input/>) open and close in one event: no-op

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            if self._link_depth:
                self._link_depth -= 1
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self._kind = "paragraph"

    def handle_data_raw(self, data: str) -> None:
        """Raw text segment; entity-decode lazily (only when needed)."""
        if self._drop_depth:
            return
        if "&" in data:
            data = _unescape(data)
        if self._in_title:
            self._title_parts.append(data)
            return
        self._parts.append(data)
        n = len(data)
        self._chars += n
        if self._link_depth:
            self._link_chars += n

    def close(self) -> None:
        self._flush()
        self.title = normalize_text("".join(self._title_parts))


def _keep(kind: str, text: str, density: float) -> bool:
    if kind == "heading":
        return len(text) >= MIN_HEADING_CHARS and density < MAX_HEADING_LINK_DENSITY
    return len(text) >= MIN_BLOCK_CHARS and density < MAX_LINK_DENSITY


# meta-charset declaration in the document head (HTML5 <meta charset=...>
# or the legacy http-equiv Content-Type form); scanned over the first 2 KiB
# of raw bytes like browsers' pre-scan. Only consulted when strict UTF-8
# decode fails, so pure-UTF-8 corpora are byte-for-byte unaffected.
_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I
)


def _decode_html(payload: bytes) -> str:
    """Strict UTF-8 first; on failure honor a declared meta charset (any
    stdlib codec); last resort UTF-8 with replacement (legacy behavior)."""
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        m = _CHARSET_RE.search(payload[:2048])
        if m:
            enc = m.group(1).decode("ascii", "ignore").strip().lower()
            if enc and enc not in ("utf-8", "utf8"):
                try:
                    return payload.decode(enc)
                except (LookupError, UnicodeDecodeError):
                    pass
        return payload.decode("utf-8", errors="replace")


def extract_html(payload: bytes) -> ExtractResult:
    """bytes -> main-content text + spans. Never raises; malformed input
    yields a best-effort salvage (status='empty' when nothing survives)."""
    try:
        text = _decode_html(payload)
        parser = _BlockCollector()
        _scan_html(text, parser)
        parser.close()

        kept: list[tuple[str, str]] = []
        if parser.title:
            kept.append(("title", parser.title))
        for kind, block_text, density in parser.blocks:
            if _keep(kind, block_text, density):
                kept.append((kind, block_text))

        pieces: list[str] = []
        spans: list[Span] = []
        offset = 0
        for kind, block_text in kept:
            if pieces:
                offset += 2  # the "\n\n" separator
            spans.append(Span(offset, offset + len(block_text), kind))
            pieces.append(block_text)
            offset += len(block_text)
        full = "\n\n".join(pieces)
        status = "ok" if full else "empty"
        return ExtractResult(text=full, pages=[full], spans=spans, status=status)
    except Exception as exc:  # pragma: no cover - html.parser is lenient
        return ExtractResult(text="", pages=[""], status="error", error=f"html:{exc!r}"[:200])


# -------------------------------------------------------------------------
# Link extraction — the link-graph half of web-page processing: every
# <a href=...> with its anchor text, in document order. Shares _scan_html
# (one scanner, two collectors) so tag/rawtext/comment semantics are
# identical to the text extractor; anchors inside <script>/<style> bodies
# can't exist (rawtext is data, never tags). HTML5 agency mirrored from
# _BlockCollector: a nested/unclosed <a> auto-closes the previous one, and
# a block boundary closes an inline <a>.
# -------------------------------------------------------------------------

_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+))""", re.I
)


class _LinkCollector:
    def __init__(self) -> None:
        self.links: list[tuple[str, str]] = []  # (href, anchor_text)
        self._href: str | None = None
        self._parts: list[str] = []

    def _close_anchor(self) -> None:
        if self._href is not None:
            self.links.append(
                (self._href, normalize_text("".join(self._parts)))
            )
        self._href = None
        self._parts = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._close_anchor()
            m = _HREF_RE.search(attrs or "")
            if m:
                href = m.group(1) or m.group(2) or m.group(3) or ""
                if "&" in href:
                    href = _unescape(href)
                href = href.strip()
                if href:
                    self._href = href
        elif tag in BLOCK_TAGS:
            self._close_anchor()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":  # self-closing <a/>: empty anchor text
            self.handle_starttag(tag, attrs)
            self._close_anchor()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close_anchor()

    def handle_data_raw(self, data: str) -> None:
        if self._href is not None:
            if "&" in data:
                data = _unescape(data)
            self._parts.append(data)

    def close(self) -> None:
        self._close_anchor()


def extract_links(payload: bytes) -> list[tuple[str, str]]:
    """bytes -> ordered (href, anchor_text) pairs. Never raises; undecodable
    or non-HTML input yields []."""
    try:
        text = _decode_html(payload)
        c = _LinkCollector()
        _scan_html(text, c)
        c.close()
        return c.links
    except Exception:  # pragma: no cover - scanner is lenient by design
        return []
