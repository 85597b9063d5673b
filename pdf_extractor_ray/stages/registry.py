"""Extractor registry — the user-extension surface.

Reference analog: the ABC ``PDFExtractorInterface``
(``/root/reference/backend/src/interface.py:5-55``) + ``READER_MAP`` with
factory ``get_reader()`` (``backend/src/factory.py:16-42``; commented-out
entries at ``factory.py:19,29-30`` show drop-in registration as the
intended plugin path). Here an extractor is a callable CLASS usable
directly as a ``map_batches`` actor-pool stage:

* ``info() -> dict`` (classmethod) — name/kind/cost metadata, mirroring
  ``get_information`` (``interface.py:8-17``);
* ``__call__(batch: pa.Table) -> pa.Table`` — the per-batch transform;
* constructed once per actor (state amortization, SURVEY.md §2.3).

``build_stage(ds, name, ...)`` turns a registry entry into a pipeline
stage. External-API extractors from the reference (Textract, OpenAI
Vision, Mathpix, LlamaParse — all network services) register as STUBS:
the Ray-side plumbing (schema, actor signature, batching) is real and
tested, the service call raises ``NotImplementedError`` unless a
deterministic fake is enabled; rows come back flagged, never thrown
(``backend/src/tasks.py:290-340`` failure path semantics).

Deliberately not carried (dead in the reference, documented for parity
audits):

* the ``TITLES``/``OCR`` page-content keys — emitted only by
  ``unstructured_extractor.py:92-97`` / ``nanonets_extractor.py:193-205``,
  both commented out of ``READER_MAP`` (``factory.py:19,29-30``), so no
  live reference path produces them; the ``page_contents`` vocabulary
  here covers the live keys (COMBINED/TABLE/MARKDOWN/LATEX/TEXT).
* the webhook contract (``interface.py:41-54``) — declared but every
  extractor returns ``supports_webhook() == False``, so the poll loop
  (modeled by ``poll_schedule`` below) is the only async path actually
  exercised; a webhook would map to a Ray Serve ingress + queue, outside
  this batch engine's scope.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data as rd

from .extract import DocumentExtractor

EXTRACTOR_REGISTRY: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        cls.registry_name = name
        EXTRACTOR_REGISTRY[name] = cls
        return cls

    return deco


def get_extractor(name: str) -> type:
    """Factory — reference ``get_reader`` (``factory.py:34-42``): unknown
    names raise, like its ValueError on unmapped types."""
    try:
        return EXTRACTOR_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown extractor {name!r}; registered: {sorted(EXTRACTOR_REGISTRY)}"
        ) from None


def build_stage(
    ds: rd.Dataset,
    name: str,
    *,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] = 2,
    **ctor_kwargs,
) -> rd.Dataset:
    """Registry entry -> actor-pool map_batches stage."""
    cls = get_extractor(name)
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


@register("main_content")
class MainContentExtractor(DocumentExtractor):
    """The flagship html/pdf kernel stage (stages/extract.py)."""

    @classmethod
    def info(cls) -> dict:
        return {
            "name": "main_content",
            "kind": "local",
            "formats": ["html", "pdf"],
            "cost_per_page": 0.0,  # reference rate table tasks.py:88-101
            # simple local lib budget (constants.py:74-78: 1 retry / 5 s)
            "max_retries": 1,
            "retry_countdown_s": 5,
        }


@register("markdown_pages")
class MarkdownPagesExtractor:
    """The reference's LlamaParse page-splitter wired as a REAL local
    engine (``/root/reference/backend/src/extractors/llamaparse.py:137-222``:
    'PAGE N:' markers win, '\\n---\\n' rules split next, else everything is
    page 1). The payload decodes as UTF-8 markdown/plain text; pages join
    with '\\f' like the main kernel."""

    def __init__(self) -> None:
        from ..functions.textops import split_markdown_pages

        self._split = split_markdown_pages

    @classmethod
    def info(cls) -> dict:
        return {
            "name": "markdown_pages",
            "kind": "local",
            "formats": ["markdown", "text", "html"],
            "cost_per_page": 0.003,  # llamaparse rate, tasks.py:95
            # medium budget (constants.py:79-86: 2 retries / 10 s)
            "max_retries": 2,
            "retry_countdown_s": 10,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        texts, statuses, n_pages = [], [], []
        for p in batch["html"].to_pylist():
            md = (p or b"").decode("utf-8", errors="replace")
            pages = self._split(md)
            joined = "\f".join(pages[k] for k in sorted(pages))
            texts.append(joined)
            statuses.append("ok" if joined.strip() else "empty")
            n_pages.append(len(pages))
        return pa.table(
            {
                "url": urls,
                "extracted_text": pa.array(texts, pa.large_string()),
                "status": pa.array(statuses, pa.string()),
                "n_pages": pa.array(n_pages, pa.int32()),
                "extractor": pa.array(
                    ["markdown_pages"] * batch.num_rows, pa.string()
                ),
            }
        )


# --------------------------------------------------------------------------
# Async-poll/backoff model for the external-service extractors. The
# reference polls its async providers in two shapes: a flat 5 s sleep loop
# in the Celery task (``tasks.py:216-225``) and exponential backoff in the
# Textract reader (``textract_extractor.py:62-81``: delay starts at 1.5 s,
# x1.5 per attempt, capped at 10 s, looping until SUCCEEDED/FAILED). The
# reference loop is UNBOUNDED; the model below adds a configurable poll
# budget (``max_polls``) as the timeout guard a production deployment
# needs, and is pure arithmetic — no wall-clock sleeps — so the
# retry/breaker interplay with a slow provider is deterministic and
# testable.
# --------------------------------------------------------------------------

POLL_INITIAL_MS = 1_500
POLL_FACTOR = 1.5
POLL_CAP_MS = 10_000
POLL_MAX_DEFAULT = 8  # budget: 49.78 s of simulated waiting


def poll_schedule(
    duration_ms: int,
    *,
    initial_ms: int = POLL_INITIAL_MS,
    factor: float = POLL_FACTOR,
    cap_ms: int = POLL_CAP_MS,
    max_polls: int = POLL_MAX_DEFAULT,
) -> tuple[int, int, bool]:
    """Walk the backoff schedule until a job of ``duration_ms`` would
    report done or the poll budget runs out.

    Returns ``(n_polls, waited_ms, timed_out)``."""
    waited = 0
    sleep = initial_ms
    for k in range(1, max_polls + 1):
        waited += sleep
        if waited >= duration_ms:
            return k, waited, False
        sleep = min(int(sleep * factor), cap_ms)
    return max_polls, waited, True


class _StubServiceExtractor:
    """Shared shape for external-service extractors: real batching/schema,
    stubbed service call. With ``fake=True`` a deterministic fake result is
    produced (seeded by payload hash) so pipelines exercise the full
    dataflow in tests; with ``fake=False`` rows are flagged
    ``status='stub_unavailable'`` (this sandbox has no network).

    ``sim_latency=True`` additionally runs every fake job through the
    async-poll/backoff model above: each payload's simulated job duration
    is hash-derived (or forced via ``slow_ms`` — the slow-provider knob),
    jobs that exhaust the poll budget come back ``status='timeout'``, and
    an optional row-count circuit breaker (the same ``_Breaker`` as the
    flagship pipeline, reference 5-failures/300 s semantics
    ``tasks.py:126-151``) opens under consecutive timeouts so queued rows
    skip the provider entirely (``status='breaker_open'``) instead of
    paying the full poll budget each."""

    service = "unknown"

    def __init__(
        self,
        fake: bool = False,
        sim_latency: bool = False,
        slow_ms: int | None = None,
        max_polls: int = POLL_MAX_DEFAULT,
        breaker_threshold: int = 0,
        breaker_cooldown: int = 16,
    ):
        self.fake = fake
        self.sim_latency = sim_latency
        self.slow_ms = slow_ms
        self.max_polls = max_polls
        if breaker_threshold:
            from .extract import _Breaker

            self.breaker = _Breaker(breaker_threshold, breaker_cooldown)
        else:
            self.breaker = None

    def _fake_text(self, payload: bytes | None) -> str:
        h = hashlib.md5(payload or b"").hexdigest()
        return f"[{self.service}-fake:{h[:12]}]"

    def _sim_duration_ms(self, payload: bytes | None) -> int:
        if self.slow_ms is not None:
            return self.slow_ms
        h = hashlib.md5((payload or b"") + b"|job-duration").digest()
        # 0-60 s simulated job: ~83% land inside the default poll budget
        return int.from_bytes(h[4:8], "little") % 60_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["html"].to_pylist()
        if self.fake:
            texts = [self._fake_text(p) for p in payloads]
            status = ["ok"] * len(texts)
            if self.sim_latency:
                waits: list[int] = []
                for i, p in enumerate(payloads):
                    if self.breaker is not None and self.breaker.should_skip():
                        texts[i], status[i] = "", "breaker_open"
                        waits.append(0)  # skipped rows never hit the provider
                        continue
                    _, waited, timed_out = poll_schedule(
                        self._sim_duration_ms(p), max_polls=self.max_polls
                    )
                    waits.append(waited)
                    if timed_out:
                        texts[i], status[i] = "", "timeout"
                    if self.breaker is not None:
                        self.breaker.record(failed=timed_out)
        else:
            texts = [""] * len(payloads)
            status = ["stub_unavailable"] * len(payloads)
        cols = {
            "url": batch["url"],
            "extracted_text": pa.array(texts, pa.large_string()),
            "status": pa.array(status, pa.string()),
            "extractor": pa.array(
                [self.registry_name] * len(texts), pa.string()
            ),
        }
        if self.fake and self.sim_latency:
            cols["sim_wait_ms"] = pa.array(waits, pa.int64())
        return pa.table(cols)


@register("ocr_tesseract")
class TesseractStub(_StubServiceExtractor):
    """OCR stage shape (``tesseract_extractor.py:22-53``: rasterize at
    dpi=200 -> OCR per page). No tesseract binary in this image."""

    service = "tesseract"

    @classmethod
    def info(cls) -> dict:
        return {"name": "ocr_tesseract", "kind": "stub", "formats": ["pdf", "image"],
                "cost_per_page": 0.0,
                "max_retries": 2, "retry_countdown_s": 10}  # constants.py:79-86


@register("vision_api")
class VisionApiStub(_StubServiceExtractor):
    """OpenAI-Vision stage shape (``openai_vision_extractor.py:29-164``:
    page png -> base64 -> chat completion). Network service; stub."""

    service = "vision"

    @classmethod
    def info(cls) -> dict:
        return {"name": "vision_api", "kind": "stub", "formats": ["pdf", "image"],
                "cost_per_page": 0.005,  # gpt-4o-mini rate, tasks.py:92
                "max_retries": 3, "retry_countdown_s": 30}  # API budget, constants.py:87-95


@register("mathpix")
class MathpixStub(_StubServiceExtractor):
    """Mathpix OCR/LaTeX stage shape (``mathpix_extractor.py:103-163``:
    async pdf job -> lines.json -> per-page line sort -> text_display
    joined per page, stored under the ``LATEX`` content key). Network
    service; stub. Its rows surface as the LATEX key in the per-page
    content-key long table (pipelines/fanout.page_contents_batch)."""

    service = "mathpix"

    @classmethod
    def info(cls) -> dict:
        return {"name": "mathpix", "kind": "stub", "formats": ["pdf", "image"],
                "content_key": "LATEX",
                "cost_per_page": 0.001,  # default rate bucket, tasks.py:103
                "max_retries": 3, "retry_countdown_s": 30}  # API budget


@register("textract")
class TextractStub(_StubServiceExtractor):
    """AWS Textract stage shape (``textract_extractor.py:26-97``: async job
    + LINE-block grouping by page). Network service; stub."""

    service = "textract"

    @classmethod
    def info(cls) -> dict:
        return {"name": "textract", "kind": "stub", "formats": ["pdf", "image"],
                "cost_per_page": 0.0015,
                "max_retries": 3, "retry_countdown_s": 30}  # API budget, constants.py:87-95
