"""Skew-split of oversized PDFs: byte-identical to the whole-document
kernel (FIXTURES.md §4.5)."""

import random

import pyarrow as pa


def _big_pdf(n_pages: int, seed: int = 7) -> bytes:
    from pdf_extractor_ray.corpus import build_pdf

    return build_pdf(random.Random(seed), n_pages=n_pages, flate=True)


def test_page_count_and_chunk_kernel():
    from pdf_extractor_ray.kernels.pdf_extract import (
        extract_pdf,
        extract_pdf_pages,
        pdf_page_count,
    )

    payload = _big_pdf(37)
    assert pdf_page_count(payload) == 37
    whole = extract_pdf(payload)
    # chunked page extraction reproduces the whole-doc pages exactly
    pairs = []
    for lo in range(0, 37, 10):
        pairs.extend(extract_pdf_pages(payload, lo, min(lo + 10, 37)))
    assert [p[0] for p in pairs] == whole.pages
    assert [p[1] for p in pairs] == whole.tables_aligned()


def test_skew_split_matches_whole_doc(ray_session):
    from pdf_extractor_ray.kernels.pdf_extract import extract_pdf
    from pdf_extractor_ray.stages.skew import extract_pdf_skew_split

    payload = _big_pdf(61)
    whole = extract_pdf(payload)
    split = extract_pdf_skew_split(payload, pages_per_chunk=8)
    assert split.text == whole.text
    assert split.pages == whole.pages
    assert split.spans == whole.spans
    assert split.status == whole.status
    assert split.page_tables == whole.page_tables


def test_skew_split_corrupt_flags_not_raises(ray_session):
    from pdf_extractor_ray.stages.skew import extract_pdf_skew_split

    res = extract_pdf_skew_split(b"%PDF-1.4 garbage" + b"\x00" * 100)
    assert res.status in ("error", "empty")
    assert res.text == ""


def test_pipeline_with_tiny_threshold_matches_golden(ray_session, small_corpus):
    """Force every PDF through the skew path; golden bytes must not move."""
    import pyarrow.parquet as pq
    import ray

    from pdf_extractor_ray.pipelines.extract import extracted_dataset

    ds = extracted_dataset(
        small_corpus["corpus"],
        n_partitions=8,
        concurrency=2,
        skew_threshold_bytes=512,  # far below every pdf payload
    )
    t = pa.concat_tables([x for x in ray.get(ds.to_arrow_refs()) if x.num_rows])
    t = t.sort_by("url")
    gold = pq.read_table(small_corpus["golden"] + "/extracted.parquet").sort_by("url")
    assert t["url"].to_pylist() == gold["url"].to_pylist()
    assert t["extracted_text"].to_pylist() == gold["extracted_text"].to_pylist()
    assert t["status"].to_pylist() == gold["status"].to_pylist()
