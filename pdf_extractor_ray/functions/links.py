"""Link-graph operators over web pages: per-page anchor extraction and the
host-level edge list — the other core Common-Crawl-style product beside
main-content text (WAT-file analog). Reference analog: none (the reference
extracts text only); built on the same HTML scanner as the text kernel so
tag semantics cannot drift between the two products.

Scale shape: link extraction is a stateless flat-map (`map_batches`, one
scanner pass per page, no shuffle); the host-graph aggregate is the
standard partial-then-combine exchange over tiny (src_host, dst_host)
partials (functions/agg.py) — edge cardinality, never page cardinality,
crosses the wire.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import pyarrow as pa

import ray.data as rd

from ..kernels.html_extract import extract_links as _kernel_links
from ..kernels.sniff import sniff_bytes
from ..pipelines.webpages import docs_to_pages
from .agg import grouped_sum, partial_group_agg


def _pages(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(docs_to_pages, batch_format="pyarrow")


def links_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, link_idx, href, anchor) long table; non-HTML
    payloads yield no rows (sniff gate, same classifier as the pipeline)."""
    urls: list[str] = []
    idxs: list[int] = []
    hrefs: list[str] = []
    anchors: list[str] = []
    for u, payload in zip(
        batch["url"].to_pylist(), batch["html"].to_pylist()
    ):
        if payload is None or sniff_bytes(payload) != "html":
            continue
        for i, (href, anchor) in enumerate(_kernel_links(payload)):
            urls.append(u)
            idxs.append(i)
            hrefs.append(href)
            anchors.append(anchor)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "link_idx": pa.array(idxs, pa.int64()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )


def extract_links(sf_dir: str) -> rd.Dataset:
    """Per-page ordered anchor list over the synthesized pages corpus."""
    return _pages(sf_dir).map_batches(links_batch, batch_format="pyarrow")


def _host(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def link_hosts(sf_dir: str) -> rd.Dataset:
    """Host-level link graph: (src_host, dst_host, n_links) with relative
    hrefs resolved against the page url (RFC 3986 urljoin)."""

    def partial(batch: pa.Table) -> pa.Table:
        links = links_batch(batch)
        src = [_host(u) for u in links["url"].to_pylist()]
        dst = [
            _host(urljoin(u, h))
            for u, h in zip(links["url"].to_pylist(), links["href"].to_pylist())
        ]
        t = pa.table(
            {
                "src_host": pa.array(src, pa.string()),
                "dst_host": pa.array(dst, pa.string()),
                "n_links": pa.array([1] * links.num_rows, pa.int64()),
            }
        )
        return partial_group_agg(
            t, keys=["src_host", "dst_host"], aggs=[("n_links", "sum")]
        )

    return grouped_sum(
        _pages(sf_dir),
        keys=["src_host", "dst_host"],
        partial=partial,
        sum_cols=["n_links"],
    )
