"""PDF table-region detection + pipe-joined TABLE product.

Reference semantic: pdfplumber's per-page ``{"COMBINED": text, "TABLE":
tables}`` content dict (``/root/reference/backend/src/extractors/
pdfplumber_extractor.py:30-47``) — table rows ``" | "``-joined, rows
newline-joined, tables on one page ``"\\n\\n"``-joined, and the table
content ALSO present in the combined text.
"""

import random

from pdf_extractor_ray.kernels.pdf_extract import (
    _layout_page_parts,
    _run_text_ops,
    extract_pdf,
)


def _chunks(ops: bytes):
    return _run_text_ops(ops)


def _cell(x: float, y: float, s: str) -> bytes:
    return f"1 0 0 1 {x} {y} Tm".encode() + b" (" + s.encode() + b") Tj"


def _table_ops(rows: list[list[str]], x0=72, dx=150, y0=700, dy=14) -> bytes:
    ops = [b"BT /F1 12 Tf"]
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            ops.append(_cell(x0 + dx * c, y0 - dy * r, cell))
    ops.append(b"ET")
    return b" ".join(ops)


def test_exact_pipe_join():
    rows = [["alpha", "beta", "gamma"], ["one", "two", "three"]]
    text, tables = _layout_page_parts(_chunks(_table_ops(rows)))
    assert tables == "alpha | beta | gamma\none | two | three"
    # COMBINED text carries the same content as space-joined lines
    assert text == "alpha beta gamma\none two three"


def test_multiple_tables_one_page_double_newline_join():
    a = _table_ops([["a1", "a2"], ["a3", "a4"]], y0=700)
    # a non-tabular line between the two regions breaks the run
    mid = b"BT /F1 12 Tf 72 600 Td (plain prose line here) Tj ET"
    b = _table_ops([["b1", "b2"], ["b3", "b4"]], y0=500)
    _, tables = _layout_page_parts(_chunks(a + b"\n" + mid + b"\n" + b))
    assert tables == "a1 | a2\na3 | a4\n\nb1 | b2\nb3 | b4"


def test_single_row_is_not_a_table():
    _, tables = _layout_page_parts(_chunks(_table_ops([["x", "y", "z"]])))
    assert tables == ""


def test_misaligned_columns_break_the_run():
    a = _table_ops([["p", "q"]], y0=700)
    b = _table_ops([["r", "s"]], x0=110, y0=686)  # shifted 38 pts
    _, tables = _layout_page_parts(_chunks(a + b"\n" + b))
    assert tables == ""


def test_different_cell_counts_break_the_run():
    a = _table_ops([["p", "q", "r"]], y0=700)
    b = _table_ops([["s", "t"]], y0=686)
    _, tables = _layout_page_parts(_chunks(a + b"\n" + b))
    assert tables == ""


def test_word_gaps_do_not_split_cells():
    # two words per cell: the intra-cell gap is a word space (one space in
    # the cell text), not a cell boundary
    ops = [b"BT /F1 12 Tf"]
    for r in range(2):
        y = 700 - 14 * r
        for c in range(2):
            x = 72 + 200 * c
            ops.append(_cell(x, y, "ab"))
            # width(ab) = 0.5*12*2 = 12; put next word 6 pts later (gap 6
            # in (0.3*12, 2*12) -> word space)
            ops.append(_cell(x + 18, y, "cd"))
    ops.append(b"ET")
    _, tables = _layout_page_parts(_chunks(b" ".join(ops)))
    assert tables == "ab cd | ab cd\nab cd | ab cd"


def test_prose_page_has_no_table():
    ops = (
        b"BT /F1 12 Tf 72 700 Td (a normal sentence) Tj "
        b"0 -14 Td (another normal sentence) Tj ET"
    )
    _, tables = _layout_page_parts(_chunks(ops))
    assert tables == ""


def test_corpus_planted_tables_surface_in_extract():
    from pdf_extractor_ray.corpus import build_pdf

    hit = 0
    for seed in range(30):
        res = extract_pdf(build_pdf(random.Random(seed), 3, flate=True))
        assert res.status == "ok"
        assert len(res.tables_aligned()) == len(res.pages)
        for t in res.page_tables:
            if t:
                hit += 1
                for row in t.split("\n\n")[0].split("\n"):
                    assert " | " in row
    assert hit >= 3, "corpus should plant tables on ~30% of pages"


def test_doc_tables_page_alignment():
    """doc-level tables joins per-page strings with \\f so page k's tables
    sit between separators k-1 and k — same convention as text."""
    from pdf_extractor_ray.corpus import build_pdf

    for seed in range(30):
        res = extract_pdf(build_pdf(random.Random(seed), 4, flate=False))
        if any(res.page_tables):
            assert res.doc_tables.split("\f") == res.tables_aligned()
            break
    else:
        raise AssertionError("no planted table found")


def test_pdf_tables_pipeline_matches_local_oracle(ray_session):
    """queries()['pdf_tables'] over sf0.001 equals a driver-side
    recomputation with the same deterministic seeds, row for row."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.corpus import build_pdf
    from pdf_extractor_ray.pipelines.webpages import pdf_tables

    sf = "/root/testdata/sf0.001"
    got = (
        pdf_tables(sf)
        .to_pandas()
        .sort_values(["doc_id", "page_number"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for d in pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist():
        res = extract_pdf(build_pdf(random.Random(d), 1 + d % 3, bool(d % 2)))
        for pn, tbl in enumerate(res.tables_aligned(), start=1):
            if tbl:
                exp_rows.append((d, pn, tbl))
    assert len(got) == len(exp_rows) > 0
    exp_rows.sort()
    assert list(got["doc_id"]) == [r[0] for r in exp_rows]
    assert list(got["page_number"]) == [r[1] for r in exp_rows]
    assert list(got["table_text"]) == [r[2] for r in exp_rows]


def test_extract_batch_emits_tables_columns(ray_session):
    import pyarrow as pa

    from pdf_extractor_ray.corpus import build_pdf
    from pdf_extractor_ray.stages.extract import extract_batch

    payloads = [build_pdf(random.Random(s), 2, flate=False) for s in range(12)]
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(12)]),
            "warc_ts": pa.array([0] * 12, pa.timestamp("us", tz="UTC")),
            "lang": pa.array(["en"] * 12),
            "html": pa.array(payloads, pa.large_binary()),
        }
    )
    out = extract_batch(batch, emit_pages=True)
    assert "tables" in out.column_names and "page_tables" in out.column_names
    for pages, ptables in zip(
        out["pages"].to_pylist(), out["page_tables"].to_pylist()
    ):
        assert len(pages) == len(ptables)
    exp = [extract_pdf(p).doc_tables for p in payloads]
    assert out["tables"].to_pylist() == exp
    assert any(exp), "at least one planted table expected"
