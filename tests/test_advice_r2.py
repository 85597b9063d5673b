"""Regression tests for the round-2 ADVICE findings: empty-input guards
on collect()-dereferencing ops, fail-loud orphan detection in
trade_components, and the web_to_training doc-id recovery (covered by the
null-assert inside the pipeline; the slice-to-end behavior is pinned
here on the kernel expression)."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _empty_like(src: str, dst: str) -> None:
    pq.write_table(pq.read_table(src).slice(0, 0), dst)


@pytest.fixture()
def empty_sf(tmp_path):
    """sf dir whose documents and events tables are schema-correct but
    EMPTY (the all-empty-dataset crash class from ADVICE r2)."""
    d = tmp_path / "empty_sf"
    d.mkdir()
    for t in ("documents", "events"):
        _empty_like(f"{SF}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def test_validate_docs_empty_input(ray_session, empty_sf):
    from pdf_extractor_ray.functions.textops import validate_docs

    out = validate_docs(empty_sf)
    assert out.num_rows == 4  # all four rules reported, zero violations
    assert pc.sum(out["violations"]).as_py() == 0


def test_nb_lang_classify_empty_input(ray_session, empty_sf):
    from pdf_extractor_ray.functions.textops import nb_lang_classify

    out = nb_lang_classify(empty_sf)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "lang", "pred_lang"}


def test_value_mad_by_type_empty_input(ray_session, empty_sf):
    from pdf_extractor_ray.functions.relational import value_mad_by_type

    out = value_mad_by_type(empty_sf)
    assert out.num_rows == 0
    assert out.column_names == ["event_type", "mad_c"]


def test_trade_components_orphan_lineitem_fails_loud(ray_session, tmp_path):
    """An orphan lineitem (l_orderkey absent from orders) must raise, not
    silently join to the wrong customer (ADVICE r2, relational.py)."""
    from pdf_extractor_ray.functions.relational import trade_components

    d = tmp_path / "orphan_sf"
    d.mkdir()
    for t in ("orders", "lineitem", "customer", "supplier"):
        shutil.copy(f"{SF}/{t}.parquet", str(d / f"{t}.parquet"))
    li = pq.read_table(str(d / "lineitem.parquet"))
    orphan = {}
    for name in li.column_names:
        col = li[name]
        if name == "l_orderkey":
            orphan[name] = pa.array([999_999_999], col.type)
        elif name == "l_quantity":
            # above min_qty so the orphan row enters the edge build
            orphan[name] = pa.array([50], col.type)
        else:
            orphan[name] = col.slice(0, 1).combine_chunks()
    pq.write_table(
        pa.concat_tables([li, pa.table(orphan).cast(li.schema)]),
        str(d / "lineitem.parquet"),
    )
    with pytest.raises(Exception, match="missing orderkey"):
        trade_components(str(d))
