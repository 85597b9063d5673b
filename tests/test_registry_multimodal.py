"""Extension surface (registry) + multimodal plumbing tests."""

import pyarrow as pa
import pytest


def test_registry_contents():
    from pdf_extractor_ray.stages.registry import EXTRACTOR_REGISTRY, get_extractor

    assert {"main_content", "ocr_tesseract", "vision_api", "textract"} <= set(
        EXTRACTOR_REGISTRY
    )
    for name, cls in EXTRACTOR_REGISTRY.items():
        info = cls.info()
        assert info["name"] == name
        assert info["kind"] in ("local", "stub")
    with pytest.raises(ValueError, match="unknown extractor"):
        get_extractor("nope")


def test_stub_extractor_flags_not_throws(ray_session, small_corpus):
    import ray

    from pdf_extractor_ray.pipelines.extract import read_pages
    from pdf_extractor_ray.stages.registry import build_stage

    ds = read_pages(small_corpus["corpus"]).limit(32)
    out = build_stage(ds, "ocr_tesseract", concurrency=2)
    t = pa.concat_tables([x for x in ray.get(out.to_arrow_refs()) if x.num_rows])
    assert set(t["status"].to_pylist()) == {"stub_unavailable"}
    assert set(t["extractor"].to_pylist()) == {"ocr_tesseract"}


def test_stub_extractor_fake_deterministic(ray_session, small_corpus):
    import ray

    from pdf_extractor_ray.pipelines.extract import read_pages
    from pdf_extractor_ray.stages.registry import build_stage

    def run():
        ds = read_pages(small_corpus["corpus"]).limit(32)
        out = build_stage(ds, "vision_api", concurrency=2, fake=True)
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_rows]
        )
        return t.sort_by("url")

    a, b = run(), run()
    assert a["extracted_text"].to_pylist() == b["extracted_text"].to_pylist()
    assert all(s == "ok" for s in a["status"].to_pylist())


def test_media_stages(ray_session):
    import ray
    import ray.data as rd

    from pdf_extractor_ray.stages.multimodal import (
        FrameSample,
        ImageDecode,
        ImageEmbed,
        media_pipeline,
        synthetic_media_table,
    )

    media = synthetic_media_table(30)
    ds = rd.from_arrow(media)

    dec = media_pipeline(ds, ImageDecode, concurrency=2)
    t = pa.concat_tables([x for x in ray.get(dec.to_arrow_refs()) if x.num_rows])
    assert t.num_rows == 30
    assert t.schema.field("thumb").type == pa.large_binary()

    emb = media_pipeline(ds, ImageEmbed, concurrency=2, dim=32)
    t2 = pa.concat_tables([x for x in ray.get(emb.to_arrow_refs()) if x.num_rows])
    assert len(t2["embedding"][0].as_py()) == 32

    vids = rd.from_arrow(media.filter(
        pa.compute.equal(media["media_type"], "video")
    ))
    fs = media_pipeline(vids, FrameSample, concurrency=2, k=3)
    t3 = pa.concat_tables([x for x in ray.get(fs.to_arrow_refs()) if x.num_rows])
    assert t3.num_rows == 10 * 3  # flat-map shape: 3 frames per video


def test_media_real_decode_raises():
    from pdf_extractor_ray.stages.multimodal import ImageDecode, synthetic_media_table

    with pytest.raises(NotImplementedError):
        ImageDecode(decode_real=True)(synthetic_media_table(2))
