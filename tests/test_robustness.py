"""Property-based robustness: kernels never raise, whatever the bytes
(the reference's swallow-and-flag contract, pypdf2_extractor.py:41-48),
plus circuit-breaker semantics (tasks.py:126-151)."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_document_never_raises(payload):
    from pdf_extractor_ray.kernels import extract_document

    ctype, res = extract_document(payload)
    assert ctype in ("html", "pdf", "empty", "unknown")
    assert res.status in ("ok", "empty", "error", "unknown")
    assert isinstance(res.text, str)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_sniff_vectorized_matches_scalar(payload):
    """The vectorized sniff (stages) must agree with the scalar kernel
    (oracle path) on every input."""
    from pdf_extractor_ray.kernels.sniff import sniff_bytes
    from pdf_extractor_ray.stages.sniff import sniff_table

    t = pa.table({"html": pa.array([payload], pa.large_binary())})
    assert sniff_table(t)[0].as_py() == sniff_bytes(payload)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=500))
def test_html_kernel_handles_arbitrary_text(text):
    from pdf_extractor_ray.kernels.html_extract import extract_html

    res = extract_html(("<html><body><p>" + text).encode("utf-8", "ignore"))
    assert res.status in ("ok", "empty", "error")


def test_circuit_breaker_opens_and_resets():
    """After `threshold` consecutive kernel errors the actor stops parsing
    and flags rows breaker_open; a success resets (reference thresholds:
    5 failures / cooldown, constants.py:98-99)."""
    from pdf_extractor_ray.stages.extract import extract_batch, _Breaker

    corrupt = b"%PDF-1.4 garbage\x00\x01\x02"
    ok_html = b"<html><body><p>hello world this is fine text content</p></body></html>"

    breaker = _Breaker(threshold=3)
    bad = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(5)]),
            "warc_ts": pa.array([0] * 5, pa.timestamp("us", tz="UTC")),
            "lang": pa.array(["en"] * 5),
            "html": pa.array([corrupt] * 5, pa.large_binary()),
        }
    )
    out = extract_batch(bad, breaker=breaker)
    statuses = out["status"].to_pylist()
    assert statuses[:3] == ["error", "error", "error"]
    assert statuses[3:] == ["breaker_open", "breaker_open"]

    # a fresh breaker passes good rows and a success resets the counter
    breaker = _Breaker(threshold=3)
    mixed = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d"]),
            "warc_ts": pa.array([0] * 4, pa.timestamp("us", tz="UTC")),
            "lang": pa.array(["en"] * 4),
            "html": pa.array(
                [corrupt, corrupt, ok_html, corrupt], pa.large_binary()
            ),
        }
    )
    out = extract_batch(mixed, breaker=breaker)
    assert out["status"].to_pylist() == ["error", "error", "ok", "error"]
    assert breaker.consecutive == 1  # reset by the success, then one failure
