"""HTML kernel unit tests — structure assertions mirroring the reference's
mocked extractor tests (/root/reference/backend/tests/test_existing_extractors.py:23-58:
tiny inputs, exact expected structure)."""

from pdf_extractor_ray.kernels import extract_html, sniff_bytes
from pdf_extractor_ray.kernels.html_extract import normalize_text


def test_simple_article():
    html = b"""<!doctype html>
    <html><head><title>My Title</title><style>p{}</style></head><body>
    <nav><a href="/">Home</a> <a href="/x">X</a></nav>
    <p>This is the first real paragraph with enough characters to keep.</p>
    <p>short</p>
    <footer><a href="/tos">terms</a></footer>
    </body></html>"""
    res = extract_html(html)
    assert res.status == "ok"
    assert res.text == (
        "My Title\n\nThis is the first real paragraph with enough characters to keep."
    )
    assert [s.kind for s in res.spans] == ["title", "paragraph"]
    # spans index into the final text
    s = res.spans[1]
    assert res.text[s.start : s.end].startswith("This is the first")


def test_boilerplate_dropped():
    html = (
        b"<html><body><script>var x = 'should never appear in output';</script>"
        b"<aside>sidebar junk that is long enough to pass thresholds easily</aside>"
        b"<p>Main content paragraph that is definitely long enough to keep.</p>"
        b"</body></html>"
    )
    res = extract_html(html)
    assert "never appear" not in res.text
    assert "sidebar junk" not in res.text
    assert "Main content paragraph" in res.text


def test_link_density_filter():
    links = "".join(f'<a href="/{i}">link text number {i} padded</a> ' for i in range(10))
    html = f"<html><body><div>{links}</div></body></html>".encode()
    res = extract_html(html)
    assert res.text == ""
    assert res.status == "empty"


def test_entities_and_whitespace():
    html = (
        b"<html><body><p>Caf&eacute; &amp; r&eacute;sum&eacute;   with\n\n   "
        b"collapsed   whitespace and plenty of padding text here.</p></body></html>"
    )
    res = extract_html(html)
    assert "Café & résumé with collapsed whitespace" in res.text
    assert "  " not in res.text


def test_malformed_no_crash():
    html = b"<html><body></div></div><p>Unclosed paragraph with plenty of text to keep it<p>another unclosed one also long enough to keep<div>stray < bracket"
    res = extract_html(html)
    assert res.status == "ok"
    assert "Unclosed paragraph" in res.text


def test_headings_kept_with_lower_threshold():
    html = b"<html><body><h1>Hi all</h1><p>Body paragraph long enough to be kept around.</p></body></html>"
    res = extract_html(html)
    assert res.text.startswith("Hi all\n\n")
    assert res.spans[0].kind == "heading"


def test_list_and_table_kinds():
    html = (
        b"<html><body>"
        b"<ul><li>First list item with enough characters in it</li></ul>"
        b"<table><tr><td>A table cell with enough characters in it too</td></tr></table>"
        b"</body></html>"
    )
    res = extract_html(html)
    kinds = [s.kind for s in res.spans]
    assert kinds == ["list", "table"]


def test_empty_and_sniff():
    assert sniff_bytes(b"") == "empty"
    assert sniff_bytes(None) == "empty"
    assert sniff_bytes(b"%PDF-1.7 blah") == "pdf"
    assert sniff_bytes(b"  \n <!DOCTYPE html><html>") == "html"
    assert sniff_bytes(b"<div>x</div>") == "html"
    assert sniff_bytes(b"\x00\x01\x02 garbage") == "unknown"


def test_normalize_text_nfc():
    # e + combining acute -> precomposed
    assert normalize_text("Café  x") == "Café x"


# -- link extraction (same scanner, second collector) ----------------------

def test_extract_links_basic_order_and_anchor():
    from pdf_extractor_ray.kernels.html_extract import extract_links

    html = (
        b"<html><body><nav><a href='/'>Home</a></nav>"
        b'<p>See <a href="/ref/1">the first ref</a> and '
        b"<a href=http://x.com/page>bare one</a>.</p>"
        b"<footer><a href='/tos'>terms</a></footer></body></html>"
    )
    assert extract_links(html) == [
        ("/", "Home"),
        ("/ref/1", "the first ref"),
        ("http://x.com/page", "bare one"),
        ("/tos", "terms"),
    ]


def test_extract_links_nested_unclosed_and_block_boundary():
    from pdf_extractor_ray.kernels.html_extract import extract_links

    # nested <a> auto-closes the previous one; a block tag closes an
    # unclosed anchor (HTML5 agency, mirrors the text collector)
    html = (
        b"<p><a href='/a'>one <a href='/b'>two</a></p>"
        b"<p><a href='/c'>dangling</p><p>after</p>"
    )
    assert extract_links(html) == [
        ("/a", "one"),
        ("/b", "two"),
        ("/c", "dangling"),
    ]


def test_extract_links_script_and_entities():
    from pdf_extractor_ray.kernels.html_extract import extract_links

    html = (
        b"<script>var s = '<a href=\"/fake\">x</a>';</script>"
        b'<a href="/q?a=1&amp;b=2">A &amp; B</a>'
        b"<a name='no-href'>not a link</a>"
        b"<a href=''>empty href skipped</a>"
    )
    assert extract_links(html) == [("/q?a=1&b=2", "A & B")]


def test_extract_links_never_raises_on_junk():
    from pdf_extractor_ray.kernels.html_extract import extract_links

    assert extract_links(b"\x00\xff<<<a href") == []
    assert extract_links(b"%PDF-1.4 binary junk") == []


def test_charset_meta_decode_latin1():
    from pdf_extractor_ray.kernels.html_extract import extract_html

    body = "Café déjà vu, crème brûlée et ça va"
    html = (
        '<html><head><meta charset="iso-8859-1"></head>'
        "<body><p>" + body + " and enough filler text to clear the minimum "
        "block length threshold for extraction.</p></body></html>"
    ).encode("iso-8859-1")
    # invalid as UTF-8, so the meta charset must be honored
    res = extract_html(html)
    assert "Café déjà vu" in res.text
    assert "crème brûlée" in res.text
    assert "�" not in res.text


def test_charset_meta_decode_http_equiv_cp1251():
    from pdf_extractor_ray.kernels.html_extract import extract_html

    body = "Пример русского текста для проверки корректного декодирования страницы"
    html = (
        "<html><head><meta http-equiv='Content-Type' "
        "content='text/html; charset=windows-1251'></head>"
        "<body><p>" + body + "</p></body></html>"
    ).encode("windows-1251")
    res = extract_html(html)
    assert "Пример русского текста" in res.text
    assert "�" not in res.text


def test_charset_utf8_wins_over_wrong_meta():
    from pdf_extractor_ray.kernels.html_extract import extract_html

    # valid UTF-8 bytes with a (wrong) latin-1 declaration: strict UTF-8
    # decode succeeds first, so the meta tag is never consulted
    body = "日本語のテキスト with mixed ascii to pass the length gate easily here"
    html = (
        '<html><head><meta charset="iso-8859-1"></head>'
        "<body><p>" + body + "</p></body></html>"
    ).encode("utf-8")
    res = extract_html(html)
    assert "日本語のテキスト" in res.text


def test_charset_unknown_codec_falls_back_to_replacement():
    from pdf_extractor_ray.kernels.html_extract import extract_html

    html = (
        b'<html><head><meta charset="x-no-such-codec"></head><body><p>'
        b"prefix \xff\xfe suffix and enough filler to clear the minimum "
        b"block length threshold for extraction today</p></body></html>"
    )
    res = extract_html(html)
    assert "prefix" in res.text and "suffix" in res.text
    assert "�" in res.text


def test_charset_links_also_decoded():
    from pdf_extractor_ray.kernels.html_extract import extract_links

    html = (
        '<html><head><meta charset="iso-8859-1"></head>'
        '<body><a href="/caf%C3%A9">Café München</a></body></html>'
    ).encode("iso-8859-1")
    assert extract_links(html) == [("/caf%C3%A9", "Café München")]
