"""Deterministic synthetic web-page corpus generator (FIXTURES.md §1-2).

Produces sharded Parquet with exactly the BASELINE.json ``input_hint``
schema::

    url:string, warc_ts:timestamp[us,UTC], html:large_binary,
    text:string, lang:string

Every row is a pure function of ``(seed, row_index)`` — independent of
shard layout or generation order — via a per-row ``random.Random``. The
payload mixture (html article / linkfarm / malformed, pdf simple / flate /
big / corrupt, empty, unknown) follows FIXTURES.md §2. PDFs are written by
our own writer, co-designed with ``kernels/pdf_extract.py`` (SURVEY.md
§7.0): valid header/xref/trailer, BT/Tf/Td/Tj/TJ/ET operators, optional
FlateDecode, shuffled block emission order to exercise the reading-order
sort.

Reference analog: the reference's tests mock their parse libraries and use
no data files (``/root/reference/backend/tests/test_existing_extractors.py:23-58``);
our corpus replaces that mock layer with real bytes both the oracle and the
Ray pipeline consume.
"""

from __future__ import annotations

import random
import zlib
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
EPOCH_US = int(EPOCH.timestamp() * 1_000_000)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_DOMAINS = [
    "news.example.org", "blog.alpha.net", "docs.beta.io", "wiki.gamma.com",
    "shop.delta.co", "forum.epsilon.org", "mag.zeta.news", "data.eta.gov",
    "edu.theta.ac", "code.iota.dev", "pics.kappa.app", "maps.lambda.world",
    "mail.mu.io", "chat.nu.im", "video.xi.tv", "music.omicron.fm",
    "books.pi.lib", "games.rho.gg", "sports.sigma.tv", "food.tau.rec",
    "travel.upsilon.co", "health.phi.med", "law.chi.legal", "art.psi.design",
    "sci.omega.edu", "tech.aleph.io", "auto.bet.cars", "home.gimel.diy",
    "pets.dalet.vet", "style.he.fash", "money.vav.fin", "jobs.zayin.work",
    "events.het.cal", "weather.tet.met", "space.yod.astro", "ocean.kaf.marine",
    "farm.lamed.agri", "city.mem.urban", "rail.nun.transit", "air.samekh.avia",
    "energy.ayin.grid", "mine.pe.geo", "wood.tsadi.forest", "fish.qof.aqua",
    "wine.resh.vin", "tea.shin.brew", "salt.tav.spice", "iron.alef2.metal",
    "glass.bet2.opt", "clay.gimel2.ceram",
]

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat "
    "duis aute irure reprehenderit voluptate velit esse cillum fugiat nulla "
    "pariatur excepteur sint occaecat cupidatat proident sunt culpa officia "
    "deserunt mollit anim laborum atlas river stone meadow harbor lantern "
    "orchard timber granite willow falcon ember prairie summit canyon delta "
    "harvest meridian nebula quartz saffron tundra velvet zenith cobalt"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "hi", "zh", ""]

# (class_name, cumulative probability) — FIXTURES.md §2 mixture; the image
# class is carved out of the former unknown band (0.98-1.00) so every other
# class keeps its exact round-1 row assignment
_MIXTURE = [
    ("html_article", 0.55),
    ("html_linkfarm", 0.65),
    ("html_malformed", 0.70),
    ("pdf_simple", 0.85),
    ("pdf_flate", 0.90),
    ("pdf_big", 0.92),
    ("pdf_corrupt", 0.95),
    ("empty", 0.98),
    ("image", 0.99),
    ("unknown", 1.00),
]

DUP_RATE = 0.01


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 5) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


# --------------------------------------------------------------------------
# HTML payloads
# --------------------------------------------------------------------------

def _nav_links(rng: random.Random, n: int) -> str:
    return " | ".join(
        f'<a href="/{rng.choice(_WORDS)}/{rng.randint(0, 999)}">{rng.choice(_WORDS)}</a>'
        for _ in range(n)
    )


def _html_article(rng: random.Random) -> bytes:
    title = _sentence(rng, 3, 7).rstrip(".")
    n_paras = rng.randint(3, 30)
    body: list[str] = []
    body.append(f"<h1>{title}</h1>")
    for p in range(n_paras):
        if p and rng.random() < 0.2:
            body.append(f"<h2>{_sentence(rng, 2, 5).rstrip('.')}</h2>")
        para = _paragraph(rng)
        if rng.random() < 0.3:  # entities
            para += " Caf&eacute; &amp; r&eacute;sum&eacute;."
        if rng.random() < 0.15:  # inline link inside a long paragraph
            para += f' See <a href="/ref">{rng.choice(_WORDS)}</a> for details.'
        body.append(f"<p>{para}</p>")
    if rng.random() < 0.5:
        items = "".join(f"<li>{_sentence(rng, 4, 9)}</li>" for _ in range(rng.randint(3, 7)))
        body.append(f"<ul>{items}</ul>")
    if rng.random() < 0.3:
        rows = "".join(
            "<tr>" + "".join(f"<td>{_sentence(rng, 3, 6)}</td>" for _ in range(3)) + "</tr>"
            for _ in range(rng.randint(2, 5))
        )
        body.append(f"<table>{rows}</table>")
    doc = f"""<!doctype html>
<html><head><title>{title}</title>
<meta charset="utf-8"><style>body {{ color: #333; }}</style>
<script>var tracker = "{rng.randint(0, 10**9)}";</script>
</head><body>
<!-- generated page -->
<nav>{_nav_links(rng, rng.randint(5, 12))}</nav>
<header><a href="/">Home</a> {rng.choice(_WORDS)}</header>
<article>
{chr(10).join(body)}
</article>
<aside>{_nav_links(rng, rng.randint(4, 8))}</aside>
<footer>&copy; 2025 {rng.choice(_WORDS)} — <a href="/tos">terms</a></footer>
</body></html>"""
    return doc.encode("utf-8")


def _html_linkfarm(rng: random.Random) -> bytes:
    links = "".join(
        f'<div><a href="/{rng.randint(0, 9999)}">{_sentence(rng, 2, 4)}</a></div>'
        for _ in range(rng.randint(20, 60))
    )
    doc = (
        "<!doctype html><html><head><title>Links</title></head><body>"
        f"<nav>{_nav_links(rng, 10)}</nav>{links}"
        "<footer><a href='/a'>a</a></footer></body></html>"
    )
    return doc.encode("utf-8")


def _html_malformed(rng: random.Random) -> bytes:
    paras = "".join(f"<p>{_paragraph(rng, 1, 3)}" for _ in range(rng.randint(2, 6)))  # unclosed <p>
    doc = (
        f"<html><head><title>{_sentence(rng, 2, 4)}</title><body>"
        f"</div></div>{paras}<p>broken < angle and {rng.choice(_WORDS)}"
        f"<div>{_paragraph(rng)}</span></body>"
    )
    return doc.encode("utf-8")


# --------------------------------------------------------------------------
# PDF payloads (co-designed writer; see kernels/pdf_extract.py invariants)
# --------------------------------------------------------------------------

def _page_content(rng: random.Random) -> bytes:
    """One page: 1-4 text blocks at descending y; block emission order is
    shuffled to exercise the reading-order sort. ~30% of pages also carry a
    planted TABLE region: R x C single-word cells at fixed column x
    positions (column gap >> the kernel's CELL_GAP_FACTOR * font_size), so
    the table-detection product (kernels/pdf_extract._detect_tables) has
    real corpus coverage."""
    n_blocks = rng.randint(1, 4)
    y = 720.0
    blocks: list[tuple[float, bytes]] = []
    for _ in range(n_blocks):
        n_lines = rng.randint(1, 6)
        ops: list[bytes] = [b"BT /F1 12 Tf"]
        ops.append(f"72 {y:.0f} Td".encode())
        for li in range(n_lines):
            if li:
                ops.append(b"0 -14 Td")
            line = _sentence(rng, 4, 10)
            if rng.random() < 0.25:
                # TJ with kerning splits one word across two strings
                a, b = line[: len(line) // 2], line[len(line) // 2 :]
                ops.append(
                    b"[" + _pdf_str(a) + b" -20 " + _pdf_str(b) + b"] TJ"
                )
            else:
                ops.append(_pdf_str(line) + b" Tj")
        ops.append(b"ET")
        blocks.append((y, b" ".join(ops)))
        y -= 14.0 * n_lines + rng.choice([40.0, 60.0, 80.0])
    if rng.random() < 0.3:
        n_rows = rng.randint(2, 5)
        n_cols = rng.randint(2, 4)
        ops = [b"BT /F1 12 Tf"]
        for r in range(n_rows):
            ry = y - 14.0 * r
            for c in range(n_cols):
                # Tm = absolute positioning; widest cell word (13 chars)
                # is 78 pts at 12 pt, leaving a >= 72 pt inter-column gap
                ops.append(f"1 0 0 1 {72 + 150 * c} {ry:.0f} Tm".encode())
                ops.append(_pdf_str(rng.choice(_WORDS)) + b" Tj")
        ops.append(b"ET")
        blocks.append((y, b" ".join(ops)))
        y -= 14.0 * n_rows + rng.choice([40.0, 60.0, 80.0])
    rng.shuffle(blocks)
    return b"\n".join(b for _, b in blocks)


def _pdf_str(s: str) -> bytes:
    return b"(" + s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1") + b")"


def _pdf_objects(
    rng: random.Random, n_pages: int, flate: bool
) -> tuple[dict[int, bytes], set[int]]:
    """The shared logical document of build_pdf / build_pdf15: object map +
    the set of object numbers that carry streams (content objects). The
    rng call sequence is part of build_pdf's byte-determinism contract —
    do not reorder."""
    contents = [_page_content(rng) for _ in range(n_pages)]
    # object numbering: 1=catalog, 2=pages, font=3, then per page (content, page)
    font_num = 3
    page_nums = []
    objs: dict[int, bytes] = {}
    stream_nums: set[int] = set()
    next_num = 4
    for i, content in enumerate(contents):
        c_num, p_num = next_num, next_num + 1
        if rng.random() < 0.3:  # swap to break monotone ordering
            c_num, p_num = p_num, c_num
        next_num += 2
        data = zlib.compress(content) if flate else content
        filt = b" /Filter /FlateDecode" if flate else b""
        objs[c_num] = (
            b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n"
            + data + b"\nendstream"
        )
        stream_nums.add(c_num)
        objs[p_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents "
            + str(c_num).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font_num).encode() + b" 0 R >> >> >>"
        )
        page_nums.append(p_num)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_nums)
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(n_pages).encode() + b" >>"
    )
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    return objs, stream_nums


def build_pdf(rng: random.Random, n_pages: int, flate: bool) -> bytes:
    """Standard single-xref PDF; page/content object numbers deliberately
    interleaved out of document order (SURVEY FIXTURES 'out-of-order object
    numbering')."""
    objs, _ = _pdf_objects(rng, n_pages, flate)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 " + str(n_obj).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size " + str(n_obj).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def build_pdf15(rng: random.Random, n_pages: int, flate: bool) -> bytes:
    """The SAME logical document as ``build_pdf`` (same rng consumption, so
    equal seeds give equal page text) re-encoded in PDF 1.5+ layout: every
    non-stream object (catalog, page tree, page dicts, font) lives inside a
    FlateDecode ``/Type /ObjStm`` compressed object stream; the
    cross-reference is a binary ``/Type /XRef`` STREAM (W [1 4 2], type-1
    entries for top-level objects, type-2 for compressed members) carrying
    /Root in its dict — there is NO classic xref table and NO ``trailer``
    keyword anywhere in the file. Content streams stay top-level (the spec
    forbids streams inside an ObjStm)."""
    objs, stream_nums = _pdf_objects(rng, n_pages, flate)
    members = sorted(n for n in objs if n not in stream_nums)
    objstm_num = max(objs) + 1
    xref_num = objstm_num + 1

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(stream_nums):
        offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + objs[num] + b"\nendobj\n"

    # --- the ObjStm container: "num off num off ...\n" header + bodies ---
    bodies = [objs[n] for n in members]
    offs: list[int] = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1  # single-space separator between members
    header = (
        b" ".join(
            str(n).encode() + b" " + str(o).encode()
            for n, o in zip(members, offs)
        )
        + b"\n"
    )
    payload = header + b" ".join(bodies)
    first = len(header)
    zdata = zlib.compress(payload)
    offsets[objstm_num] = len(out)
    out += (
        str(objstm_num).encode() + b" 0 obj\n<< /Type /ObjStm /N "
        + str(len(members)).encode() + b" /First " + str(first).encode()
        + b" /Length " + str(len(zdata)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + zdata + b"\nendstream\nendobj\n"
    )

    # --- the XRef stream: W [1 4 2] binary entries for 0..xref_num ---
    member_idx = {n: i for i, n in enumerate(members)}
    xref_pos = len(out)
    offsets[xref_num] = xref_pos
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += b"\x00" + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif num in member_idx:
            rows += (
                b"\x02"
                + objstm_num.to_bytes(4, "big")
                + member_idx[num].to_bytes(2, "big")
            )
        else:
            rows += b"\x01" + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
    zrows = zlib.compress(bytes(rows))
    out += (
        str(xref_num).encode() + b" 0 obj\n<< /Type /XRef /Size "
        + str(size).encode() + b" /Root 1 0 R /W [1 4 2] /Index [0 "
        + str(size).encode() + b"] /Length " + str(len(zrows)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + zrows + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    return bytes(out)


def _pdf_corrupt(rng: random.Random) -> bytes:
    base = build_pdf(rng, rng.randint(1, 3), flate=rng.random() < 0.5)
    mode = rng.random()
    if mode < 0.4:
        return base[: rng.randint(20, max(21, len(base) // 3))]  # truncated
    if mode < 0.7:
        return b"%PDF-1.4\n" + bytes(rng.randrange(256) for _ in range(rng.randint(50, 300)))
    # garbage xref / missing EOF but objects intact -> still parses (scan-based)
    return base.split(b"xref")[0] + b"xref\ngarbage trailer"


def _unknown(rng: random.Random) -> bytes:
    return bytes(rng.randrange(256) for _ in range(rng.randint(10, 200)))


_IMAGE_MAGICS = [
    b"\xff\xd8\xff\xe0\x00\x10JFIF\x00",        # jpeg
    b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR",     # png
    b"GIF89a",                                   # gif
    b"II*\x00\x08\x00\x00\x00",                  # tiff
    b"BM\x00\x00\x00\x00\x00\x00\x00\x00",       # bmp (reserved zeros)
]


def _image(rng: random.Random) -> bytes:
    """Magic-valid image blob (the reference accepts these formats at
    ingest, ``main.py:367-379``; decode itself is a stub locally, so the
    body past the magic is deterministic junk)."""
    kind = rng.randrange(len(_IMAGE_MAGICS) + 1)
    body = bytes(rng.randrange(256) for _ in range(rng.randint(40, 400)))
    if kind == len(_IMAGE_MAGICS):  # webp: RIFF <size> WEBP
        return b"RIFF" + len(body).to_bytes(4, "little") + b"WEBP" + body
    return _IMAGE_MAGICS[kind] + body


# --------------------------------------------------------------------------
# Row assembly
# --------------------------------------------------------------------------

def _row_class(rng: random.Random) -> str:
    r = rng.random()
    for name, cum in _MIXTURE:
        if r < cum:
            return name
    return "unknown"


_PDF15_RATE = 0.25  # fraction of pdf rows written in PDF 1.5+ layout


def _pdf_writer(rng: random.Random):
    """25% of pdf rows use the PDF 1.5+ encoding (xref STREAM + compressed
    /ObjStm object stream — the post-2005 real-world layout) so the golden
    byte-identity corpus exercises both cross-reference formats end-to-end;
    both writers consume the rng identically, so the page TEXT of a row is
    the same under either encoding."""
    return build_pdf15 if rng.random() < _PDF15_RATE else build_pdf


def _payload(cls: str, rng: random.Random) -> bytes:
    if cls == "html_article":
        return _html_article(rng)
    if cls == "html_linkfarm":
        return _html_linkfarm(rng)
    if cls == "html_malformed":
        return _html_malformed(rng)
    if cls == "pdf_simple":
        n, w = rng.randint(1, 5), _pdf_writer(rng)
        return w(rng, n, flate=False)
    if cls == "pdf_flate":
        n, w = rng.randint(1, 5), _pdf_writer(rng)
        return w(rng, n, flate=True)
    if cls == "pdf_big":
        n, w = rng.randint(50, 200), _pdf_writer(rng)
        return w(rng, n, flate=True)
    if cls == "pdf_corrupt":
        return _pdf_corrupt(rng)
    if cls == "empty":
        return b""
    if cls == "image":
        return _image(rng)
    return _unknown(rng)


def gen_row(i: int, seed: int = 42) -> dict:
    """Row ``i`` of the corpus — pure function of (seed, i)."""
    rng = random.Random(f"{seed}:{i}")
    if i > 0 and rng.random() < DUP_RATE:
        # duplicate-url row: same url + payload as an earlier row, later
        # warc_ts -> first-wins dedup keeps the original (FIXTURES.md §4.3)
        j = i - 1 - rng.randrange(min(i, 50))
        base = gen_row(j, seed)
        base["warc_ts"] = EPOCH_US + i * 1_000_000
        return base
    cls = _row_class(rng)
    domain = rng.choice(_DOMAINS)
    path = rng.choice(_WORDS)
    return {
        "url": f"https://{domain}/{path}-{i:08d}",
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": _payload(cls, rng),
        "text": _sentence(rng, 5, 12),
        "lang": rng.choice(_LANGS),
    }


def shard_table(shard: int, n_shards: int, n_rows: int, seed: int = 42) -> pa.Table:
    """Rows of shard ``shard`` (round-robin row ranges) as an Arrow table."""
    lo = shard * n_rows // n_shards
    hi = (shard + 1) * n_rows // n_shards
    rows = [gen_row(i, seed) for i in range(lo, hi)]
    cols = {
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
        "html": pa.array([r["html"] for r in rows], pa.large_binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    }
    return pa.table(cols, schema=PAGES_SCHEMA)


def _write_shard(out_dir: str, k: int, n_shards: int, n_rows: int, seed: int) -> str:
    import os

    t = shard_table(k, n_shards, n_rows, seed)
    path = os.path.join(out_dir, f"part-{k:05d}.parquet")
    pq.write_table(t, path)
    return path


def write_corpus(out_dir: str, n_rows: int, seed: int = 42, n_shards: int = 8) -> list[str]:
    """Write ``pages/part-{k:05d}.parquet`` shards; returns file paths.

    Generation is per-shard pure-functional, so if a Ray session is already
    live (bench/scripts own one) shards are generated as parallel Ray tasks;
    output is byte-identical to the sequential path either way."""
    import glob as _glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    # clear shards from any previous layout: a rerun with fewer shards must
    # not leave stale part-files that silently corrupt the corpus
    for stale in _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        os.remove(stale)
    try:
        import ray

        use_ray = ray.is_initialized() and n_shards >= 4
    except Exception:
        use_ray = False
    if use_ray:
        import ray

        f = ray.remote(_write_shard)
        return ray.get(
            [f.remote(out_dir, k, n_shards, n_rows, seed) for k in range(n_shards)]
        )
    return [_write_shard(out_dir, k, n_shards, n_rows, seed) for k in range(n_shards)]


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="generate the synthetic pages corpus")
    ap.add_argument("out_dir")
    ap.add_argument("--rows", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()
    paths = write_corpus(args.out_dir, args.rows, args.seed, args.shards)
    print(f"wrote {len(paths)} shards, {args.rows} rows -> {args.out_dir}")
