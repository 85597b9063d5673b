"""Adversarial-unicode parity: the sf documents tables are ASCII word
soup, so run the text operators over a corpus designed to expose
utf8proc/RE2 edge differences between the Arrow kernels and DuckDB
(Turkish dotted/dotless i, sharp s, final sigma, combining marks,
astral-plane codepoints, NBSP vs ASCII whitespace, CRLF vs LF paragraph
breaks, fullwidth forms, RTL scripts) and assert bit-exact agreement
with the same oracle SQL the driver runs."""

import random

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ADVERSARIAL = [
    "İstanbul ııı İİ",            # Turkish dotted/dotless i
    "STRASSE straße ß ẞ",         # sharp s, capital sharp s
    "ΣΟΦΟΣ σοφος ΟΔΥΣΣΕΥΣ",       # final-sigma lowercasing
    "école école",     # combining acute vs precomposed
    "\U0001d518\U0001d52b\U0001d526 𝔘𝔫𝔦 🎉🎊",  # astral plane
    "a b c​d",     # NBSP, em-space, zero-width space
    "line1\r\nline2\r\n\r\nline3",  # CRLF: \n\n never forms from \r\n\r\n
    "x\n\ny\n\n\nz\n\n\n\nw",     # odd blank-run counts
    "Ｆｕｌｌｗｉｄｔｈ１２３ half 123",  # fullwidth letters/digits
    "مرحبا بالعالم عربي",          # RTL Arabic
    "नमस्ते दुनिया हिंदी",          # Devanagari with matras
    "ẞİıǅǈǋǲ",                    # titlecase digraphs
    "\t \v\f\r\n mixed \t\t ws ",
    "",
    " ",
    "\n\n",
    "a" * 3000,
    ("word " * 50 + "\n\n") * 4,
]


def _random_unicode(rng: random.Random, n: int) -> str:
    ranges = [
        (0x20, 0x7E), (0xA0, 0x2FF), (0x370, 0x3FF), (0x400, 0x4FF),
        (0x600, 0x6FF), (0x900, 0x97F), (0x1E00, 0x1EFF), (0x2000, 0x206F),
        (0x3040, 0x30FF), (0xFF00, 0xFFEF), (0x1F300, 0x1F5FF),
    ]
    out = []
    for _ in range(n):
        lo, hi = rng.choice(ranges)
        out.append(chr(rng.randint(lo, hi)))
        if rng.random() < 0.15:
            out.append(rng.choice(" \t\n\n\n"))
    return "".join(out)


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    rng = random.Random(20260817)
    texts = list(ADVERSARIAL) + [_random_unicode(rng, 120) for _ in range(150)]
    # source s0.example gets clearly-good docs so the domain gate has both
    # survivors and rejects (all-empty results would also hit the Ray
    # quirk where Dataset.to_pandas() drops the schema of empty datasets)
    texts = [
        ("word " * 60) if i % 7 == 0 else t for i, t in enumerate(texts)
    ]
    d = tmp_path_factory.mktemp("fuzzdocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["xx"] * len(texts)),
                "source": pa.array(
                    [f"s{i % 7}.example" for i in range(len(texts))]
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "normalize_text",
        "explode_paragraphs",
        "vocab_topk",
        "split_assign",
        "shuffle_docs",
        "cap_per_source",
        "filter_source_quality",
        "quality_stats",
        "token_count",
        "doc_fingerprint",
        "dedup_exact",
        "sample_docs",
    ],
)
def test_fuzz_parity(ray_session, fuzz_dir, name):
    import __ray_entry__ as E
    import ray.data as rd

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{fuzz_dir}/documents.parquet')"
    )
    res = E.queries()[name](fuzz_dir)
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    gold = con.execute(E.oracle_sql()[name]).fetchdf()
    pd.testing.assert_frame_equal(_canon(res), _canon(gold), check_dtype=False)
