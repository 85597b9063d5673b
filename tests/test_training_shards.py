"""write_training_shards: the materialized packed-sequence egress must
reproduce the exact global token stream the assignment metadata defines —
every sequence except the last carries exactly `budget` tokens, and the
concatenation of all sequences in seq_id order equals the concatenation
of winner documents' tokens in shuffle (pos) order."""

import glob
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def test_training_shards_exact_stream(ray_session, small_corpus, tmp_path):
    import ray

    from pdf_extractor_ray.pipelines.webpages import (
        checkpointed_training,
        write_training_shards,
    )

    budget = 64
    summary = write_training_shards(
        small_corpus["corpus"],
        str(tmp_path / "work"),
        str(tmp_path / "shards"),
        budget=budget,
        n_partitions=4,
    )
    # the bucketed-join scale path (forced) must produce byte-identical
    # shards to the broadcast path
    write_training_shards(
        small_corpus["corpus"],
        str(tmp_path / "work"),
        str(tmp_path / "shards_join"),
        budget=budget,
        n_partitions=4,
        broadcast_limit=0,
    )
    a = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(str(tmp_path / "shards" / "*.parquet"))]
    ).sort_by([("seq_id", "ascending")])
    b = pa.concat_tables(
        [pq.read_table(f) for f in glob.glob(str(tmp_path / "shards_join" / "*.parquet"))]
    ).sort_by([("seq_id", "ascending")])
    assert a.equals(b)
    shard_files = glob.glob(str(tmp_path / "shards" / "*.parquet"))
    assert shard_files
    seqs = (
        pa.concat_tables([pq.read_table(f) for f in shard_files])
        .sort_by([("seq_id", "ascending")])
    )
    n_seqs = seqs.num_rows
    assert summary["n_seqs"][0].as_py() == n_seqs
    assert seqs["seq_id"].to_pylist() == list(range(n_seqs))  # contiguous
    ntoks = seqs["n_tokens"].to_pylist()
    assert all(n == budget for n in ntoks[:-1])  # full windows
    assert 0 < ntoks[-1] <= budget
    assert summary["n_tokens"][0].as_py() == sum(ntoks)

    # the reference stream: winners in pos order, their extracted texts'
    # whitespace tokens concatenated (reuses the same extraction checkpoint)
    meta = (
        checkpointed_training(
            small_corpus["corpus"],
            str(tmp_path / "work"),
            budget=budget,
            n_partitions=4,
        )
        .to_pandas()
        .sort_values("pos")
    )
    ext = pa.concat_tables(
        [
            pq.read_table(f, columns=["extracted_text"]).append_column(
                "doc_id", pq.read_table(f, columns=["doc_id"])["doc_id"]
            )
            for f in glob.glob(str(tmp_path / "work" / "part-*" / "extracted.parquet"))
        ]
    ).to_pandas().set_index("doc_id")
    expected: list[str] = []
    for doc_id in meta["doc_id"]:
        expected.extend(re.split(r"[ \t\n\r\f\v]+", ext.loc[doc_id, "extracted_text"].strip()))
    got: list[str] = []
    for t in seqs["text"].to_pylist():
        got.extend(t.split(" "))
    assert got == expected
