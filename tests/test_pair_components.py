"""Planted-graph tests for the distributed connected-components kernel
(functions/cc.py) — the shared clustering step of jaccard_dup_groups /
near_dup_groups. Covers both physical paths: the small-graph driver-local
rounds and the broadcast-round distributed path (forced by shrinking the
threshold)."""

import numpy as np
import pyarrow as pa
import pytest

import pdf_extractor_ray.functions.cc as cc


def _planted_edges(n_clusters: int, size: int, extra_per_node: int, seed: int):
    """Star-plus-random intra-cluster edges; component = node // size, so
    canonical label = cluster * size. Duplicate + self-loop rows included
    on purpose (the contract says they're harmless)."""
    rng = np.random.default_rng(seed)
    n = n_clusters * size
    ids = np.arange(n, dtype=np.int64)
    star_a = ids
    star_b = ids - (ids % size)  # hub of the cluster (includes self-loop)
    ex_a = np.repeat(ids, extra_per_node)
    ex_b = (
        ex_a
        - (ex_a % size)
        + rng.integers(0, size, size=len(ex_a), dtype=np.int64)
    )
    a = np.concatenate([star_a, ex_a, star_a])  # star edges duplicated
    b = np.concatenate([star_b, ex_b, star_b])
    return a, b, n


def _expected(nodes: np.ndarray, size: int) -> np.ndarray:
    return nodes - (nodes % size)


@pytest.mark.parametrize("force_distributed", [False, True])
def test_pair_components_planted(ray_session, monkeypatch, force_distributed):
    import ray.data as rd

    if force_distributed:
        monkeypatch.setattr(cc, "_LOCAL_EDGE_LIMIT", 0)
    a, b, n = _planted_edges(n_clusters=40, size=7, extra_per_node=2, seed=3)
    pairs = rd.from_arrow(
        pa.table({"x": pa.array(a), "y": pa.array(b)})
    ).repartition(8)
    out = cc.pair_components(pairs, col_a="x", col_b="y", out_id="doc_id")
    got_ids = out["doc_id"].to_numpy(zero_copy_only=False)
    got_canon = out["canon_id"].to_numpy(zero_copy_only=False)
    assert np.array_equal(got_ids, np.arange(n, dtype=np.int64))  # sorted
    assert np.array_equal(got_canon, _expected(got_ids, 7))


def test_pair_components_empty_and_table_input(ray_session):
    empty = pa.table(
        {"x": pa.array([], pa.int64()), "y": pa.array([], pa.int64())}
    )
    out = cc.pair_components(empty, col_a="x", col_b="y", out_id="doc_id")
    assert out.num_rows == 0
    # arrow-table input path, chain of 3 + isolated self-loop
    t = pa.table(
        {"x": pa.array([5, 4, 9], pa.int64()), "y": pa.array([4, 3, 9], pa.int64())}
    )
    out = cc.pair_components(t, col_a="x", col_b="y", out_id="doc_id")
    assert out["doc_id"].to_pylist() == [3, 4, 5, 9]
    assert out["canon_id"].to_pylist() == [3, 3, 3, 9]


def test_pair_components_matches_union_find(ray_session):
    """Random graph: distributed CC output must equal a reference driver
    union-find (the implementation it replaced)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    a = rng.integers(0, 5000, size=20000, dtype=np.int64)
    b = rng.integers(0, 5000, size=20000, dtype=np.int64)
    pairs = rd.from_arrow(pa.table({"x": pa.array(a), "y": pa.array(b)}))
    out = cc.pair_components(pairs, col_a="x", col_b="y", out_id="doc_id")

    parent: dict[int, int] = {}

    def find(v: int) -> int:
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for x, y in zip(a.tolist(), b.tolist()):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    ids = sorted(parent)
    exp = {i: find(i) for i in ids}
    got = dict(
        zip(out["doc_id"].to_pylist(), out["canon_id"].to_pylist())
    )
    assert got == exp
