"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """A 300-row corpus + oracle goldens, generated once per session."""
    from pdf_extractor_ray.corpus import write_corpus
    from pdf_extractor_ray.oracle import write_golden

    root = tmp_path_factory.mktemp("corpus")
    corpus_dir = str(root / "pages")
    golden_dir = str(root / "golden")
    write_corpus(corpus_dir, n_rows=300, seed=42, n_shards=8)
    write_golden(corpus_dir, golden_dir)
    return {"corpus": corpus_dir, "golden": golden_dir}
