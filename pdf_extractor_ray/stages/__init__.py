"""Ray Data stages: vectorized batch transforms + stateful actor-pool
extractors composing the flagship pipeline (SURVEY.md §3.1 restatement)."""

from .sniff import sniff_and_partition, url_partition_ids
from .extract import DocumentExtractor, extract_batch, EXTRACT_OUT_SCHEMA
from .dedup import dedup_first_wins

__all__ = [
    "sniff_and_partition",
    "url_partition_ids",
    "DocumentExtractor",
    "extract_batch",
    "EXTRACT_OUT_SCHEMA",
    "dedup_first_wins",
]
