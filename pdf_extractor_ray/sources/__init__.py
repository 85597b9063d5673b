"""Sources: readers for the pages corpus (SURVEY.md §2.1 S1-S8)."""

from .pages import read_pages, read_pages_filtered, list_shards, PAGES_SCHEMA  # noqa: F401
