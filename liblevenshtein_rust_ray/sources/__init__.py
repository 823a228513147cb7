"""Sources: deterministic synthetic corpus generation + parquet readers."""

from .pages import generate_pages, generate_corpus, write_corpus, PAGES_SCHEMA

__all__ = ["generate_pages", "generate_corpus", "write_corpus", "PAGES_SCHEMA"]
