"""Corpus sources: synthetic pages generation + parquet readers."""

from pdf_extractor_ray.sources.corpus import (  # noqa: F401
    make_page_row,
    pages_table,
    write_pages_parquet,
    PAGES_SCHEMA,
)
