"""Corpus sources: synthetic pages generation + parquet readers +
WARC web-archive ingest."""

from pdf_extractor_ray.sources.corpus import (  # noqa: F401
    make_page_row,
    pages_table,
    write_pages_parquet,
    PAGES_SCHEMA,
)
from pdf_extractor_ray.sources.warc import (  # noqa: F401
    WarcDatasource,
    read_warc,
    write_warc,
    WARC_SCHEMA,
)
