"""End-to-end pipelines."""

from pdf_extractor_ray.pipelines.extract_pipeline import (  # noqa: F401
    extract_pages,
    run_resumable_extraction,
)
