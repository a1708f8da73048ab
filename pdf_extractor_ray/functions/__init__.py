"""Corpus-level operators for large-scale training-data pipelines.

These extend the reference's per-document extraction with the
corpus-wide operations a 100 TB pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing) — SURVEY.md §2.7 notes the
reference has no corpus-level dedup; these are the scale-path additions.
"""
