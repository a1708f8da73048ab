"""Lineage + resume checkpointing."""
