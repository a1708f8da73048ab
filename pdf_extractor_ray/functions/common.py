"""Shared exchange-shape helpers for the corpus operators."""

from __future__ import annotations

import ray
import ray.data

__all__ = ["coalesce_width", "coalesce_for_exchange"]


def coalesce_width() -> int:
    """Target block count for pre-exchange coalesces: 2x cluster CPUs.

    Sort-based groupby pays per-block reduce-task overhead, so a pile
    of near-empty blocks (per-batch partial streams are usually tiny)
    makes the exchange overhead-bound instead of data-bound; a local
    no-shuffle coalesce keeps the partition count matched to the
    cluster rather than to the upstream block count, and still scales
    on a multi-node run (2 x total cores grows with the cluster).
    Measured effects in BASELINE.md (round 2).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, 2 * cpus)


def coalesce_for_exchange(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Local (no-shuffle) coalesce ahead of a groupby/sort exchange.
    Use on NARROW pre-aggregated partial streams; full-row streams
    should keep data-proportional block counts instead."""
    return ds.repartition(coalesce_width(), shuffle=False)
