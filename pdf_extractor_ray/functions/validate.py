"""Record validation + dead-letter routing (ingest schema gate).

Every 100 TB ingest runs a gate between the raw crawl tables and the
pipeline proper: rows that violate the contract (null/garbage url,
fetch timestamp outside the crawl window, empty or absurdly large
bodies, unknown language tags) must be ROUTED — counted per reason and
quarantined for inspection — never silently dropped and never allowed
to poison downstream stages. The reference repo enforces the same idea
per-document with required-field defaulting and quality-issue tagging
(see kernel/finalize.py and its citations); this module is the
table-level front door.

Semantics:

  - Rules are an ORDERED list ``(reason, check)``; a row's ``reason``
    is the FIRST failing rule (fixed priority, engine-replayable as a
    SQL CASE chain), or ``'ok'``.
  - ``schema_gate`` appends the ``reason`` column (pure vectorized
    per-row map: pyarrow.compute kernels, no shuffle, embarrassingly
    parallel).
  - ``route_quarantine`` splits the gated stream into (valid,
    dead-letter) datasets — two lazy filters over one gated lineage,
    so a caller can write the quarantine sink next to the main sink.

Checks receive the Arrow batch and return a boolean numpy/pyarrow mask
of violations. The built-in page rules below are all Arrow-compute
kernels; custom rules plug in through the same tuple shape.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = [
    "page_rules",
    "validation_reasons",
    "schema_gate",
    "route_quarantine",
    "dead_letter_summary",
]

Rule = tuple[str, Callable[[pa.Table], "pa.BooleanArray | np.ndarray"]]


def _col(
    batch: pa.Table, name: str, want: pa.DataType | None = None
) -> pa.ChunkedArray:
    c = batch[name]
    # an all-null block carries a null-typed column (e.g. from_items
    # over rows whose field is None in one block) — cast it so the
    # string/int kernels below run instead of raising
    if want is not None and pa.types.is_null(c.type):
        c = c.cast(want)
    return c


def page_rules(
    url_col: str = "url",
    ts_col: str = "fetch_ms",
    text_col: str = "text",
    lang_col: str = "lang",
    max_chars: int = 1_000_000,
    allowed_langs: Sequence[str] = ("en", "fr", "de", "es", "und"),
    ts_lo_ms: int = 946_684_800_000,   # 2000-01-01
    ts_hi_ms: int = 2_051_222_400_000,  # 2035-01-01
) -> list[Rule]:
    """The standard crawl-page contract, highest priority first."""
    langs = pa.array(list(allowed_langs), pa.string())

    def url_missing(b: pa.Table):
        c = _col(b, url_col, pa.string())
        return pc.or_kleene(pc.is_null(c), pc.equal(c, "")).fill_null(True)

    def url_scheme(b: pa.Table):
        c = pc.fill_null(_col(b, url_col, pa.string()), "")
        ok = pc.or_(
            pc.starts_with(c, "http://"), pc.starts_with(c, "https://")
        )
        return pc.invert(ok)

    def ts_out_of_range(b: pa.Table):
        c = _col(b, ts_col, pa.int64())
        bad = pc.or_(pc.less(c, ts_lo_ms), pc.greater_equal(c, ts_hi_ms))
        return bad.fill_null(True)

    def text_empty(b: pa.Table):
        c = _col(b, text_col, pa.string())
        return pc.or_kleene(pc.is_null(c), pc.equal(c, "")).fill_null(True)

    def text_oversize(b: pa.Table):
        c = pc.fill_null(_col(b, text_col, pa.string()), "")
        return pc.greater(pc.utf8_length(c), max_chars)

    def lang_unknown(b: pa.Table):
        c = pc.fill_null(_col(b, lang_col, pa.string()), "")
        return pc.invert(pc.is_in(c, value_set=langs))

    return [
        ("url_missing", url_missing),
        ("url_scheme", url_scheme),
        ("ts_out_of_range", ts_out_of_range),
        ("text_empty", text_empty),
        ("text_oversize", text_oversize),
        ("lang_unknown", lang_unknown),
    ]


def validation_reasons(batch: pa.Table, rules: Sequence[Rule]) -> pa.Array:
    """First-failing-rule reason per row ('ok' when all pass).

    Applies rules in REVERSE priority, each overwriting, so the
    highest-priority (first-listed) failing rule wins — exactly the
    SQL ``CASE WHEN r1 THEN .. WHEN r2 THEN .. ELSE 'ok' END``.
    """
    reason = pa.array(["ok"] * batch.num_rows, pa.string())
    for name, check in reversed(list(rules)):
        mask = check(batch)
        if isinstance(mask, np.ndarray):
            mask = pa.array(mask)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        reason = pc.if_else(mask, pa.scalar(name, pa.string()), reason)
    if isinstance(reason, pa.ChunkedArray):
        reason = reason.combine_chunks()
    return reason


def schema_gate(
    ds: ray.data.Dataset, rules: Sequence[Rule] | None = None, **rule_kwargs
) -> ray.data.Dataset:
    """Append the per-row ``reason`` column ('ok' = contract met)."""
    rules = list(rules) if rules is not None else page_rules(**rule_kwargs)

    def gate(batch: pa.Table) -> pa.Table:
        return batch.append_column("reason", validation_reasons(batch, rules))

    return ds.map_batches(gate, batch_format="pyarrow")


def route_quarantine(
    gated: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Split a gated stream into (valid, dead_letter) lazy datasets."""

    def keep_ok(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["reason"], "ok"))

    def keep_bad(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["reason"], "ok"))

    return (
        gated.map_batches(keep_ok, batch_format="pyarrow"),
        gated.map_batches(keep_bad, batch_format="pyarrow"),
    )


def dead_letter_summary(gated: ray.data.Dataset) -> ray.data.Dataset:
    """Per-reason row counts (reason cardinality == rule count + 1, so
    the exchange carries a handful of partial rows per batch)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(batch["reason"].to_pylist()).value_counts()
        return pa.table(
            {
                "reason": pa.array(vc.index.tolist(), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    return (
        gated.map_batches(partial, batch_format="pyarrow")
        .groupby("reason")
        .aggregate(Sum("n", alias_name="n_rows"))
    )
