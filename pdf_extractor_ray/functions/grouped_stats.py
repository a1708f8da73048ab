"""Exact per-group order statistics without a per-row exchange.

``group_median`` computes the EXACT median (DuckDB ``median`` /
``quantile_cont(0.5)`` semantics: mean of the two middles on even
counts) of an integer-valued column per group — but the exchange never
carries rows. Each batch folds to (group, value, n) partial counts, so
what shuffles is the *value histogram*: bounded by
``#groups x #distinct values``, independent of row count. The median
then reads off the sorted histogram's cumulative counts inside a tiny
``map_groups``. This is the standard trick for exact quantiles over
low-cardinality-value columns (lengths, scores, counts) at corpus
scale — the 100 TB case shuffles a few-MB histogram, not 100 TB.

``group_mode`` is the same histogram exchange feeding an argmax: the
most frequent value per group with a deterministic tie-break (smallest
value wins), i.e. SQL's
``row_number() OVER (ORDER BY n DESC, value ASC) = 1`` — chosen over
DuckDB's ``mode()`` precisely because ``mode``'s tie choice is
unspecified and wouldn't gate.

Reference parity: the reference's per-run summary reports per-kind
medians of element counts (SURVEY.md §2.9 G6 run metrics); these are
the grouped distributed versions of that reporting shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .common import coalesce_for_exchange

__all__ = ["group_median", "group_mode", "group_quantiles"]


def _hist_partials(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Per-batch (group, value) -> n partial counts; the only
    corpus-sized pass. Values are folded to int64."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        g = df.groupby(["g", "v"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        coalesce_for_exchange(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(["g", "v"])
        .aggregate(Sum("n", alias_name="n"))
    )


def group_median(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Exact per-group median of an integer column via the value
    histogram. Output: (group_col, median) with median a float64
    (DuckDB quantile_cont semantics — halves are exact in binary
    floating point, so the oracle matches bit-for-bit)."""
    hist = _hist_partials(ds, group_col, value_col)

    def median_of_hist(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("v")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        if n % 2 == 1:
            med = float(vals[np.searchsorted(cum, n // 2 + 1)])
        else:
            lo = float(vals[np.searchsorted(cum, n // 2)])
            hi = float(vals[np.searchsorted(cum, n // 2 + 1)])
            med = (lo + hi) / 2.0
        return pd.DataFrame({group_col: [g["g"].iloc[0]], "median": [med]})

    return hist.groupby("g").map_groups(median_of_hist, batch_format="pandas")


def group_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> ray.data.Dataset:
    """Exact per-group quantiles (``quantile_cont`` semantics: linear
    interpolation at position ``(n-1)*q``) off the same value-histogram
    exchange as ``group_median`` — one shuffle serves every requested
    quantile. Output: (group_col, q, value), one row per (group, q),
    with ``q`` in permille (int64) so the column is exactly joinable.

    The interpolation weight is ``frac = (n-1)*q - floor((n-1)*q)``;
    with q given in permille the products stay exact integers until
    the final two-value blend, which the oracle replays verbatim.
    """
    hist = _hist_partials(ds, group_col, value_col)
    q_pm = [int(round(q * 1000)) for q in qs]

    def quantiles_of_hist(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("v")
        n = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        out_q, out_v = [], []
        for qpm in q_pm:
            # position in [0, n-1], exact integer arithmetic in
            # thousandths: pos_th = (n-1)*qpm
            pos_th = (n - 1) * qpm
            lo_idx, frac_th = divmod(pos_th, 1000)
            lo = float(vals[np.searchsorted(cum, lo_idx + 1)])
            if frac_th == 0:
                val = lo
            else:
                hi = float(vals[np.searchsorted(cum, lo_idx + 2)])
                val = lo + (hi - lo) * (frac_th / 1000.0)
            out_q.append(np.int64(qpm))
            out_v.append(val)
        return pd.DataFrame(
            {
                group_col: [g["g"].iloc[0]] * len(q_pm),
                "q_pm": out_q,
                "value": out_v,
            }
        )

    return hist.groupby("g").map_groups(
        quantiles_of_hist, batch_format="pandas"
    )


def group_mode(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Most frequent value per group, ties to the SMALLEST value
    (deterministic, SQL-replayable). Output: (group_col, mode_value,
    n) with n the winning frequency."""
    hist = _hist_partials(ds, group_col, value_col)

    def argmax_of_hist(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["n", "v"], ascending=[False, True])
        top = g.iloc[0]
        return pd.DataFrame(
            {
                group_col: [top["g"]],
                "mode_value": [np.int64(top["v"])],
                "n": [np.int64(top["n"])],
            }
        )

    return hist.groupby("g").map_groups(argmax_of_hist, batch_format="pandas")
