"""2-D Pareto skyline (non-dominated points) as a local-prune + merge.

A point is *dominated* if some other point is at-least-as-good on both
axes and strictly better on one. Domination survives partitioning —
if q dominates p inside one block, q dominates p globally — so every
block reduces to its local skyline first (typically a few dozen points
out of millions) and only the concatenated local skylines meet in the
final single-task merge. That is the whole scale story: the exchange
carries skyline candidates, never the corpus.

The per-block sweep is vectorized: group by the minimized axis, take
the per-value max of the maximized axis, prefix-max over strictly
smaller values; a point survives iff it achieves its value-group's max
AND beats every strictly-cheaper group's best. Exact-tie points
(identical on both axes) do not dominate each other and are all kept —
the same contract as the oracle's NOT EXISTS with a strict clause.

Reference parity: no reference analogue (the reference has no
relational layer); this covers the multi-criteria "best documents"
selection shape (SURVEY.md §2 relational extensions) — e.g. shortest
document with the highest quality score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

__all__ = ["skyline_2d"]


def _sweep(df: pd.DataFrame) -> pd.DataFrame:
    """Exact 2D skyline of one in-memory block: minimize 'lo_col'
    value in column 'lo', maximize column 'hi'."""
    if not len(df):
        return df
    per = df.groupby("lo")["hi"].max().sort_index()
    lo_vals = per.index.to_numpy()
    hi_max = per.to_numpy()
    # prefix max over STRICTLY smaller lo values
    prefix_excl = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(hi_max)[:-1])
    )
    idx = np.searchsorted(lo_vals, df["lo"].to_numpy())
    keep = (df["hi"].to_numpy() == hi_max[idx]) & (
        df["hi"].to_numpy() > prefix_excl[idx]
    )
    return df[keep]


def skyline_2d(
    ds: ray.data.Dataset,
    id_col: str,
    minimize_col: str,
    maximize_col: str,
) -> pd.DataFrame:
    """Pareto-optimal rows: no other row has ``minimize_col`` <= and
    ``maximize_col`` >= with one strict. Both axes must be int64-exact
    (use cents for money). Returns a pandas DataFrame (the skyline of
    a 2-D point set is small: one candidate per distinct minimized
    value at most).
    """

    def local_skyline(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "id": batch[id_col].to_numpy(zero_copy_only=False),
                "lo": batch[minimize_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "hi": batch[maximize_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        )
        return pa.Table.from_pandas(_sweep(df), preserve_index=False)

    cand = ds.map_batches(local_skyline, batch_format="pyarrow").to_pandas()
    out = _sweep(cand).rename(
        columns={"id": id_col, "lo": minimize_col, "hi": maximize_col}
    )
    return out.sort_values(id_col).reset_index(drop=True)
