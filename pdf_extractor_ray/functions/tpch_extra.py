"""Classic decorrelated-subquery / threshold join shapes (TPC-H
Q11/Q15/Q17/Q18/Q21 skeletons, adapted to this corpus' columns).

Each operator here exists because its *distributed shape* was missing
from the relational family, not because of the business meaning:

- ``top_revenue_supplier``  (Q15): argmax-with-ties over an aggregate —
  a global scalar max derived from a pre-aggregated table, then an
  exact tie-keeping filter.
- ``large_volume_orders``   (Q18): GROUP BY ... HAVING over the big
  fact table, then the tiny surviving key set is *broadcast back* to
  enrich from two other tables — no big-big exchange after the HAVING.
- ``small_quantity_revenue`` (Q17): correlated scalar subquery
  (``l_quantity < 0.2 * avg(qty) per part``) decorrelated into a
  per-key aggregate pass + a broadcast-probe scoring pass, with the
  fractional compare folded into exact integer math
  (``5*qty*cnt < sum_qty``) so no float divide touches the result.
- ``sole_return_suppliers`` (Q21): multi-self-"join" on the fact table
  collapsed into ONE per-orderkey cogroup (EXISTS + NOT-EXISTS both
  become per-group set tests), never an actual self-join.
- ``revenue_share_parts``   (Q11): global-scalar threshold — a total
  computed once, folded to an exact integer cutoff on the driver, and
  applied as a broadcast filter over the per-key aggregate.

Money follows the repo contract: exact integer cents per *row*
(``floor(x*100 + 0.5)``) before any aggregation, so sums are
associative integers and replay bit-exactly in the DuckDB oracle.

Scale notes (100 TB): every exchange below carries pre-aggregated
partials keyed by a bucketed join key; the only driver-side
materializations are provably tiny sets (HAVING survivors, argmax
ties, a global scalar). The part-side key broadcast in Q17 is
``O(#selected parts)`` int64s — the part table is orders of magnitude
smaller than lineitem; if that ever stopped holding the probe flips to
the bucket-cogroup path used by ``orders_with_returns``.

Reference parity: the reference engine has no relational module; these
cover the survey's "wide aggregation / join shapes" axis
(SURVEY.md §2 relational extensions) the same way custdist/semi_join
do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from .common import bucket_ids, coalesce_for_exchange

__all__ = [
    "top_revenue_supplier",
    "large_volume_orders",
    "small_quantity_revenue",
    "sole_return_suppliers",
    "revenue_share_parts",
]


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


# --------------------------------------------------------------- Q15


def top_revenue_supplier(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) with MAX revenue in a shipdate
    window — argmax *with ties kept*, exactly as the spec's view+max
    formulation.

    Plan: per-batch partial cents per suppkey (window filter first) ->
    one narrow exchange to exact per-supplier revenue -> global max as
    a driver scalar (the per-supplier table is O(#suppliers), and the
    max is one number) -> tie-keeping filter -> only the *winners'*
    keys are looked up in supplier (broadcast of a near-singleton key
    set, never the whole supplier table).

    Output: (s_suppkey, s_name, total_revenue_c), revenue in exact
    cents, sorted by suppkey.
    """
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        m = (ship >= lo) & (ship < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[m]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        df = pd.DataFrame({"s_suppkey": sk, "rev_c": _cents(ep * (1.0 - disc))})
        g = df.groupby("s_suppkey", as_index=False)["rev_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_supp = (
        coalesce_for_exchange(
            lineitem.map_batches(partial, batch_format="pyarrow")
        )
        .groupby("s_suppkey")
        .aggregate(Sum("rev_c", alias_name="total_revenue_c"))
        .materialize()  # consumed twice: max scan + tie filter (tiny)
    )
    best = per_supp.max("total_revenue_c")

    winners = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b["total_revenue_c"], best)),
        batch_format="pyarrow",
    ).to_pandas()

    keys = set(winners["s_suppkey"].tolist())
    names = supplier.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b["s_suppkey"].to_numpy(zero_copy_only=False), list(keys)))
        ).select(["s_suppkey", "s_name"]),
        batch_format="pyarrow",
    ).to_pandas()

    out = winners.merge(names, on="s_suppkey", how="inner")
    out = out[["s_suppkey", "s_name", "total_revenue_c"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


# --------------------------------------------------------------- Q18


def large_volume_orders(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    min_qty: int = 250,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, enriched with customer name and the order row.

    The HAVING runs FIRST and entirely on pre-aggregated partials
    (quantities are integer-valued, so the sums are exact int64); the
    surviving orderkey set is tiny by construction (a threshold tail —
    ~1% of orders at min_qty=250), so both enrichment joins are
    broadcast-probe filters over orders/customer, not exchanges.

    Output: (c_name, o_custkey, o_orderkey, o_orderdate,
    o_totalprice_c, sum_qty).
    """

    def qty_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"o_orderkey": ok, "sum_qty": q})
        g = df.groupby("o_orderkey", as_index=False)["sum_qty"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    survivors = (
        coalesce_for_exchange(
            lineitem.map_batches(qty_partial, batch_format="pyarrow")
        )
        .groupby("o_orderkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"))
        .map_batches(  # vectorized HAVING: the agg is per-ORDER sized
            lambda b: b.filter(pc.greater(b["sum_qty"], min_qty)),
            batch_format="pyarrow",
        )
        .to_pandas()  # threshold tail: tiny by construction
    )
    ok_set_ref = ray.put(
        np.sort(survivors["o_orderkey"].to_numpy(np.int64))
    )

    def probe_orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(ok_set_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        flt = batch.filter(pa.array(np.isin(ok, keys)))
        price_c = _cents(flt["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "o_orderkey": flt["o_orderkey"],
                "o_custkey": flt["o_custkey"],
                "o_orderdate": flt["o_orderdate"],
                "o_totalprice_c": pa.array(price_c, pa.int64()),
            }
        )

    hit_orders = orders.map_batches(
        probe_orders, batch_format="pyarrow"
    ).to_pandas()

    ck_set_ref = ray.put(
        np.sort(hit_orders["o_custkey"].unique().astype(np.int64))
    )

    def probe_cust(batch: pa.Table) -> pa.Table:
        keys = ray.get(ck_set_ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ck, keys))).select(
            ["c_custkey", "c_name"]
        )

    names = customer.map_batches(probe_cust, batch_format="pyarrow").to_pandas()

    out = (
        hit_orders.merge(survivors, on="o_orderkey")
        .merge(names, left_on="o_custkey", right_on="c_custkey")
        .drop(columns=["c_custkey"])
    )
    out = out[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate",
         "o_totalprice_c", "sum_qty"]
    ]
    return out.sort_values(
        ["o_totalprice_c", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)


# --------------------------------------------------------------- Q17


def small_quantity_revenue(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    max_size: int = 5,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q17 shape: total price of lineitems whose quantity is
    below 20% of the per-part average quantity, for small parts
    (``p_size <= max_size``).

    The correlated scalar subquery decorrelates into (1) a per-part
    (sum_qty, cnt) aggregate over the *selected* parts only, and
    (2) a scoring pass that re-probes lineitem with the aggregate
    broadcast. The fractional predicate ``qty < 0.2 * sum/cnt`` is
    evaluated in exact integer math as ``5*qty*cnt < sum_qty`` —
    bit-reproducible and oracle-replayable with no float divide.

    Output: one row, (total_price_c,).
    """

    part_keys = part.map_batches(
        lambda b: b.filter(
            pa.compute.less_equal(b["p_size"], max_size)
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    ).to_pandas()["p_partkey"].to_numpy(np.int64)
    pk_ref = ray.put(np.sort(part_keys))

    def agg_partial(batch: pa.Table) -> pa.Table:
        sel = ray.get(pk_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, sel)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        df = pd.DataFrame({"l_partkey": pk[m], "sum_qty": q, "cnt": 1})
        g = df.groupby("l_partkey", as_index=False).agg(
            sum_qty=("sum_qty", "sum"), cnt=("cnt", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    # materialized once: the per-part aggregate is consumed on the
    # driver (broadcast dict) and is O(#selected parts), not O(rows)
    per_part = (
        coalesce_for_exchange(
            lineitem.map_batches(agg_partial, batch_format="pyarrow")
        )
        .groupby("l_partkey")
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("cnt", alias_name="cnt"),
        )
        .to_pandas()
    )
    per_part = per_part.sort_values("l_partkey")
    agg_ref = ray.put(
        (
            per_part["l_partkey"].to_numpy(np.int64),
            per_part["sum_qty"].to_numpy(np.int64),
            per_part["cnt"].to_numpy(np.int64),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        keys, sumq, cnt = ray.get(agg_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, pk)
        idx_c = np.clip(idx, 0, len(keys) - 1) if len(keys) else idx
        hit = (
            (keys[idx_c] == pk) & (5 * q * cnt[idx_c] < sumq[idx_c])
            if len(keys)
            else np.zeros(len(pk), bool)
        )
        total = int(_cents(ep)[hit].sum())
        return pa.table({"partial_c": pa.array([total], pa.int64())})

    total_c = lineitem.map_batches(score, batch_format="pyarrow").sum(
        "partial_c"
    )
    return pd.DataFrame({"total_price_c": [int(total_c)]})


# --------------------------------------------------------------- Q21


def sole_return_suppliers(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    top_k: int = 25,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT-EXISTS multi-self-join), adapted
    to this corpus' columns: suppliers that were the SOLE supplier
    with a returned line on a multi-supplier order, counted per
    supplier.

    The spec's two correlated self-joins both collapse into one
    per-orderkey cogroup: EXISTS(another supplier on the order) is
    ``n_distinct_suppliers >= 2`` and NOT-EXISTS(another supplier who
    also returned) is ``n_distinct_returners == 1`` — set tests inside
    the group, no self-join exchange. Per-batch collapse to distinct
    (orderkey, suppkey, returned-any) keeps the single exchange narrow;
    the bucket task emits per-supplier partial counts.

    Output: top ``top_k`` by (numwait DESC, s_suppkey ASC) with names
    attached by a winners-only broadcast lookup.
    """

    def collapse(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ok": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "ret": (
                    batch["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
                ).astype(np.int8),
            }
        )
        g = df.groupby(["ok", "sk"], as_index=False)["ret"].max()
        g["bucket"] = bucket_ids(g["ok"].to_numpy(np.int64), n_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # exact per-orderkey fold (per-batch partials may split an
        # orderkey): re-collapse, then the two set tests
        g = group.groupby(["ok", "sk"], as_index=False)["ret"].max()
        st = g.groupby("ok").agg(ns=("sk", "nunique"), nr=("ret", "sum"))
        sole = st[(st["ns"] >= 2) & (st["nr"] == 1)].index
        winners = g[g["ok"].isin(sole) & (g["ret"] == 1)]
        out = winners.groupby("sk", as_index=False).size()
        return out.rename(columns={"sk": "s_suppkey", "size": "numwait"})

    counts = (
        coalesce_for_exchange(
            lineitem.map_batches(collapse, batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .to_pandas()  # O(#suppliers) rows
    )
    counts = counts.sort_values(
        ["numwait", "s_suppkey"], ascending=[False, True]
    ).head(top_k)

    keys = set(counts["s_suppkey"].tolist())
    names = supplier.map_batches(
        lambda b: b.filter(
            pa.array(
                np.isin(b["s_suppkey"].to_numpy(zero_copy_only=False), list(keys))
            )
        ).select(["s_suppkey", "s_name"]),
        batch_format="pyarrow",
    ).to_pandas()

    out = counts.merge(names, on="s_suppkey")
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


# --------------------------------------------------------------- Q11


def revenue_share_parts(
    lineitem: ray.data.Dataset,
    mult_num: int = 5,
    mult_den: int = 4,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q11 shape: parts whose revenue exceeds a multiple of the
    AVERAGE per-part revenue — a global scalar aggregate feeding a
    threshold filter over the per-key aggregate. (Average-relative,
    not total-relative, so the predicate is scale-invariant: a fixed
    fraction of the total selects nothing once #parts grows past the
    fraction's reciprocal.)

    The per-part table is built once (pre-aggregated partials, one
    narrow exchange) and materialized; the global total and part count
    are two driver scalars off it. The cutoff folds to an exact
    integer threshold on the driver
    (``rev_c * den * n_parts > num * total``  <=>
    ``rev_c >= (num*total)//(den*n_parts) + 1`` in unbounded Python
    ints — no int64 overflow, no float), then applies as a cheap
    broadcast filter. Output: (l_partkey, revenue_c) above the cut.
    """

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"l_partkey": pk, "revenue_c": _cents(ep * (1.0 - disc))})
        g = df.groupby("l_partkey", as_index=False)["revenue_c"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = (
        coalesce_for_exchange(
            lineitem.map_batches(partial, batch_format="pyarrow")
        )
        .groupby("l_partkey")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .materialize()  # consumed twice: total scan + threshold filter
    )
    total = int(per_part.sum("revenue_c"))
    n_parts = int(per_part.count())
    # rev_c*den*n > num*total  <=>  rev_c >= (num*total)//(den*n) + 1
    # (unbounded Python ints -> no int64 overflow at any scale)
    thr = (mult_num * total) // (mult_den * n_parts) + 1

    return per_part.map_batches(
        lambda b: b.filter(pc.greater_equal(b["revenue_c"], thr)),
        batch_format="pyarrow",
    )
