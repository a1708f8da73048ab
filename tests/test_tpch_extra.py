"""Q11/Q15/Q17/Q18/Q21-shape operators vs DuckDB at sf0.001, plus the
semantics the gate can't see: tie-keeping in the argmax (Q15), the
exact-integer fold of the fractional predicates (Q17, Q11), and the
EXISTS/NOT-EXISTS set-test collapse (Q21) on a hand-built edge case.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _run(name):
    import __ray_entry__ as e

    ray_df = _to_pandas(e.queries()[name](SF))
    con = _duck()
    duck_df = con.sql(e.oracle_sql()[name]).df()
    con.close()
    return _canon(ray_df), _canon(duck_df)


@pytest.mark.parametrize(
    "name",
    [
        "top_supplier",
        "large_volume_orders",
        "small_qty_revenue",
        "sole_return_suppliers",
        "revenue_share_parts",
        "discount_band_revenue",
        "late_lines_priority",
        "nation_pair_volume",
        "market_share",
        "supplier_part_counts",
        "disjunctive_revenue",
        "min_cost_supplier",
        "part_leading_supplier",
        "nation_profit",
    ],
)
def test_matches_oracle_sf0001(name, ray_session):
    got, want = _run(name)
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_top_supplier_keeps_ties(ray_session):
    """Two suppliers with identical windowed revenue both surface."""
    from pdf_extractor_ray.functions.tpch_extra import top_revenue_supplier

    li = pd.DataFrame(
        {
            "l_suppkey": [1, 1, 2, 3],
            "l_extendedprice": [100.0, 50.0, 150.0, 10.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
            "l_shipdate": pd.to_datetime(["1996-02-01"] * 4),
        }
    )
    sup = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["a", "b", "c"]}
    )
    out = top_revenue_supplier(
        ray.data.from_pandas(li), ray.data.from_pandas(sup)
    )
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["total_revenue_c"].tolist() == [15000, 15000]


def test_small_qty_integer_fold(ray_session):
    """qty < 0.2*avg boundary: qty exactly AT the threshold excluded
    (strict <), one below included — pure integer arithmetic."""
    from pdf_extractor_ray.functions.tpch_extra import small_quantity_revenue

    # part 7: quantities 1 and 9 -> sum=10, cnt=2; 0.2*avg = 1.0
    # qty=1: 5*1*2 = 10 < 10 false (boundary excluded)
    # part 8: quantities 1 and 11 -> sum=12; qty=1: 10 < 12 true
    li = pd.DataFrame(
        {
            "l_partkey": [7, 7, 8, 8],
            "l_quantity": [1.0, 9.0, 1.0, 11.0],
            "l_extendedprice": [100.0, 100.0, 40.0, 40.0],
        }
    )
    part = pd.DataFrame({"p_partkey": [7, 8], "p_size": [1, 1]})
    out = small_quantity_revenue(
        ray.data.from_pandas(li), ray.data.from_pandas(part), max_size=5
    )
    assert out["total_price_c"].tolist() == [4000]


def test_sole_return_set_tests(ray_session):
    """Q21 collapse: single-supplier orders never count; an order with
    two returning suppliers counts for neither; per-batch splits of
    one orderkey still fold exactly."""
    from pdf_extractor_ray.functions.tpch_extra import sole_return_suppliers

    li = pd.DataFrame(
        {
            # order 1: supp 1 returns, supp 2 doesn't -> supp 1 counts
            # order 2: single supplier -> excluded (ns < 2)
            # order 3: both return -> excluded (nr = 2)
            "l_orderkey": [1, 1, 2, 3, 3],
            "l_suppkey": [1, 2, 1, 1, 2],
            "l_returnflag": ["R", "N", "R", "R", "R"],
        }
    )
    sup = pd.DataFrame({"s_suppkey": [1, 2], "s_name": ["a", "b"]})
    # two single-row blocks split order 1 across batches
    ds = ray.data.from_pandas(li).repartition(5)
    out = sole_return_suppliers(ds, ray.data.from_pandas(sup))
    assert out[["s_suppkey", "numwait"]].values.tolist() == [[1, 1]]


def test_revenue_share_threshold_exact(ray_session):
    """Integer cutoff vs the average: exactly-average excluded
    (strict >), one cent above included."""
    from pdf_extractor_ray.functions.tpch_extra import revenue_share_parts

    # avg part revenue = 50_00 cents; part 3 sits exactly AT the
    # average (excluded), part 2 one cent above it (included)
    li = pd.DataFrame(
        {
            "l_partkey": [1, 2, 3],
            "l_extendedprice": [49.99, 50.01, 50.00],
            "l_discount": [0.0, 0.0, 0.0],
        }
    )
    out = revenue_share_parts(
        ray.data.from_pandas(li), mult_num=1, mult_den=1
    ).to_pandas()
    assert sorted(out["l_partkey"].tolist()) == [2]


def test_min_cost_supplier_tiebreak(ray_session):
    """Two region suppliers with the same acctbal: the smaller
    suppkey wins (the oracle's row_number tie order)."""
    from pdf_extractor_ray.functions.tpch_extra import min_acctbal_supplier

    li = pd.DataFrame(
        {"l_partkey": [7, 7, 7], "l_suppkey": [5, 3, 9]}
    )
    su = pd.DataFrame(
        {
            "s_suppkey": [3, 5, 9],
            "s_acctbal": [10.00, 10.00, 99.0],
            "s_nationkey": [0, 0, 0],
        }
    )
    pt = pd.DataFrame(
        {"p_partkey": [7], "p_size": [15], "p_type": ["SMALL"]}
    )
    nation = pd.DataFrame(
        {"n_nationkey": [0], "n_name": ["N0"], "r_name": ["EUROPE"]}
    )
    out = min_acctbal_supplier(
        ray.data.from_pandas(li).repartition(3),
        ray.data.from_pandas(su),
        ray.data.from_pandas(pt),
        nation,
    ).to_pandas()
    assert out.values.tolist() == [[7, 3, 1000]]


def test_part_leading_supplier_tiebreak(ray_session):
    """Quantity tie between suppliers: smaller suppkey leads; share
    numerators are the exact integer quantities."""
    from pdf_extractor_ray.functions.tpch_extra import (
        dominant_part_suppliers,
    )

    li = pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 1],
            "l_suppkey": [8, 2, 8, 2],
            "l_quantity": [3.0, 4.0, 4.0, 3.0],
        }
    )
    pt = pd.DataFrame({"p_partkey": [1], "p_name": ["red plate"]})
    out = dominant_part_suppliers(
        ray.data.from_pandas(li).repartition(4),
        ray.data.from_pandas(pt),
        name_token="plate",
    ).to_pandas()
    # both suppliers total 7; suppkey 2 wins the tie
    assert out.values.tolist() == [[1, 2, 7, 14]]


def test_supplier_part_counts_cross_batch_distinct(ray_session):
    """The same (brand, type, supplier) triple arriving from many
    partkey buckets counts once."""
    from pdf_extractor_ray.functions.tpch_extra import (
        supplier_count_by_part,
    )

    # parts 1..4 spread across partkey buckets, all Brand#9/PROMO,
    # all shipped by supplier 1 (+ one by supplier 2)
    li = pd.DataFrame(
        {
            "l_partkey": [1, 2, 3, 4, 4],
            "l_suppkey": [1, 1, 1, 1, 2],
        }
    )
    pt = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_brand": ["Brand#9"] * 4,
            "p_type": ["PROMO"] * 4,
        }
    )
    out = supplier_count_by_part(
        ray.data.from_pandas(li).repartition(5),
        ray.data.from_pandas(pt),
        exclude_brand="Brand#5",
    ).to_pandas()
    assert out.values.tolist() == [["Brand#9", "PROMO", 2]]
