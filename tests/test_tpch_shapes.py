"""Edge-case goldens for the adapted TPC-H shape suite (q138-q151),
focused on the places where the Spark formulation deliberately diverges
from the textbook SQL shape: q148 folds Q21's EXISTS + NOT EXISTS
self-joins into one per-order aggregate, and q142/q144/q150 decorrelate
scalar subqueries into broadcast 1-row joins. The DuckDB oracles prove
whole-query equivalence at two SFs; these tests pin the semantics on
hand-built fixtures where every row's fate is known."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.queries import (
    q142_important_parts,
    q144_top_supplier,
    q148_waiting_suppliers,
    q150_min_cost_supplier,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def tpch_dir(spark, tmp_path):
    """A hand-built micro star schema where q148's order taxonomy is fully
    enumerated:
      order 1: multi-supplier, ONLY supplier 1 late, twice     -> numwait +2
      order 2: multi-supplier, suppliers 1 AND 2 late          -> nobody waits
      order 3: single-supplier (1), late                       -> nobody waits
      order 4: multi-supplier, nobody late                     -> nobody waits
      order 5: status 'O' (not finished), supplier 2 sole late -> excluded
      order 6: multi-supplier, ONLY supplier 2 late, once      -> numwait +1
    """
    d = tmp_path / "sf"
    d.mkdir()
    orders = spark.createDataFrame(
        [
            (1, 10, "F", 100.0, _ts("1997-01-01"), "1-URGENT"),
            (2, 10, "F", 100.0, _ts("1997-01-01"), "1-URGENT"),
            (3, 10, "F", 100.0, _ts("1997-01-01"), "1-URGENT"),
            (4, 10, "F", 100.0, _ts("1997-01-01"), "1-URGENT"),
            (5, 10, "O", 100.0, _ts("1997-01-01"), "1-URGENT"),
            (6, 10, "F", 100.0, _ts("1997-01-01"), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    late, ok = _ts("1997-06-01"), _ts("1997-02-01")
    lineitem = spark.createDataFrame(
        [
            # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax, rf, ls, shipdate)
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (1, 1, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (1, 1, 2, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
            (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (2, 1, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (3, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (4, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
            (4, 1, 2, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
            (5, 1, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (5, 1, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
            (6, 1, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", late),
            (6, 1, 3, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ok),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(1, "Supplier#1", 0, 100.0), (2, "Supplier#2", 0, 200.0), (3, "Supplier#3", 1, 50.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "NATION_0", 3), (1, "NATION_1", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(3, "EUROPE")], "r_regionkey int, r_name string"
    )
    part = spark.createDataFrame(
        [(1, "cold widget", "Brand#2", "LARGE", 5, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    for name, df in [
        ("orders", orders), ("lineitem", lineitem), ("supplier", supplier),
        ("nation", nation), ("region", region), ("part", part),
    ]:
        df.coalesce(1).write.parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_q148_sole_late_supplier_taxonomy(spark, tpch_dir):
    rows = {r["s_name"]: r["numwait"] for r in q148_waiting_suppliers(spark, tpch_dir).collect()}
    # supplier 1 waits twice on order 1 (two late LINES); orders 2/3/4/5 contribute nothing
    assert rows == {"Supplier#1": 2, "Supplier#2": 1}


def test_q148_counts_per_late_line_not_per_order(spark, tpch_dir):
    out = q148_waiting_suppliers(spark, tpch_dir)
    s1 = [r for r in out.collect() if r["s_name"] == "Supplier#1"]
    assert s1 and s1[0]["numwait"] == 2  # two late lines in ONE order


def test_q144_max_revenue_ties_all_surface(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    ship = _ts("1997-02-01")
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
            (2, 1, 2, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
            (3, 1, 3, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", ship),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "A", 0, 0.0), (2, "B", 0, 0.0), (3, "C", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    li.write.parquet(str(d / "lineitem.parquet"))
    supp.write.parquet(str(d / "supplier.parquet"))
    out = {r["s_name"] for r in q144_top_supplier(spark, str(d)).collect()}
    assert out == {"A", "B"}  # both tie at max revenue; C below


def test_q150_min_balance_ties_all_surface(spark, tpch_dir):
    # make supplier 1 and 2 tie on balance for the one LARGE small part
    out = q150_min_cost_supplier(spark, tpch_dir).collect()
    names = {r["s_name"] for r in out}
    # suppliers 1,2,3 all shipped part 1; min acctbal among EU shippers = 50 (Supplier#3)
    assert names == {"Supplier#3"}
    assert all(r["acctbal_cents"] == 5000 for r in out)


def test_q142_scale_free_threshold_selects_heavy_tail(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    ship = _ts("1997-02-01")
    # part 1 carries 10x the revenue of each of parts 2..5 -> only part 1 passes 1.5x avg
    rows = [(1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", ship)]
    rows += [(k, k, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship) for k in range(2, 6)]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    li.write.parquet(str(d / "lineitem.parquet"))
    out = q142_important_parts(spark, str(d)).collect()
    assert [(r["l_partkey"], r["value_cents"]) for r in out] == [(1, 10000)]
